"""FLAC / OGG-Vorbis / MP4 container walkers (multimodal/containers.py).

Fixtures are constructed in-test via the encode_* inverses — the
walkers' domain is header grammar, so a synthetic header IS a complete
fixture (same strategy as test_mpegaudio.py)."""

from __future__ import annotations

import pytest

from mindb_spark.multimodal import containers as C


def test_flac_streaminfo_roundtrip_and_fields():
    f = C.encode_flac_streaminfo(48000, 2, 24, 96000, b"\xab" * 16)
    si = C.flac_streaminfo(f)
    assert si["sample_rate"] == 48000 and si["channels"] == 2
    assert si["bits_per_sample"] == 24 and si["total_samples"] == 96000
    assert si["duration_sec"] == pytest.approx(2.0)
    assert si["pcm_md5"] == "ab" * 16
    # mono 8-bit edge values pack/unpack exactly
    si2 = C.flac_streaminfo(C.encode_flac_streaminfo(8000, 1, 8, 1))
    assert (si2["sample_rate"], si2["channels"], si2["bits_per_sample"],
            si2["total_samples"]) == (8000, 1, 8, 1)


def test_flac_streaminfo_after_other_blocks():
    """STREAMINFO found even when another metadata block precedes it
    (spec says STREAMINFO is first, but tolerate reordered writers)."""
    f = C.encode_flac_streaminfo(44100, 2, 16, 44100)
    marker, block = f[:4], f[4:]
    padding = bytes([0x01]) + (4).to_bytes(3, "big") + b"\x00" * 4
    reordered = marker + padding + block
    si = C.flac_streaminfo(reordered)
    assert si is not None and si["sample_rate"] == 44100


def test_flac_negatives():
    assert C.flac_streaminfo(b"") is None
    assert C.flac_streaminfo(b"not flac at all") is None
    assert C.flac_streaminfo(b"fLaC") is None  # marker but no block
    # truncated STREAMINFO body
    f = C.encode_flac_streaminfo()
    assert C.flac_streaminfo(f[:20]) is None


def test_ogg_vorbis_roundtrip():
    o = C.encode_ogg_vorbis(22050, 1, 44100, n_audio_pages=4)
    m = C.ogg_vorbis_meta(o)
    assert m["format"] == "ogg-vorbis"
    assert m["sample_rate"] == 22050 and m["channels"] == 1
    assert m["total_samples"] == 44100
    assert m["duration_sec"] == pytest.approx(2.0)
    assert m["n_pages"] == 5
    assert m["desync_bytes"] == 0 and not m["truncated"]


def test_ogg_desync_and_truncation():
    o = C.encode_ogg_vorbis(44100, 2, 88200, n_audio_pages=2)
    junk = b"garbage!"
    m = C.ogg_vorbis_meta(o[: len(o) // 2] + junk + o[len(o) // 2 :])
    # injected bytes are skipped and counted; pages after resync parse
    assert m["desync_bytes"] >= len(junk)
    assert m["format"] == "ogg-vorbis"
    cut = C.ogg_vorbis_meta(o[:-30])
    assert cut["truncated"] is True
    # non-vorbis ogg still reports the page walk
    page = C._ogg_page(7, 0, 0, b"\x7fFLAC junk")
    nv = C.ogg_vorbis_meta(page)
    assert nv["format"] == "ogg" and nv["n_pages"] == 1
    assert nv["sample_rate"] is None and nv["duration_sec"] == 0.0
    assert C.ogg_vorbis_meta(b"zzz") is None


def test_mp4_roundtrip_and_tracks():
    v = C.encode_mp4_skeleton(3.5, 1000, 1280, 720, b"avc1")
    m = C.mp4_meta(v)
    assert m["format"] == "mp4" and m["brand"] == "isom"
    assert m["duration_sec"] == pytest.approx(3.5)
    assert m["n_tracks"] == 2
    vid = [t for t in m["tracks"] if t["kind"] == "video"][0]
    assert (vid["width"], vid["height"], vid["codec"]) == (1280, 720, "avc1")
    aud = [t for t in m["tracks"] if t["kind"] == "audio"][0]
    assert aud["codec"] == "mp4a"
    # video-only
    m1 = C.mp4_meta(C.encode_mp4_skeleton(1.0, 600, 320, 240, b"hvc1",
                                          with_audio=False))
    assert m1["n_tracks"] == 1
    assert m1["tracks"][0]["codec"] == "hvc1"
    assert m1["duration_sec"] == pytest.approx(1.0)


def test_mp4_truncation_flagged():
    v = C.encode_mp4_skeleton()
    m = C.mp4_meta(v[:-25])
    assert m is not None and m["truncated"] is True
    assert C.mp4_meta(b"\x00\x00\x00\x08free") is None  # no ftyp


def test_jpeg_dimensions_marker_walk():
    import numpy as np

    from mindb_spark.multimodal.jpeg import encode_jpeg

    img = np.zeros((24, 40, 3), dtype=np.uint8)
    payload = encode_jpeg(img)
    assert C.jpeg_dimensions(payload) == (24, 40)
    assert C.jpeg_dimensions(b"not jpeg") is None
    assert C.jpeg_dimensions(b"\xff\xd8\xff\xd9") is None  # no SOF


def test_distributed_lanes_mixed_batch(spark):
    """Both public lanes over one mixed binary column: each payload
    lands in its format's row with exact header-derived fields."""
    from mindb_spark.multimodal import audio_container_meta, video_container_meta
    from mindb_spark.multimodal.mpegaudio import encode_cbr_stream

    rows = [
        (1, C.encode_flac_streaminfo(48000, 2, 16, 96000)),
        (2, C.encode_ogg_vorbis(44100, 2, 22050, 2)),
        (3, C.encode_mp4_skeleton(2.25, 1000, 640, 360)),
        (4, encode_cbr_stream(3, bitrate_kbps=128, sample_rate=44100)),
        (5, b"nothing recognizable here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    a = {r.doc_id: r for r in audio_container_meta(df).collect()}
    assert a[1].format == "flac" and a[1].n_frames == 96000
    assert a[1].sample_rate == 48000 and a[1].duration_sec == pytest.approx(2.0)
    assert a[2].format == "ogg-vorbis" and a[2].n_frames == 22050
    assert a[2].duration_sec == pytest.approx(0.5)
    assert a[3].format is None  # mp4 is the video lane's job
    assert a[4].format == "mpeg1-layer3" and a[4].n_frames == 3
    assert a[5].format is None and a[5].n_frames == 0
    v = {r.doc_id: r for r in video_container_meta(df).collect()}
    assert v[3].format == "mp4" and (v[3].width, v[3].height) == (640, 360)
    assert v[3].codec == "avc1" and v[3].duration_sec == pytest.approx(2.25)
    assert v[1].format is None and v[5].format is None


def test_mp4_sample_tables_frame_count_fps_bitrate():
    """Round-12 VERDICT #7: mdhd/stts/stsz/stco walk — per-video-track
    frame count, fps and bitrate from pure box arithmetic."""
    v = C.encode_mp4_skeleton(
        2.0, 1000, 640, 360, b"avc1",
        n_samples=48, sample_size=1000, media_timescale=600,
    )
    m = C.mp4_meta(v)
    vid = [t for t in m["tracks"] if t["kind"] == "video"][0]
    assert vid["n_samples"] == 48
    assert vid["fps"] == pytest.approx(24.0)
    # 48 kB over 2 s = 192 kbps
    assert vid["bitrate_kbps"] == pytest.approx(192.0)
    assert m["truncated"] is False
    # uneven division: stts gets a second entry; tick sum stays exact
    m2 = C.mp4_meta(C.encode_mp4_skeleton(
        1.75, 1000, 320, 240, b"hvc1", with_audio=False,
        n_samples=36, sample_size=500, media_timescale=600,
    ))
    t2 = m2["tracks"][0]
    assert t2["n_samples"] == 36
    assert t2["fps"] == pytest.approx(36 / 1.75)
    assert t2["bitrate_kbps"] == pytest.approx(36 * 500 * 8 / 1.75 / 1000)
    # audio track (no sample tables) and legacy skeleton stay None
    aud = [t for t in m["tracks"] if t["kind"] == "audio"][0]
    assert aud["n_samples"] is None and aud["fps"] is None
    legacy = C.mp4_meta(C.encode_mp4_skeleton(2.0, 1000, 640, 360))
    assert legacy["tracks"][0]["fps"] is None
    # truncation sweep still total with the new boxes present
    for cut in range(0, len(v) + 1, 3):
        C.mp4_meta(v[:cut])


def test_video_lane_surfaces_sample_table_fields(spark):
    from mindb_spark.multimodal import video_container_meta

    v = C.encode_mp4_skeleton(
        2.5, 1000, 1280, 720, b"avc1",
        n_samples=60, sample_size=1200, media_timescale=600,
    )
    df = spark.createDataFrame([(1, v)], "doc_id long, content binary")
    r = video_container_meta(df).collect()[0]
    assert r.n_frames == 60
    assert r.fps == pytest.approx(24.0)
    assert r.bitrate_kbps == pytest.approx(60 * 1200 * 8 / 2.5 / 1000)


def test_mp4_meta_empty_boxes_at_eof_total():
    """Round-12 ADVICE fix: a crafted ftyp + moov whose mvhd/tkhd box
    body is EMPTY and ends exactly at EOF must report truncated, not
    raise IndexError (`ver = data[s]` with s == len(data))."""
    ftyp = C._box(b"ftyp", b"isom" + b"\x00" * 8)
    # moov containing an empty-bodied mvhd — body_start == EOF
    empty_mvhd = C._box(b"mvhd", b"")
    m = C.mp4_meta(ftyp + C._box(b"moov", empty_mvhd))
    assert m is not None and m["truncated"] is True
    # same for an empty tkhd inside a trak, and an empty hdlr
    for inner in (C._box(b"tkhd", b""), C._box(b"hdlr", b"")):
        payload = ftyp + C._box(b"moov", C._box(b"trak", inner))
        m = C.mp4_meta(payload)
        assert m is not None and m["truncated"] is True
    # short-but-nonempty mvhd bodies (1..19 bytes) are equally safe
    for n in (1, 4, 12, 19):
        m = C.mp4_meta(ftyp + C._box(b"moov", C._box(b"mvhd", b"\x00" * n)))
        assert m is not None and m["truncated"] is True


def test_mp4_meta_fuzz_truncations_never_raise():
    """Every prefix truncation of a valid skeleton parses or returns a
    flagged dict — never an exception (TOTAL-function sweep)."""
    v = C.encode_mp4_skeleton(2.0, 1000, 640, 360)
    for cut in range(0, len(v) + 1):
        C.mp4_meta(v[:cut])  # must not raise
    # random-ish corruption: flip bytes through the box headers
    for pos in range(0, min(len(v), 120)):
        corrupted = v[:pos] + b"\xff" + v[pos + 1 :]
        C.mp4_meta(corrupted)  # must not raise


def test_container_lanes_corrupt_payloads_yield_null_rows(spark):
    """Round-12 ADVICE fix: payloads passing the magic sniff but corrupt
    beyond it flow through BOTH distributed lanes as null/zero sentinel
    rows — the documented 'filter, don't throw' contract."""
    from mindb_spark.multimodal import audio_container_meta, video_container_meta

    wav_ok_magic_bad_body = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"junk"
    truncated_riff = b"RIFF\xff\xff\xff\xffWAVE"
    ftyp = C._box(b"ftyp", b"isom" + b"\x00" * 8)
    mp4_empty_mvhd = ftyp + C._box(b"moov", C._box(b"mvhd", b""))
    avi_magic_bad = b"RIFF" + b"\x10\x00\x00\x00" + b"AVI LIST"
    rows = [
        (1, wav_ok_magic_bad_body),
        (2, truncated_riff),
        (3, mp4_empty_mvhd),
        (4, avi_magic_bad),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    a = {r.doc_id: r for r in audio_container_meta(df).collect()}
    assert len(a) == 4
    for i in (1, 2, 3, 4):
        assert a[i].format is None and a[i].n_frames == 0
    v = {r.doc_id: r for r in video_container_meta(df).collect()}
    assert len(v) == 4
    assert v[1].format is None and v[2].format is None
    # the structurally-sniffable mp4 still reports, flagged truncated
    assert v[3].format == "mp4" and v[3].truncated is True


def test_video_lane_reads_mjpeg_avi(spark):
    """The existing MJPEG-AVI demuxer rides the video lane: frame count
    and dims from the container, no full decode."""
    import numpy as np

    from mindb_spark.multimodal import video_container_meta
    from mindb_spark.multimodal.avi import encode_avi_mjpeg

    frames = [np.full((16, 24, 3), i * 30, dtype=np.uint8) for i in range(3)]
    payload = encode_avi_mjpeg(frames)
    df = spark.createDataFrame([(1, payload)], "doc_id long, content binary")
    r = video_container_meta(df).collect()[0]
    assert r.format == "avi-mjpeg" and r.n_frames == 3
    assert (r.height, r.width) == (16, 24)
    assert r.codec == "mjpg"
