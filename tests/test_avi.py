"""Stdlib MJPEG-AVI container: mux/demux round-trips, the AVI1
no-DHT convention, and the DataFrame frame-sampling op."""

import struct

import numpy as np
import pytest

from mindb_spark.multimodal.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
    is_avi,
    read_avi_frames,
)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _frames(n, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [(yy * 3 + i * 11) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256],
            axis=-1,
        ).astype(np.uint8)
        for i in range(n)
    ]


def test_avi_mux_demux_roundtrip():
    frames = _frames(5)
    avi = encode_avi_mjpeg(frames, fps=12, quality=93)
    assert is_avi(avi)
    raw = read_avi_frames(avi)
    assert len(raw) == 5
    assert all(p[:3] == b"\xff\xd8\xff" for p in raw)  # each frame a JPEG
    dec = decode_avi_frames(avi)
    assert len(dec) == 5 and dec[0].shape == (32, 48, 3)
    assert min(_psnr(f, d) for f, d in zip(frames, dec)) > 35


def test_avi_max_frames_prefix():
    avi = encode_avi_mjpeg(_frames(6), quality=90)
    assert len(decode_avi_frames(avi, max_frames=2)) == 2


def test_avi_no_dht_frames_decode_via_defaults():
    """MJPEG-in-AVI frames routinely omit DHT (OpenDML 'AVI1'); the
    JPEG decoder must fall back to the Annex K default tables and
    produce the identical raster."""
    from mindb_spark.multimodal.jpeg import decode_jpeg

    avi = encode_avi_mjpeg(_frames(1), quality=92)
    (payload,) = read_avi_frames(avi)

    out = bytearray(payload[:2])
    i = 2
    while i + 4 <= len(payload):
        marker = payload[i + 1]
        if marker == 0xDA:
            out += payload[i:]
            break
        ln = struct.unpack_from(">H", payload, i + 2)[0]
        if marker != 0xC4:  # strip every DHT segment
            out += payload[i : i + 2 + ln]
        i += 2 + ln
    stripped = bytes(out)
    assert b"\xff\xc4" not in stripped[: stripped.index(b"\xff\xda")]
    np.testing.assert_array_equal(decode_jpeg(stripped), decode_jpeg(payload))


def test_avi_rejects_garbage_and_foreign_codec():
    with pytest.raises(ValueError):
        read_avi_frames(b"RIFX" + b"\x00" * 50)
    avi = bytearray(encode_avi_mjpeg(_frames(1)))
    i = avi.index(b"MJPG", avi.index(b"strf"))  # strf.biCompression
    avi[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        read_avi_frames(bytes(avi))


def test_sample_frames_real_avi(spark):
    from mindb_spark.multimodal import sample_frames
    from mindb_spark.multimodal.png import decode_png

    frames = _frames(6, h=16, w=24)
    avi = encode_avi_mjpeg(frames, fps=10, quality=93)
    df = spark.createDataFrame(
        [(3, bytearray(avi))], "doc_id long, content binary"
    )
    rows = sample_frames(df, every_n=2, fake=False).orderBy("frame_no").collect()
    assert [r.frame_no for r in rows] == [0, 2, 4]
    expected = decode_avi_frames(avi)
    for r in rows:
        np.testing.assert_array_equal(
            decode_png(bytes(r.frame)), expected[r.frame_no]
        )


def test_decode_images_real_avi_first_frame(spark):
    from mindb_spark.multimodal import decode_images

    avi = encode_avi_mjpeg(_frames(3, h=24, w=16), quality=93)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id long, content binary"
    )
    row = decode_images(df, fake=False).collect()[0]
    assert (row.height, row.width, row.channels) == (24, 16, 3)


def test_sniff_mime_avi_vs_wav(spark):
    from mindb_spark.multimodal import sniff_mime

    avi = encode_avi_mjpeg(_frames(1))
    wav = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"\x00" * 36
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(wav))],
        "doc_id long, content binary",
    )
    got = {r.doc_id: r.mime for r in df.select(
        "doc_id", sniff_mime("content").alias("mime")).collect()}
    assert got == {1: "video/x-msvideo", 2: "audio/wav"}


def test_audio_first_stream_video_frames_found():
    """An AVI declaring an audio stream FIRST stores video chunks as 01dc
    and its first strf is a WAVEFORMATEX — the demuxer must key on the
    first 'vids' strh's stream index, not assume stream 00 / first strf."""

    def chunk(fourcc, body):
        return (
            fourcc + struct.pack("<I", len(body)) + body
            + (b"\x00" * (len(body) & 1))
        )

    def lst(t, body):
        return chunk(b"LIST", t + body)

    frames = [np.full((16, 16, 3), c, np.uint8) for c in (10, 200)]
    avi = encode_avi_mjpeg(frames, fps=5)
    # re-mux: parse out hdrl/movi, prepend an audio strl, rename 00dc->01dc
    pos, parts = 12, {}
    while pos + 8 <= len(avi):
        fcc = avi[pos : pos + 4]
        size = struct.unpack_from("<I", avi, pos + 4)[0]
        body = avi[pos + 8 : pos + 8 + size]
        parts[body[:4] if fcc == b"LIST" else fcc] = body
        pos += 8 + size + (size & 1)
    hdrl = parts[b"hdrl"]
    sz = struct.unpack_from("<I", hdrl, 8)[0]
    avih, vids_strl = hdrl[12 : 12 + sz], hdrl[12 + sz + (sz & 1) :]
    auds_strl = lst(
        b"strl",
        chunk(b"strh", b"auds" + b"\x00" * 52)
        # WAVEFORMATEX (PCM) padded to 40 bytes: the old reader misread
        # offset 16..20 of this as the video biCompression fourcc
        + chunk(
            b"strf",
            struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + b"\x00" * 24,
        ),
    )
    body = (
        b"AVI "
        + lst(b"hdrl", chunk(b"avih", avih) + auds_strl + vids_strl)
        + lst(b"movi", parts[b"movi"][4:].replace(b"00dc", b"01dc"))
    )
    avi2 = b"RIFF" + struct.pack("<I", len(body)) + body

    assert len(read_avi_frames(avi2)) == 2
    imgs = decode_avi_frames(avi2)
    assert abs(float(imgs[0].mean()) - 10) < 3
    assert abs(float(imgs[1].mean()) - 200) < 3
