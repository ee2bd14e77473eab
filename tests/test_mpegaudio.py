"""MPEG audio frame-grammar parser (multimodal/mpegaudio.py, round 11).

Fixture strategy: the parser's domain is the HEADER grammar, so valid
fixtures are constructible in-test (encode_frame_header /
encode_cbr_stream are exact inverses of the parser's arithmetic) — plus
one opportunistic REAL-encoder file check, path-gated on a third-party
MP3 that happens to ship in this container's gsutil test data (never
copied into the repo)."""

from __future__ import annotations

import os

import pytest

from mindb_spark.multimodal import mpegaudio as M

_REAL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"
)


def _id3v2(inner: bytes = b"\x00" * 22) -> bytes:
    size = len(inner)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3\x03\x00\x00" + ss + inner


def test_header_roundtrip_all_variants():
    """encode_frame_header must be the exact inverse of _parse_header
    across versions, layers, rates, channel modes, and padding."""
    for version in ("1", "2", "2.5"):
        vgroup = "1" if version == "1" else "2"
        for layer in (1, 2, 3):
            table = M._BITRATES[(vgroup, layer)]
            for br in (table[0], table[7], table[-1]):
                for sr in M._SAMPLE_RATES[version]:
                    for ch in (1, 2):
                        for pad in (0, 1):
                            hdr = M.encode_frame_header(
                                version, layer, br, sr, ch, padding=pad
                            )
                            p = M._parse_header(hdr + b"\x00" * 4, 0)
                            assert p is not None
                            assert (p["version"], p["layer"]) == (version, layer)
                            assert p["bitrate_kbps"] == br
                            assert p["sample_rate"] == sr
                            assert p["channels"] == ch
                            assert p["padding"] == pad


def test_cbr_stream_meta_arithmetic():
    s = M.encode_cbr_stream(
        9, version="1", layer=3, bitrate_kbps=128, sample_rate=44100,
        channels=2,
    )
    m = M.mpeg_audio_meta(s)
    assert m["format"] == "mpeg1-layer3"
    assert m["n_frames"] == 9
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_sec"] == pytest.approx(9 * 1152 / 44100)
    assert m["bitrate_kbps_mean"] == 128.0
    assert m["vbr"] is False and m["desync_bytes"] == 0
    assert not m["truncated"]
    # frame length arithmetic: 144 * 128000 / 44100 = 417 (no padding)
    assert M.parse_mpeg_frames(s)["frames"][0]["frame_len"] == 417
    # MPEG-2 L3 uses 576 samples/frame and the 72 coefficient
    s2 = M.encode_cbr_stream(
        4, version="2", layer=3, bitrate_kbps=64, sample_rate=22050,
        channels=1,
    )
    m2 = M.mpeg_audio_meta(s2)
    assert m2["duration_sec"] == pytest.approx(4 * 576 / 22050)
    assert M.parse_mpeg_frames(s2)["frames"][0]["frame_len"] == 208


def test_id3_tags_skipped_and_counted():
    body = M.encode_cbr_stream(3, bitrate_kbps=64, sample_rate=32000)
    data = _id3v2() + body + b"TAG" + b"\x00" * 125
    m = M.mpeg_audio_meta(data)
    assert m["n_frames"] == 3
    assert m["id3v2_bytes"] == 32 and m["id3v1"] is True
    assert m["desync_bytes"] == 0
    assert M.is_mpeg_audio(data)


def test_desync_resync_and_truncation():
    body = M.encode_cbr_stream(4, bitrate_kbps=128, sample_rate=44100)
    junk = b"not frames at all!"
    m = M.mpeg_audio_meta(junk + body)
    assert m["n_frames"] == 4
    assert m["desync_bytes"] == len(junk)
    # is_mpeg_audio requires frame AT the audio start — junk prefix fails
    assert not M.is_mpeg_audio(junk + body)
    # cutting the last frame short flags truncated but keeps the count
    cut = (junk + body)[:-40]
    mt = M.mpeg_audio_meta(cut)
    assert mt["truncated"] is True and mt["n_frames"] == 4


def test_vbr_mixed_bitrates_exact_duration():
    a = M.encode_cbr_stream(2, bitrate_kbps=64, sample_rate=44100)
    b = M.encode_cbr_stream(3, bitrate_kbps=192, sample_rate=44100)
    m = M.mpeg_audio_meta(a + b)
    assert m["n_frames"] == 5 and m["vbr"] is True
    assert m["duration_sec"] == pytest.approx(5 * 1152 / 44100)
    assert m["bitrate_kbps_mean"] == pytest.approx((2 * 64 + 3 * 192) / 5)


def test_xing_header_detected():
    hdr = M.encode_frame_header("1", 3, 128, 44100, 2)
    frame_len = M._parse_header(hdr + b"\x00" * 8, 0)["frame_len"]
    body = bytearray(frame_len - 4)
    off = M._xing_offset(M._parse_header(hdr + bytes(body), 0)) - 4
    body[off : off + 4] = b"Xing"
    body[off + 4 : off + 8] = (3).to_bytes(4, "big")  # frames + bytes flags
    body[off + 8 : off + 12] = (777).to_bytes(4, "big")
    first = hdr + bytes(body)
    data = first + M.encode_cbr_stream(2, bitrate_kbps=128, sample_rate=44100)
    m = M.mpeg_audio_meta(data)
    assert m["xing_frames"] == 777 and m["vbr"] is True


def test_not_mpeg_payloads():
    assert not M.is_mpeg_audio(b"")
    assert not M.is_mpeg_audio(b"hello world " * 100)
    assert M.mpeg_audio_meta(b"RIFF....WAVE")["n_frames"] == 0
    # a header cut off mid-frame at EOF still counts, flagged truncated
    short = M.mpeg_audio_meta(b"\xff\xfb\x90\x00" + b"x" * 10)
    assert short["n_frames"] == 1 and short["truncated"] is True


def test_lone_sync_needs_following_agreement():
    """A valid header whose 'next frame' position holds garbage is only
    a frame when it reaches EOF; mid-buffer it must be rejected."""
    hdr = M.encode_frame_header("1", 3, 128, 44100, 2)
    frame_len = M._parse_header(hdr + b"\x00" * 8, 0)["frame_len"]
    # header + full payload + garbage longer than another frame: the
    # walker must NOT accept the garbage as a continuation
    data = hdr + b"\x00" * (frame_len - 4) + b"g" * (frame_len + 50)
    m = M.parse_mpeg_frames(data)
    assert len(m["frames"]) == 0  # no agreeing successor, not at EOF
    # same bytes but ending exactly at the frame edge: accepted
    data2 = hdr + b"\x00" * (frame_len - 4)
    assert len(M.parse_mpeg_frames(data2)["frames"]) == 1


@pytest.mark.skipif(
    not os.path.exists(_REAL_MP3), reason="container gsutil fixture absent"
)
def test_real_encoder_file_parses_clean():
    """Real-encoder validation: a third-party MP3 (Apache-2.0 gsutil
    test data present in this container) must walk cleanly — every
    frame accounted, zero desync, consistent format."""
    data = open(_REAL_MP3, "rb").read()
    m = M.mpeg_audio_meta(data)
    assert m["format"] == "mpeg2-layer3"
    assert m["sample_rate"] == 22050 and m["channels"] == 1
    assert m["n_frames"] > 20 and m["desync_bytes"] == 0
    assert not m["truncated"]
    assert 0.5 < m["duration_sec"] < 5.0
    # CBR: one bitrate across all frames
    assert m["vbr"] is False and m["bitrate_kbps_mean"] == 64.0


def test_audio_container_meta_mixed_batch(spark):
    """Distributed wrapper: WAV, MPEG, and garbage in one column."""
    import struct

    from mindb_spark.multimodal import audio_container_meta

    def wav(n=100, rate=8000):
        pcm = struct.pack("<" + "h" * n, *([0] * n))
        hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm

    rows = [
        (1, wav()),
        (2, M.encode_cbr_stream(5, bitrate_kbps=128, sample_rate=44100)),
        (3, b"just text, not audio"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r for r in audio_container_meta(df).collect()}
    assert out[1].format == "wav" and out[1].sample_rate == 8000
    assert out[1].n_frames == 100  # samples for wav
    assert out[2].format == "mpeg1-layer3" and out[2].n_frames == 5
    assert out[2].bitrate_kbps_mean == 128.0 and out[2].vbr is False
    assert out[3].format is None and out[3].n_frames == 0
