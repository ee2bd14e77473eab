"""Multimodal binary-column plumbing (decode kernels are deterministic stubs)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from mindb_spark.multimodal import (
    binary_metadata,
    decode_images,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"jpegdata" * 50),
        (3, b"GIF89a" + b"y" * 10),
        (4, b"%PDF-1.7 stuff"),
        (5, b"plain text payload"),
        (6, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_binary_metadata(payloads):
    got = {r.doc_id: r for r in binary_metadata(payloads).collect()}
    assert got[1].mime == "image/png"
    assert got[2].mime == "image/jpeg"
    assert got[3].mime == "image/gif"
    assert got[4].mime == "application/pdf"
    assert got[5].mime == "application/octet-stream"
    assert got[1].size_bytes == 108
    assert got[5].content_md5 == hashlib.md5(b"plain text payload").hexdigest()
    assert got[6].size_bytes == 0


def test_decode_images_deterministic(payloads):
    a = {r.doc_id: (r.height, r.width, r.channels, tuple(r.features)) for r in decode_images(payloads).collect()}
    b = {r.doc_id: (r.height, r.width, r.channels, tuple(r.features)) for r in decode_images(payloads).collect()}
    assert a == b
    h, w, c, feats = a[5]
    assert 16 <= h < 80 and 16 <= w < 80 and c == 3
    assert abs(sum(feats) - 1.0) < 1e-9  # histogram normalized
    assert a[6][3] == (0.0,) * 8  # empty payload -> zero features


def test_decode_images_real_png(spark):
    """fake=False decodes PNG payloads for real: true dims + pixel-derived
    features, via the stdlib decoder (no image library)."""
    from mindb_spark.multimodal.png import encode_png

    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    img_b = np.full((8, 40), 255, dtype=np.uint8)  # gray, all bytes >= 224
    df = spark.createDataFrame(
        [(1, encode_png(img_a)), (2, encode_png(img_b))],
        "doc_id long, content binary",
    )
    got = {r.doc_id: r for r in decode_images(df, fake=False).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (24, 17, 3)
    assert (got[2].height, got[2].width, got[2].channels) == (8, 40, 1)
    want_hist = np.bincount(img_a.reshape(-1) >> 5, minlength=8) / img_a.size
    np.testing.assert_allclose(got[1].features, want_hist, atol=1e-12)
    assert got[2].features == [0.0] * 7 + [1.0]


def test_decode_images_real_unsupported_format_requires_lib(spark):
    # formats outside the native codecs (PNG/GIF/BMP/JPEG/AVI) still
    # need PIL; the worker error surfaces through Spark as a
    # PythonException carrying the NotImplementedError message
    tiff = spark.createDataFrame(
        [(1, bytearray(b"II*\x00" + b"tiffdata" * 20))],
        "doc_id long, content binary",
    )
    with pytest.raises(Exception, match="requires PIL"):
        decode_images(tiff, fake=False).collect()


def test_real_decode_prefers_native(monkeypatch):
    """The decode gate must pick a NATIVE decoder over the ~1 MB/s stdlib
    entropy loop whenever one is importable (tools/codec_throughput_probe
    measured ~30x). PIL is absent in this container, so a stub module is
    injected driver-side and _real_decode is called directly: a PNG whose
    stdlib decode would return 24x17x3 must come back with the stub's
    4x5x3 shape — proof the native path won the gate — while an AVI
    payload must still route to the stdlib MJPEG demuxer (PIL can't read
    AVI)."""
    import sys
    import types

    from mindb_spark.multimodal import columns as C
    from mindb_spark.multimodal.avi import encode_avi_mjpeg
    from mindb_spark.multimodal.png import encode_png

    opened = []

    def _open(buf):
        opened.append(buf.read(4))
        return np.zeros((4, 5, 3), dtype=np.uint8)  # np.asarray passes through

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=_open)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)

    rng = np.random.default_rng(3)
    png = encode_png(rng.integers(0, 256, (24, 17, 3), dtype=np.uint8))
    h, w, ch, hist = C._real_decode(png)
    assert (h, w, ch) == (4, 5, 3), "native decoder did not win the gate"
    assert opened == [png[:4]]
    np.testing.assert_allclose(hist, [1.0] + [0.0] * 7)  # all-zero stub pixels

    frames = [np.full((8, 8, 3), 128, dtype=np.uint8)]
    avi = encode_avi_mjpeg(frames, fps=5)
    h, w, ch, _ = C._real_decode(avi)
    assert (h, w, ch) == (8, 8, 3)
    assert len(opened) == 1  # the AVI did NOT go through the stub


def test_resize_passthrough(payloads):
    out = {r.doc_id: r for r in resize_images(payloads, (32, 48)).collect()}
    assert all(r.height == 32 and r.width == 48 for r in out.values())
    assert bytes(out[5].content) == b"plain text payload"


def test_resize_real_png(spark):
    from mindb_spark.multimodal.png import decode_png, encode_png

    img = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(16, 12, 3)
    df = spark.createDataFrame([(1, encode_png(img))], "doc_id long, content binary")
    out = resize_images(df, (8, 6), fake=False).collect()[0]
    assert (out.height, out.width) == (8, 6)
    resized = decode_png(bytes(out.content))
    assert resized.shape == (8, 6, 3)
    # nearest-neighbor: every output pixel is some input pixel
    np.testing.assert_array_equal(resized[0, 0], img[0, 0])
    np.testing.assert_array_equal(resized[7, 5], img[14, 10])


def test_sample_frames_one_to_many(spark):
    df = spark.createDataFrame(
        [(1, b"v" * (4096 * 25)), (2, b"w" * 100)], "doc_id long, content binary"
    )
    out = sample_frames(df, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.doc_id, []).append(r.frame_no)
    assert sorted(by_id[1]) == [0, 10, 20]
    assert by_id[2] == [0]
    frames = {(r.doc_id, r.frame_no): bytes(r.frame) for r in out}
    assert frames[(1, 20)] == b"v" * 4096
    assert frames[(2, 0)] == b"w" * 100
