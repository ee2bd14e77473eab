"""Stdlib BMP codec: round-trips, palette/32-bit/top-down variants, and
the DataFrame ops."""

import struct

import numpy as np
import pytest

from mindb_spark.multimodal.bmp import decode_bmp, encode_bmp, is_bmp


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_24bit():
    # widths 4, 5, 6, 7 exercise every 4-byte row-padding remainder
    for w in (4, 5, 6, 7):
        img = _img(9, w, seed=w)
        payload = encode_bmp(img)
        assert is_bmp(payload)
        np.testing.assert_array_equal(decode_bmp(payload), img)


def test_bmp_grayscale_input_expands_to_rgb():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    got = decode_bmp(encode_bmp(gray))
    np.testing.assert_array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))


def _raw_bmp(width, height, bpp, pixel_rows, palette=b"", compression=0):
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, compression,
        len(pixel_rows), 0, 0, len(palette) // 4, 0,
    )
    off = 14 + 40 + len(palette)
    head = struct.pack("<2sIHHI", b"BM", off + len(pixel_rows), 0, 0, off)
    return head + info + palette + pixel_rows


def test_bmp_8bit_palette_decode():
    # 3x2 image, 4-entry palette, stride pads 3 -> 4 bytes
    pal = bytes([10, 20, 30, 0,  40, 50, 60, 0,  70, 80, 90, 0,  1, 2, 3, 0])
    rows = bytes([0, 1, 2, 0,  3, 3, 0, 0])  # bottom-up: row1 then row0
    payload = _raw_bmp(3, 2, 8, rows, palette=pal)
    got = decode_bmp(payload)
    # palette quads are BGRA -> RGB
    exp = np.array([
        [[3, 2, 1], [3, 2, 1], [30, 20, 10]],
        [[30, 20, 10], [60, 50, 40], [90, 80, 70]],
    ], dtype=np.uint8)
    np.testing.assert_array_equal(got, exp)


def test_bmp_32bit_and_topdown_decode():
    # 2x2 BGRA pixels, top-down (negative height)
    px = bytes([
        1, 2, 3, 255,   4, 5, 6, 255,    # row 0 (top)
        7, 8, 9, 255,   10, 11, 12, 0,   # row 1
    ])
    payload = _raw_bmp(2, -2, 32, px)
    got = decode_bmp(payload)
    exp = np.array([
        [[3, 2, 1], [6, 5, 4]],
        [[9, 8, 7], [12, 11, 10]],
    ], dtype=np.uint8)
    np.testing.assert_array_equal(got, exp)


def test_bmp_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"NOTABMP" + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated
    # RLE8 compression (1) is out of scope
    payload = _raw_bmp(2, 2, 8, b"\x00" * 8, palette=b"\x00" * 1024,
                       compression=1)
    with pytest.raises(NotImplementedError):
        decode_bmp(payload)
    # truncated pixel data
    img = _img(6, 6, seed=1)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(img)[:-20])


def test_decode_images_real_bmp(spark):
    from mindb_spark.multimodal import decode_images

    img = _img(11, 7, seed=5)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(img)))], "doc_id long, content binary"
    )
    row = decode_images(df, fake=False).collect()[0]
    assert (row.height, row.width, row.channels) == (11, 7, 3)
    flat = img.reshape(-1)
    hist = np.bincount(flat >> 5, minlength=8) / flat.size
    np.testing.assert_allclose(np.array(row.features), hist, atol=1e-12)


def test_resize_images_real_bmp(spark):
    from mindb_spark.multimodal import resize_images

    img = _img(20, 30, seed=9)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(img)))], "doc_id long, content binary"
    )
    row = resize_images(df, target=(5, 6), fake=False).collect()[0]
    assert (row.height, row.width) == (5, 6)
    got = decode_bmp(bytes(row.content))
    rows = np.minimum((np.arange(5) * 20) // 5, 19)
    cols = np.minimum((np.arange(6) * 30) // 6, 29)
    np.testing.assert_array_equal(got, img[rows[:, None], cols[None, :]])


def test_sniff_mime_bmp(spark):
    from mindb_spark.multimodal import sniff_mime
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(_img(2, 2)))), (2, bytearray(b"plain"))],
        "doc_id long, content binary",
    )
    got = {r.doc_id: r.mime for r in df.select(
        "doc_id", sniff_mime("content").alias("mime")).collect()}
    assert got == {1: "image/bmp", 2: "application/octet-stream"}
