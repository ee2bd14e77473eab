"""Stdlib GIF codec: LZW round-trip, interlace, and the DataFrame ops."""

import numpy as np
import pytest

from mindb_spark.multimodal.gif import decode_gif, encode_gif, is_gif


def _img(h, w, colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, (h, w))]


def test_gif_roundtrip_small_palettes():
    for colors in (2, 5, 16, 200):
        img = _img(23, 31, colors, seed=colors)
        payload = encode_gif(img)
        assert is_gif(payload)
        got = decode_gif(payload)
        np.testing.assert_array_equal(got, img)


def test_gif_roundtrip_exercises_width_growth():
    # >= 2^min_code_size distinct sequences force LZW code-width bumps
    img = _img(64, 64, 256, seed=3)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_gif_rejects_garbage_and_too_many_colors():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    rng = np.random.default_rng(1)
    # 32x32 random RGB has ~1024 distinct colors with overwhelming odds
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(NotImplementedError):
        encode_gif(img)


def test_gif_extension_blocks_skipped():
    img = _img(8, 8, 4, seed=7)
    payload = bytearray(encode_gif(img))
    # splice a Graphic Control Extension before the image descriptor
    idx = payload.index(0x2C)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    patched = bytes(payload[:idx]) + gce + bytes(payload[idx:])
    np.testing.assert_array_equal(decode_gif(patched), img)


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF: permute the rows into the 4-pass
    storage order, set the interlace flag, and check the decoder
    reassembles the original raster."""
    import struct

    from mindb_spark.multimodal.gif import _lzw_encode

    h, w = 16, 10
    img = _img(h, w, 4, seed=11)
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    idx = inv.astype(np.uint8).reshape(h, w)
    pass_rows = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    stored = idx[pass_rows].ravel()  # rows in interlace storage order
    bits = 2  # 4-color palette
    n_pal = 1 << bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: len(pal)] = pal
    mcs = 2
    body = _lzw_encode(mcs, stored)
    blocks = b"".join(
        bytes([min(255, len(body) - i)]) + body[i : i + 255]
        for i in range(0, len(body), 255)
    )
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
        + pal_bytes.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace flag
        + bytes([mcs]) + blocks + b"\x00" + b"\x3b"
    )
    np.testing.assert_array_equal(decode_gif(payload), img)


def test_decode_images_real_gif(spark):
    img = _img(20, 14, 8, seed=5)
    from mindb_spark.multimodal import decode_images

    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(img)))], "doc_id long, content binary"
    )
    row = decode_images(df, fake=False).collect()[0]
    assert (row.height, row.width, row.channels) == (20, 14, 3)
    flat = img.reshape(-1)
    hist = np.bincount(flat >> 5, minlength=8) / flat.size
    np.testing.assert_allclose(np.array(row.features), hist, atol=1e-12)


def test_resize_images_real_gif(spark):
    img = _img(32, 32, 6, seed=9)
    from mindb_spark.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(img)))], "doc_id long, content binary"
    )
    row = resize_images(df, target=(8, 16), fake=False).collect()[0]
    assert (row.height, row.width) == (8, 16)
    got = decode_gif(bytes(row.content))
    rows = np.minimum((np.arange(8) * 32) // 8, 31)
    cols = np.minimum((np.arange(16) * 32) // 16, 31)
    np.testing.assert_array_equal(got, img[rows[:, None], cols[None, :]])
