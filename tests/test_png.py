"""Stdlib PNG decoder: spec-reference unfiltering, round-trips, scope errors.

The reference decoder below implements the PNG filter recursions byte-by-
byte straight from the spec (https://www.w3.org/TR/png-3/#9Filters) and is
deliberately naive — the production decoder's vectorized paths must match
it exactly on every filter type.
"""

import struct
import zlib

import numpy as np
import pytest

from mindb_spark.multimodal.png import decode_png, encode_png, is_png


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _reference_unfilter(raw, h, w, bpp):
    """Per-byte spec recursion; returns (h, w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.int32)
    off = 0
    for y in range(h):
        f = raw[off]
        line = raw[off + 1 : off + 1 + stride]
        off += stride + 1
        for i in range(stride):
            x = line[i]
            a = out[y][i - bpp] if i >= bpp else 0
            b = out[y - 1][i] if y > 0 else 0
            c = out[y - 1][i - bpp] if (y > 0 and i >= bpp) else 0
            if f == 0:
                r = x
            elif f == 1:
                r = x + a
            elif f == 2:
                r = x + b
            elif f == 3:
                r = x + ((a + b) >> 1)
            else:
                r = x + _paeth(a, b, c)
            out[y][i] = r & 0xFF
    return out.astype(np.uint8)


def _make_png(filtered_scanlines: bytes, w, h, ctype):
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(filtered_scanlines))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ctype,bpp", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_every_filter_matches_spec_reference(ctype, bpp, ftype):
    rng = np.random.default_rng(ctype * 10 + ftype)
    h, w = 11, 13
    stride = w * bpp
    raw = b"".join(
        bytes([ftype]) + rng.integers(0, 256, stride, dtype=np.uint8).tobytes()
        for _ in range(h)
    )
    img = decode_png(_make_png(raw, w, h, ctype))
    assert img.shape == (h, w, bpp)
    want = _reference_unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    np.testing.assert_array_equal(img, want)


def test_mixed_filters_per_line():
    rng = np.random.default_rng(99)
    h, w, bpp = 16, 9, 3
    stride = w * bpp
    raw = b"".join(
        bytes([y % 5]) + rng.integers(0, 256, stride, dtype=np.uint8).tobytes()
        for y in range(h)
    )
    img = decode_png(_make_png(raw, w, h, 2))
    want = _reference_unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    np.testing.assert_array_equal(img, want)


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 1), (8, 3, 2), (4, 4, 3), (6, 2, 4)])
def test_encode_decode_roundtrip(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    got = decode_png(encode_png(img))
    want = img if img.ndim == 3 else img[..., None]
    np.testing.assert_array_equal(got, want)
    assert is_png(encode_png(img))


def test_palette_expansion():
    plte = bytes(range(30))  # 10 RGB entries
    idx = np.array([[0, 1], [9, 3]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, payload):
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    data = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(img[0, 0], [0, 1, 2])
    np.testing.assert_array_equal(img[1, 0], [27, 28, 29])


def test_scope_errors():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xffjpeg")
    img = np.zeros((4, 4), dtype=np.uint8)
    good = encode_png(img)
    # 16-bit depth
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit-depth byte
    with pytest.raises((NotImplementedError, ValueError)):
        decode_png(bytes(bad_depth))
    # interlaced
    bad_il = bytearray(good)
    bad_il[28] = 1  # IHDR interlace byte
    with pytest.raises((NotImplementedError, ValueError)):
        decode_png(bytes(bad_il))
    # truncated pixel data
    with pytest.raises(ValueError):
        decode_png(_make_png(b"\x00\x00", 4, 4, 0))
