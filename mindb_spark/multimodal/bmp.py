"""Minimal pure-stdlib BMP (DIB) decoder/encoder (numpy only).

Like PNG (zlib), GIF (LZW) and WAV (RIFF), BMP needs no external
library: it is a fixed header plus raw (optionally palettized) pixel
rows. This makes ``decode_images(fake=False)`` /
``resize_images(fake=False)`` real for BMP payloads too, leaving only
true video containers behind the PIL gate (baseline JPEG decodes
natively too — see jpeg.py).

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- decode: BITMAPINFOHEADER or later (40/52/56/108/124-byte info
  headers), uncompressed ``BI_RGB``; bit depths 8 (palette), 24, 32
  (alpha dropped); bottom-up (positive height) or top-down rows; 4-byte
  row padding.
- encode: 24-bit ``BI_RGB`` bottom-up — enough for fixtures and resize
  round-trips.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a BMP byte string to an (height, width, 3) uint8 RGB array."""
    if not is_bmp(data):
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP (missing headers)")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    info_size = struct.unpack_from("<I", data, 14)[0]
    if info_size < 40:
        raise NotImplementedError(
            f"BMP info header size {info_size} (BITMAPCOREHEADER not supported)"
        )
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    clr_used = struct.unpack_from("<I", data, 46)[0]
    # BI_BITFIELDS (3) with the canonical BGRA masks is plain raw pixels
    if compression == 3 and bpp == 32:
        masks = struct.unpack_from("<III", data, 54) if info_size >= 52 else None
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError("BMP with non-BGRA bitfield masks")
    elif compression != 0:
        raise NotImplementedError(f"BMP compression {compression} (only BI_RGB)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} (only 8/24/32)")
    if width <= 0 or height == 0:
        raise ValueError("invalid BMP dimensions")
    top_down = height < 0
    h = abs(height)
    stride = ((bpp * width + 31) // 32) * 4
    px = data[data_offset : data_offset + stride * h]
    if len(px) < stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_pal = clr_used or 256
        pal_off = 14 + info_size
        quads = data[pal_off : pal_off + 4 * n_pal]
        if len(quads) < 4 * n_pal:
            raise ValueError("truncated BMP palette")
        pal = np.frombuffer(quads, dtype=np.uint8).reshape(n_pal, 4)[:, [2, 1, 0]]
        idx = rows[:, :width]
        return np.ascontiguousarray(pal[idx % n_pal])
    n = bpp // 8
    bgr = rows[:, : width * n].reshape(h, width, n)
    return np.ascontiguousarray(bgr[:, :, [2, 1, 0]])  # drop alpha if present


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w) or (h, w, 3) uint8 array as a 24-bit BI_RGB BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("encode_bmp expects (h, w[, 3]) uint8")
    stride = ((24 * w + 31) // 32) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    px = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + px
