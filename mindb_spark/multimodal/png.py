"""Minimal pure-stdlib PNG decoder (zlib inflate + numpy unfiltering).

This container has no image libraries (PIL/libvips), but PNG needs none:
the format is zlib-compressed scanlines with five byte-filters (spec
https://www.w3.org/TR/png-3/). This decoder makes
``decode_images(fake=False)`` REAL for PNG payloads — true (height,
width, channels) and pixel data — while other formats still require PIL.

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); non-interlaced only.
- All five scanline filters (None/Sub/Up/Average/Paeth). None/Sub/Up are
  numpy-vectorized; Average/Paeth carry an intra-line dependency and run
  a per-pixel loop — fine for metadata extraction and test fixtures; a
  production hot path would swap in a compiled codec behind the same
  ``mapInPandas`` kernel (the Spark-side plumbing does not change).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to a (height, width, channels) uint8 array.

    Palette images are expanded to RGB; gray stays single-channel."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat: list[bytes] = []
    plte: np.ndarray | None = None
    header = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 length + 4 type + data + 4 CRC
        if typ == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if header is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    w, h, depth, ctype, comp, filt, interlace = header
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if ctype not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {ctype}")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")

    bpp = _CHANNELS[ctype]  # bytes per pixel at depth 8
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1)
        off += stride + 1
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 1:  # Sub: recon[i] = line[i] + recon[i - bpp]
            # per-channel running sum mod 256 (uint8 accumulate wraps)
            recon = np.add.accumulate(
                line.reshape(w, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif ftype == 2:  # Up (uint8 add wraps mod 256)
            recon = line + prev
        elif ftype == 3:  # Average: needs recon[i - bpp] -> per-pixel loop
            recon = np.empty(stride, dtype=np.uint8)
            recon[:bpp] = line[:bpp] + (prev[:bpp] >> 1)
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(bpp, stride, bpp):
                left = recon[x - bpp : x].astype(np.int32)
                recon[x : x + bpp] = (
                    li[x : x + bpp] + ((left + pi[x : x + bpp]) >> 1)
                ) & 0xFF
        elif ftype == 4:  # Paeth: same intra-line dependency
            recon = np.empty(stride, dtype=np.uint8)
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            zero = np.zeros(bpp, dtype=np.int32)
            for x in range(0, stride, bpp):
                a = recon[x - bpp : x].astype(np.int32) if x else zero  # left
                b = pi[x : x + bpp]  # up
                c = pi[x - bpp : x] if x else zero  # up-left
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                recon[x : x + bpp] = (li[x : x + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG scanline filter {ftype}")
        out[y] = recon
        prev = recon

    img = out.reshape(h, w, bpp)
    if ctype == 3:
        img = plte[img[..., 0]]  # palette -> RGB
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, channels) uint8 array as a PNG (filter
    None, one IDAT). Exists so tests and fixtures can round-trip without
    an image library; not a production encoder."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[..., None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    scan = np.concatenate([np.zeros((h, 1), np.uint8), a.reshape(h, w * ch)], axis=1)
    comp = zlib.compress(scan.tobytes(), 6)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
