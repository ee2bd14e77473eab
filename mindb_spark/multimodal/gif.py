"""Minimal pure-stdlib GIF decoder/encoder (LZW in numpy/python).

Like PNG (zlib) and WAV (RIFF), GIF needs no external library: the
format is a palette header plus LZW-compressed pixel indices
(spec: GIF87a/89a, https://www.w3.org/Graphics/GIF/spec-gif89a.txt).
This makes ``decode_images(fake=False)`` real for GIF payloads too —
true (height, width) and pixel data — leaving only inherently-complex
codecs (JPEG/video) behind the PIL gate.

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- decode: GIF87a/89a, global or local color table, interlaced or not,
  FIRST frame only (frame extraction for animations belongs to the
  ``sample_frames`` pipeline); transparency index is ignored (palette
  RGB is emitted).
- encode: single frame, (h, w, 3) uint8 with <= 256 distinct colors
  (palette built from the data) — enough for fixtures and resize
  round-trips, not a general quantizer.
"""

from __future__ import annotations

import struct

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _SIGS


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width, clear/EOI codes, MSB-packed
    little-endian bit order within bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader over the whole stream (GIF packs codes LSB-first)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    pos = 0

    def read_code(width):
        nonlocal pos
        if pos + width > bits.size:
            return eoi
        v = 0
        for i in range(width):
            v |= int(bits[pos + i]) << i
        pos += width
        return v

    # dictionary: list of byte strings; rebuilt on CLEAR
    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_pixels:
        code = read_code(width)
        if code == eoi:
            break
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError("truncated GIF pixel data")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame to an (h, w, 3) uint8 RGB array."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    w_canvas, h_canvas, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _x, _y, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code_size, b"".join(chunks), w * h)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                rows = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                ordered = np.empty((h, w), dtype=np.uint8)
                ordered[rows] = idx.reshape(h, w)
                idx = ordered.ravel()
            return ct[idx.reshape(h, w) % len(ct)]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits: list[int] = []

    def emit(code, w):
        for i in range(w):
            out_bits.append((code >> i) & 1)

    emit(clear, width)
    prev = b""
    for px in indices.tolist():
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([px])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    pad = (-len(out_bits)) % 8
    out_bits.extend([0] * pad)
    arr = np.array(out_bits, dtype=np.uint8).reshape(-1, 8)
    return np.packbits(arr, axis=1, bitorder="little").tobytes()


def encode_gif(img: np.ndarray) -> bytes:
    """Encode one (h, w, 3) uint8 frame (<= 256 distinct colors)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise NotImplementedError("encode_gif needs <= 256 distinct colors")
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n_pal = 1 << bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    min_code_size = max(2, bits)
    body = _lzw_encode(min_code_size, inverse.astype(np.uint8))
    blocks = b"".join(
        bytes([min(255, len(body) - i)]) + body[i : i + 255]
        for i in range(0, len(body), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
        + pal_bytes.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code_size]) + blocks + b"\x00"
        + b"\x3b"
    )
