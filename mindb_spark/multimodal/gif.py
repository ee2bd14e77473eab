"""Minimal pure-stdlib GIF decoder/encoder (LZW in numpy/python).

Like PNG (zlib) and WAV (RIFF), GIF needs no external library: the
format is a palette header plus LZW-compressed pixel indices
(spec: GIF87a/89a, https://www.w3.org/Graphics/GIF/spec-gif89a.txt).
This makes ``decode_images(fake=False)`` real for GIF payloads too —
true (height, width) and pixel data — leaving only true video
containers behind the PIL gate (baseline JPEG decodes natively too —
see jpeg.py).

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- decode: GIF87a/89a, global or local color table, interlaced or not,
  single-frame (``decode_gif``) or full animations with compositing
  (``decode_gif_frames``: frame offsets, transparency index, disposal
  methods 0-3) — this is what makes ``sample_frames(fake=False)`` a
  real frame extractor for animated GIFs.
- encode: (h, w, 3) uint8 with <= 256 distinct colors (palette built
  from the data) — single frame (``encode_gif``) or a multi-frame
  animation (``encode_gif_animation``: per-frame offsets, disposal,
  transparency) — enough for fixtures and resize round-trips, not a
  general quantizer.
"""

from __future__ import annotations

import struct

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _SIGS


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width, clear/EOI codes, MSB-packed
    little-endian bit order within bytes.

    The bit reader is an inline LSB-first int accumulator (codes are
    packed low-bit-first) and output entries are joined once at the end
    — this replaced a per-BIT numpy-scalar reader that capped decode at
    ~0.3 MB/s/core (round-6 throughput probe)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = nb = bi = 0
    nbytes = len(data)
    mask = 0  # (1 << width) - 1, kept in sync with width

    # dictionary: list of byte strings; rebuilt on CLEAR
    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    mask = (1 << width) - 1
    prev: bytes | None = None
    chunks: list[bytes] = []
    n_out = 0
    while n_out < n_pixels:
        while nb < width and bi < nbytes:
            acc |= data[bi] << nb
            bi += 1
            nb += 8
        if nb < width:
            break  # truncated stream: same as hitting EOI
        code = acc & mask
        acc >>= width
        nb -= width
        if code == eoi:
            break
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            mask = (1 << width) - 1
            prev = None
            continue
        n = len(table)
        if code < n:
            entry = table[code]
        elif code == n and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        chunks.append(entry)
        n_out += len(entry)
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if n + 1 >= mask + 1 and width < 12:
            width += 1
            mask = (1 << width) - 1
    if n_out < n_pixels:
        raise ValueError("truncated GIF pixel data")
    joined = b"".join(chunks)
    return np.frombuffer(joined, dtype=np.uint8)[:n_pixels].copy()


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame (composited onto the logical-screen canvas)
    to an (h, w, 3) uint8 RGB array."""
    frames = decode_gif_frames(data, max_frames=1)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0]


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Decode every frame of a (possibly animated) GIF with full
    compositing semantics, each as an (H, W, 3) uint8 RGB array of the
    logical-screen canvas size.

    Animation semantics per the GIF89a spec (§23 Graphic Control
    Extension): frames are drawn at their (left, top) offsets; pixels
    equal to the frame's transparency index leave the canvas untouched;
    between frames the disposal method applies — 0/1 leave the canvas
    as drawn, 2 restores the frame rectangle to the background color,
    3 restores it to the pre-draw contents. Local color tables override
    the global one per frame. ``max_frames`` bounds work for callers
    that only need a prefix (``decode_gif`` passes 1).
    """
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    w_canvas, h_canvas, packed, bg_idx, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg_idx % len(gct)] if gct is not None else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h_canvas, w_canvas, 3)).copy()
    frames: list[np.ndarray] = []
    disposal = 0
    transp: int | None = None
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control Extension
                gpacked = data[pos + 1]
                disposal = (gpacked >> 2) & 0x07
                transp = data[pos + 4] if gpacked & 0x01 else None
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            x, y, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
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
            idx = idx.reshape(h, w)
            # clip frames that overhang the canvas (malformed but seen)
            hh = min(h, h_canvas - y)
            ww = min(w, w_canvas - x)
            if hh <= 0 or ww <= 0:
                hh = ww = 0
            region = canvas[y : y + hh, x : x + ww]
            saved = region.copy() if disposal == 3 else None
            rgb = ct[idx[:hh, :ww] % len(ct)]
            if transp is not None:
                mask = idx[:hh, :ww] != transp
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            if disposal == 2:
                canvas[y : y + hh, x : x + ww] = bg_rgb
            elif disposal == 3 and saved is not None:
                canvas[y : y + hh, x : x + ww] = saved
            disposal = 0
            transp = None
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


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


def _palette_fit(flat: np.ndarray):
    """Shared palette machinery: (padded palette bytes, bits, indices)."""
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise NotImplementedError("encode_gif needs <= 256 distinct colors")
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n_pal = 1 << bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    return palette, pal_bytes, bits, inverse.astype(np.uint8)


def _image_block(indices: np.ndarray, x: int, y: int, min_code_size: int) -> bytes:
    h, w = indices.shape
    body = _lzw_encode(min_code_size, indices.ravel())
    blocks = b"".join(
        bytes([min(255, len(body) - i)]) + body[i : i + 255]
        for i in range(0, len(body), 255)
    )
    return (
        b"\x2c" + struct.pack("<HHHHB", x, y, w, h, 0)
        + bytes([min_code_size]) + blocks + b"\x00"
    )


def encode_gif(img: np.ndarray) -> bytes:
    """Encode one (h, w, 3) uint8 frame (<= 256 distinct colors)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    _, pal_bytes, bits, inv = _palette_fit(img.reshape(-1, 3))
    min_code_size = max(2, bits)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
        + pal_bytes.tobytes()
        + _image_block(inv.reshape(h, w), 0, 0, min_code_size)
        + b"\x3b"
    )


def encode_gif_animation(
    frames,
    offsets=None,
    disposals=None,
    transparent_color=None,
    canvas: tuple[int, int] | None = None,
    background=(0, 0, 0),
    delay_cs: int = 10,
) -> bytes:
    """Encode an animated GIF89a from a list of (h_i, w_i, 3) uint8
    frames sharing ONE global palette (union of all frame colors plus
    the background and optional transparency key, <= 256 total).

    - ``offsets``: per-frame (x, y) placement (default all (0, 0)).
    - ``disposals``: per-frame disposal method 0-3 written to each
      frame's Graphic Control Extension (default 0).
    - ``transparent_color``: an (r, g, b) key — pixels of exactly this
      color are encoded as the transparency index so they leave the
      canvas untouched when composited.
    - ``canvas``: logical-screen (height, width); defaults to the max
      extent of all placed frames.

    Exists for fixtures and tests of ``decode_gif_frames`` /
    ``sample_frames`` — a real but minimal writer, not a quantizing
    production encoder.
    """
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [0] * len(frames)
    h_canvas, w_canvas = canvas or (
        max(y + f.shape[0] for f, (x, y) in zip(frames, offsets)),
        max(x + f.shape[1] for f, (x, y) in zip(frames, offsets)),
    )
    extra = [np.asarray(background, dtype=np.uint8).reshape(1, 3)]
    if transparent_color is not None:
        extra.append(np.asarray(transparent_color, dtype=np.uint8).reshape(1, 3))
    all_px = np.concatenate([f.reshape(-1, 3) for f in frames] + extra)
    palette, pal_bytes, bits, _ = _palette_fit(all_px)
    min_code_size = max(2, bits)

    def to_idx(img: np.ndarray) -> np.ndarray:
        flat = img.reshape(-1, 3)
        # exact-match palette lookup via void-view searchsorted
        pv = np.ascontiguousarray(palette).view([("", np.uint8)] * 3).ravel()
        fv = np.ascontiguousarray(flat).view([("", np.uint8)] * 3).ravel()
        return np.searchsorted(pv, fv).astype(np.uint8).reshape(img.shape[:2])

    bg_idx = int(to_idx(np.asarray(background, np.uint8).reshape(1, 1, 3))[0, 0])
    transp_idx = (
        int(to_idx(np.asarray(transparent_color, np.uint8).reshape(1, 1, 3))[0, 0])
        if transparent_color is not None
        else None
    )
    out = [
        b"GIF89a",
        struct.pack("<HHBBB", w_canvas, h_canvas, 0x80 | ((bits - 1) & 7), bg_idx, 0),
        pal_bytes.tobytes(),
        # NETSCAPE2.0 looping extension (loop forever) — standard for animations
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00",
    ]
    for f, (x, y), disp in zip(frames, offsets, disposals):
        gpacked = (disp & 0x07) << 2 | (0x01 if transp_idx is not None else 0)
        out.append(
            b"\x21\xf9\x04"
            + bytes([gpacked])
            + struct.pack("<H", delay_cs)
            + bytes([transp_idx or 0, 0])
        )
        out.append(_image_block(to_idx(f), x, y, min_code_size))
    out.append(b"\x3b")
    return b"".join(out)
