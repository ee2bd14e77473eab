"""Minimal pure-stdlib baseline JPEG decoder/encoder (numpy only).

JPEG needs no external library either — baseline sequential DCT
(SOF0) is segment parsing + canonical Huffman + dequantize + inverse
zigzag + 8x8 IDCT + YCbCr->RGB, all of which numpy expresses directly
(spec: ITU-T T.81 / ISO 10918-1; quant + Huffman defaults from its
Annex K). This closes the last common image format that was behind
the PIL gate: ``decode_images(fake=False)`` / ``resize_images`` /
``sample_frames`` are now real for PNG, GIF, BMP and baseline JPEG.

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- decode: baseline sequential (SOF0/1) AND progressive (SOF2, round 10
  — T.81 Annex G: spectral selection + successive approximation, DC/AC
  first and refinement scans, EOB runs, per-scan DHT/DQT/DRI), 8-bit,
  grayscale or YCbCr with any sampling factors up to 2x2 (4:4:4,
  4:2:2, 4:2:0), multiple DQT/DHT segments, restart markers
  (DRI/RSTn). Arithmetic coding, hierarchical and 12-bit are out of
  scope.
- encode: quality-scaled Annex K quantization; baseline with the
  Annex K default Huffman tables, or progressive
  (``encode_jpeg_progressive``) with a fixed 7-scan script — enough
  for fixtures and resize round-trips, not an optimizing encoder.

The DCT is the orthonormal DCT-II matrix product (not a fast
factorization): bit-exact testability beats speed for fixture-scale
payloads; the Arrow batching around it is the production shape.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables
# zigzag scan order, ITU-T T.81 Figure A.6 (index = scan position)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance / chrominance), raster order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 default Huffman tables: (bits[1..16] counts, symbol values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: block_dct = D @ block @ D.T
_DCT_D = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


# ----------------------------------------------------------------- huffman


def _canonical_codes(counts, symbols):
    """ITU-T T.81 Annex C canonical code assignment:
    {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _split_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos``, 0xFF00-unstuffed, split into the
    per-restart-interval segments delimited by RSTn markers, ending at
    the first real marker (or EOF). Returns ``(segments, end)`` where
    ``end`` is the absolute offset of that terminating marker's 0xFF (or
    ``len(data)``) — the progressive decoder resumes its marker walk
    there between scans.

    One vectorized numpy pass finds every 0xFF; the Python loop below it
    runs per MARKER (~1/256 bytes for stuffing), not per byte — this
    replaced a per-byte ``_BitReader._fill`` that capped decode at
    ~0.03 MB/s/core (round-6 throughput probe)."""
    arr = np.frombuffer(data, dtype=np.uint8)[pos:]
    n = arr.size
    ff = np.nonzero(arr == 0xFF)[0]
    segs: list[bytes] = []
    parts: list[np.ndarray] = []
    prev = 0
    for p in ff.tolist():
        nxt = int(arr[p + 1]) if p + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed: keep the FF, drop the 00
            parts.append(arr[prev : p + 1])
            prev = p + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            parts.append(arr[prev:p])
            segs.append(np.concatenate(parts).tobytes() if parts else b"")
            parts = []
            prev = p + 2
        else:  # real marker (EOI / next segment): end of entropy data
            parts.append(arr[prev:p])
            segs.append(np.concatenate(parts).tobytes())
            return segs, pos + p
    parts.append(arr[prev:n])
    segs.append(np.concatenate(parts).tobytes())
    return segs, len(data)


_DECTAB_CACHE: dict[tuple, tuple[list[int], list[int]]] = {}


def _build_dectab(table: dict, ac: bool) -> tuple[list[int], list[int]]:
    """Two 16-bit LUTs per Huffman table — the vectorized-Huffman stage.

    ``lut[next16bits]`` = ``(code_length << 8) | symbol`` (0 = invalid
    window): ONE list index resolves any code.

    ``full[next16bits]`` resolves code AND the magnitude bits that
    follow it in the same window, so the hot loop's common case is a
    single index + a few shifts:
      - AC, coefficient (s > 0, code+s <= 16 bits):
        ``(consumed << 16) | (run << 12) | (value + 1024)`` (> 0)
      - AC, EOB: ``-consumed`` (< 0)
      - DC (t == 0 or code+t <= 16): ``(consumed << 16) | (diff + 2048)``
      - 0: fall back to the two-step lut path (ZRL, overlong codes).
    Values fit: |AC value| <= 1023 (s <= 10), |DC diff| <= 2047 (t <= 11).

    Built with numpy slice/vector fills (one per codeword) and cached by
    table content: frames sharing tables (every MJPEG stream, any fixed
    encoder) pay the ~3 ms build once."""
    key = (ac, tuple(sorted(table.items())))
    cached = _DECTAB_CACHE.get(key)
    if cached is None:
        arr = np.zeros(1 << 16, dtype=np.int32)
        fullarr = np.zeros(1 << 16, dtype=np.int32)
        for (length, code), sym in table.items():
            base = code << (16 - length)
            span = 1 << (16 - length)
            arr[base : base + span] = (length << 8) | sym
            if ac:
                s = sym & 0x0F
                if s == 0:
                    if sym == 0x00:  # EOB
                        fullarr[base : base + span] = -length
                    continue  # ZRL -> slow path
                if length + s > 16:
                    continue
                tail = np.arange(span, dtype=np.int32)
                mag = (tail >> (16 - length - s)) & ((1 << s) - 1)
                diff = np.where(mag >= (1 << (s - 1)), mag, mag - (1 << s) + 1)
                fullarr[base : base + span] = (
                    ((length + s) << 16) | ((sym >> 4) << 12)
                ) + (diff + 1024)
            else:
                t = sym
                if t == 0:
                    fullarr[base : base + span] = (length << 16) | 2048
                elif length + t <= 16:
                    tail = np.arange(span, dtype=np.int32)
                    mag = (tail >> (16 - length - t)) & ((1 << t) - 1)
                    diff = np.where(
                        mag >= (1 << (t - 1)), mag, mag - (1 << t) + 1
                    )
                    fullarr[base : base + span] = ((length + t) << 16) + (
                        diff + 2048
                    )
        cached = (arr.tolist(), fullarr.tolist())
        if len(_DECTAB_CACHE) > 32:  # bound: 32 x 512 KiB worst case
            _DECTAB_CACHE.clear()
        _DECTAB_CACHE[key] = cached
    return cached


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


_DEFAULT_HUFF_CACHE: dict | None = None


def _default_huff() -> dict:
    """Annex K default tables, used when a scan references a table no
    DHT defined — MJPEG-in-AVI frames routinely omit DHT and rely on
    exactly these defaults (the OpenDML 'AVI1' convention)."""
    global _DEFAULT_HUFF_CACHE
    if _DEFAULT_HUFF_CACHE is None:
        _DEFAULT_HUFF_CACHE = {
            (0, 0): _canonical_codes(*_HT_DC_LUMA),
            (1, 0): _canonical_codes(*_HT_AC_LUMA),
            (0, 1): _canonical_codes(*_HT_DC_CHROMA),
            (1, 1): _canonical_codes(*_HT_AC_CHROMA),
        }
    return _DEFAULT_HUFF_CACHE


# ----------------------------------------------------------------- decode


def _parse_dqt(seg: bytes, qt: dict) -> None:
    """Parse a DQT payload into ``qt`` (zigzag order, 8/16-bit entries) —
    shared by the baseline marker walk and the progressive scan loop."""
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0x0F
        i += 1
        if pq == 0:
            qt[tq] = np.frombuffer(
                seg[i : i + 64], dtype=np.uint8
            ).astype(np.int64)
            i += 64
        else:
            qt[tq] = np.frombuffer(
                seg[i : i + 128], dtype=">u2"
            ).astype(np.int64)
            i += 128


def _parse_dht(seg: bytes, huff: dict) -> None:
    """Parse a DHT payload into ``huff`` — shared like :func:`_parse_dqt`."""
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0x0F
        counts = list(seg[i + 1 : i + 17])
        nsym = sum(counts)
        huff[(tc, th)] = _canonical_codes(
            counts, list(seg[i + 17 : i + 17 + nsym])
        )
        i += 17 + nsym


def _upsample_crop(plane, cv, ch, vmax, hmax, h, w):
    """Chroma upsample (nearest, T.81 informative) + crop to frame."""
    plane = np.repeat(
        np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
    )
    return plane[:h, :w]


def _planes_to_image(full: list) -> np.ndarray:
    """Shared decode tail: grayscale passthrough or JFIF YCbCr->RGB,
    rounded + clipped — one copy of the color constants for both the
    baseline and progressive assemblers."""
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise NotImplementedError(f"JPEG with {len(full)} components")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, 3) RGB (or (h, w, 1) grayscale)
    uint8."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad signature)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length field
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                "are supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if frame.get("progressive"):
                # progressive: many scans, each its own SOS (+ possible
                # interleaved DHT/DQT/DRI); hand the whole remainder to
                # the scan accumulator, starting AT this SOS marker
                return _decode_progressive(
                    data, pos - 2, frame, qt, huff, restart_interval
                )
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 0x0F)
            # baseline files MAY legally carry one scan per component
            # (non-interleaved); this decoder handles only the single
            # interleaved-scan layout, so a partial first scan must raise
            # rather than return planes that were never decoded
            if set(scan) != {c["id"] for c in frame["comps"]}:
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG is not "
                    f"supported: first SOS covers components {sorted(scan)} "
                    f"of {sorted(c['id'] for c in frame['comps'])}"
                )
            out = _decode_scan(
                data, pos + seglen, frame, scan, qt, huff, restart_interval
            )
            return out
        # else: APPn/COM/etc — skip
        pos += seglen
    raise ValueError("JPEG contains no scan data")


def _halfwords(seg: bytes) -> list[int]:
    """Big-endian 16-bit halfwords of an (odd-padded) entropy segment."""
    if len(seg) & 1:
        seg += b"\x00"
    return np.frombuffer(seg, dtype=">u2").tolist()


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors > 2 not supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = -(-w // mcu_w)
    mcuy = -(-h // mcu_h)

    # per-component decode state, hoisted out of the MCU loop: Huffman
    # dicts + 8-bit LUT fast path, raster-order quant tables, and a flat
    # Python list accumulating raster-order coefficients for EVERY block
    # (dequant/IDCT run batched over all blocks afterwards)
    zz = ZIGZAG.tolist()
    dluts, aluts, q_raster, flats = [], [], [], []
    for comp in comps:
        dc_t, ac_t = scan[comp["id"]]
        dct = huff.get((0, dc_t), _default_huff().get((0, dc_t)))
        act = huff.get((1, ac_t), _default_huff().get((1, ac_t)))
        if dct is None or act is None:
            raise ValueError("JPEG scan references undefined Huffman table")
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG scan references undefined quant table")
        dluts.append(_build_dectab(dct, ac=False))
        aluts.append(_build_dectab(act, ac=True))
        qr = np.empty(64, dtype=np.float64)
        qr[ZIGZAG] = q.astype(np.float64)
        q_raster.append(qr)
        flats.append([])
    blocks_per_mcu = [(ci, comps[ci]["v"] * comps[ci]["h"]) for ci in range(len(comps))]

    segs, _end = _split_entropy_segments(data, pos)
    pred = [0] * len(comps)
    # inline bit-reader state over the current unstuffed segment, read as
    # big-endian HALFWORDS (refills consume exactly 2 bytes, always from
    # an even offset): `acc` holds `nb` MSB-first bits and is re-masked
    # at every refill so it stays a one/two-limb int; exhausted streams
    # refill with zero halfwords (the previous reader's zero-fill
    # behavior at a truncated stream). Every refill is ONE branch adding
    # 16 bits — enough for any code and any magnitude field.
    masks = [(1 << i) - 1 for i in range(17)]
    seg_i = 0
    hw = _halfwords(segs[0])
    hwn = len(hw)
    hwi = acc = nb = 0
    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("expected JPEG restart marker")
                hw = _halfwords(segs[seg_i])
                hwn = len(hw)
                hwi = acc = nb = 0
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, nblk in blocks_per_mcu:
                dlut, dfull = dluts[ci]
                alut, afull = aluts[ci]
                flat = flats[ci]
                p = pred[ci]
                for _b in range(nblk):
                    blk = [0.0] * 64
                    # ---- DC: category + magnitude, usually one LUT hit
                    if nb < 16:
                        acc = ((acc & masks[nb]) << 16) | (
                            hw[hwi] if hwi < hwn else 0
                        )
                        hwi += 1
                        nb += 16
                    v = dfull[(acc >> (nb - 16)) & 0xFFFF]
                    if v:
                        nb -= v >> 16
                        p += (v & 0xFFF) - 2048
                    else:
                        v = dlut[(acc >> (nb - 16)) & 0xFFFF]
                        if not v:
                            raise ValueError("invalid JPEG Huffman code")
                        t = v & 0xFF
                        nb -= v >> 8
                        if t:
                            if nb < t:
                                acc = ((acc & masks[nb]) << 16) | (
                                    hw[hwi] if hwi < hwn else 0
                                )
                                hwi += 1
                                nb += 16
                            nb -= t
                            mag = (acc >> nb) & masks[t]
                            p += (
                                mag
                                if mag >= (1 << (t - 1))
                                else mag - (1 << t) + 1
                            )
                    blk[0] = p
                    # ---- AC: (run, size, value), usually one LUT hit
                    k = 1
                    while k < 64:
                        if nb < 16:
                            acc = ((acc & masks[nb]) << 16) | (
                                hw[hwi] if hwi < hwn else 0
                            )
                            hwi += 1
                            nb += 16
                        v = afull[(acc >> (nb - 16)) & 0xFFFF]
                        if v > 0:
                            nb -= v >> 16
                            k += (v >> 12) & 0xF
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[zz[k]] = (v & 0xFFF) - 1024
                            k += 1
                        elif v < 0:  # EOB (packed as -code_length)
                            nb += v
                            break
                        else:  # slow path: ZRL or an overlong codeword
                            v = alut[(acc >> (nb - 16)) & 0xFFFF]
                            if not v:
                                raise ValueError("invalid JPEG Huffman code")
                            rs = v & 0xFF
                            nb -= v >> 8
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB (defensive; afull covers it)
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            if nb < s:
                                acc = ((acc & masks[nb]) << 16) | (
                                    hw[hwi] if hwi < hwn else 0
                                )
                                hwi += 1
                                nb += 16
                            nb -= s
                            mag = (acc >> nb) & masks[s]
                            blk[zz[k]] = (
                                mag
                                if mag >= (1 << (s - 1))
                                else mag - (1 << s) + 1
                            )
                            k += 1
                    flat.extend(blk)
                pred[ci] = p

    # batched dequant + IDCT + scatter: blocks arrive in (my, mx, by, bx)
    # order per component, so a transpose/reshape assembles each plane
    # with no per-block Python
    D = _DCT_D
    full = []
    for ci, comp in enumerate(comps):
        cv, ch = comp["v"], comp["h"]
        coef = np.asarray(flats[ci], dtype=np.float64).reshape(-1, 64)
        coef *= q_raster[ci]
        px = (D.T @ coef.reshape(-1, 8, 8)) @ D + 128.0
        plane = (
            px.reshape(mcuy, mcux, cv, ch, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * cv * 8, mcux * ch * 8)
        )
        full.append(_upsample_crop(plane, cv, ch, vmax, hmax, h, w))
    return _planes_to_image(full)


# -------------------------------------------------------------- progressive
# Progressive DCT (SOF2) per ITU-T T.81 Annex G (round 10, VERDICT r9 #8):
# the image's quantized coefficients arrive over MULTIPLE scans — spectral
# selection (a scan covers zigzag band Ss..Se of one component, or DC for
# several) and successive approximation (first scan delivers coefficients
# >> Al; later scans refine one bit at a time, Ah -> Al). Decoding
# accumulates per-component zigzag-order coefficient grids across scans
# and runs the shared dequant + IDCT + color pipeline once at EOI.
# Clarity-first bit reader (per-scan halfword accumulator, same refill
# shape as the baseline hot loop); progressive web JPEGs are fixture- to
# photo-scale here, and the Arrow batching around decode is unchanged.


class _ProgBitReader:
    """MSB-first bit reader over one unstuffed entropy segment."""

    __slots__ = ("hw", "hwn", "hwi", "acc", "nb")

    def __init__(self, seg: bytes):
        self.hw = _halfwords(seg)
        self.hwn = len(self.hw)
        self.hwi = 0
        self.acc = 0
        self.nb = 0

    def _fill(self):
        self.acc = ((self.acc & ((1 << self.nb) - 1)) << 16) | (
            self.hw[self.hwi] if self.hwi < self.hwn else 0
        )
        self.hwi += 1
        self.nb += 16

    def peek16(self) -> int:
        if self.nb < 16:
            self._fill()
        return (self.acc >> (self.nb - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nb -= n

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nb < n:
            self._fill()
        self.nb -= n
        return (self.acc >> self.nb) & ((1 << n) - 1)

    def bit(self) -> int:
        return self.bits(1)


def _read_code(br: _ProgBitReader, lut: list[int]) -> int:
    v = lut[br.peek16()]
    if not v:
        raise ValueError("invalid JPEG Huffman code")
    br.skip(v >> 8)
    return v & 0xFF


def _decode_progressive(data, pos, frame, qt, huff, restart_interval):
    """Accumulate every scan of a progressive JPEG (marker walk resumes
    at the first SOS); assemble at EOI."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors > 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # zigzag-order coefficient grid per component, full padded MCU extent
    coef = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]
    # per-component non-interleaved block extents (T.81 A.2.2: data-unit
    # grid of ceil(x_i/8) x ceil(y_i/8), x_i = ceil(w*h_i/hmax))
    def _cd(a, b):
        return -(-a // b)

    niw = [_cd(_cd(w * c["h"], hmax), 8) for c in comps]
    nih = [_cd(_cd(h * c["v"], vmax), 8) for c in comps]
    id2ci = {c["id"]: ci for ci, c in enumerate(comps)}

    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI: all scans in — assemble
            break
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT between scans
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT between scans
            _parse_dht(seg, huff)
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # one scan
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in id2ci:
                    raise ValueError("JPEG scan references unknown component")
                sel.append((id2ci[cs], tables >> 4, tables & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, end = _split_entropy_segments(data, pos + seglen)
            _decode_prog_scan(
                segs, frame, comps, sel, ss, se, ah, al, huff,
                restart_interval, coef, mcux, mcuy, niw, nih,
            )
            pos = end
            continue
        pos += seglen

    # ---- assemble: dequant (zigzag) -> raster scatter -> IDCT -> planes
    D = _DCT_D
    full = []
    for ci, comp in enumerate(comps):
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG scan references undefined quant table")
        vals = coef[ci].astype(np.float64) * q.astype(np.float64)
        raster = np.empty_like(vals)
        raster[:, :, ZIGZAG] = vals
        by_t, bx_t = coef[ci].shape[:2]
        px = (D.T @ raster.reshape(-1, 8, 8)) @ D + 128.0
        plane = (
            px.reshape(by_t, bx_t, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by_t * 8, bx_t * 8)
        )
        full.append(
            _upsample_crop(plane, comp["v"], comp["h"], vmax, hmax, h, w)
        )
    return _planes_to_image(full)


def _decode_prog_scan(
    segs, frame, comps, sel, ss, se, ah, al, huff,
    restart_interval, coef, mcux, mcuy, niw, nih,
):
    """Decode one progressive scan into the coefficient grids.

    Four scan kinds (T.81 G.2): DC first (Ss=Se=0, Ah=0, value << Al),
    DC refinement (one bit per block ORed at bit Al), AC first (single
    component, band Ss..Se, EOB runs), AC refinement (correction bits
    for history-nonzero coefficients + newly-significant ±1<<Al)."""
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG progressive scan with Ss=0 must have Se=0")
        dluts = {}
        for ci, dc_t, _ac_t in sel:
            tbl = huff.get((0, dc_t))
            if tbl is None and ah > 0:
                tbl = {}  # refinement reads raw bits, no codes
            if tbl is None:
                # same DHT-omitted tolerance the baseline lane documents
                # (the AVI1/MJPEG convention): fall back to the T.81
                # Annex K tables instead of narrowing the contract here
                tbl = _default_huff().get((0, dc_t))
            if tbl is None:
                raise ValueError("JPEG scan references undefined Huffman table")
            dluts[ci] = _build_dectab(tbl, ac=False)[0] if tbl else None

        # scan order: interleaved MCUs when ns > 1, else the component's
        # own non-interleaved block raster
        def dc_blocks():
            if len(sel) > 1:
                for _my in range(mcuy):
                    for _mx in range(mcux):
                        for ci, _d, _a in sel:
                            cv, chh = comps[ci]["v"], comps[ci]["h"]
                            for by in range(cv):
                                for bx in range(chh):
                                    yield ci, _my * cv + by, _mx * chh + bx
            else:
                ci = sel[0][0]
                for by in range(nih[ci]):
                    for bx in range(niw[ci]):
                        yield ci, by, bx

        per_restart = restart_interval
        if len(sel) > 1:
            blocks_per_mcu = sum(
                comps[ci]["v"] * comps[ci]["h"] for ci, _d, _a in sel
            )
            per_restart = restart_interval * blocks_per_mcu if restart_interval else 0
        seg_i = 0
        br = _ProgBitReader(segs[0])
        pred = {ci: 0 for ci, _d, _a in sel}
        count = 0
        for ci, by, bx in dc_blocks():
            if per_restart and count and count % per_restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("expected JPEG restart marker")
                br = _ProgBitReader(segs[seg_i])
                pred = {k: 0 for k in pred}
            count += 1
            if ah == 0:  # DC first
                t = _read_code(br, dluts[ci])
                diff = _extend(br.bits(t), t) if t else 0
                pred[ci] += diff
                coef[ci][by, bx, 0] = pred[ci] << al
            else:  # DC refinement: one raw bit, OR at position Al
                if br.bit():
                    coef[ci][by, bx, 0] |= 1 << al
        return

    # ---- AC scans: exactly one component (T.81 G.1.1.1.1)
    if len(sel) != 1:
        raise ValueError("JPEG progressive AC scan must have one component")
    ci, _dc_t, ac_t = sel[0]
    tbl = huff.get((1, ac_t), _default_huff().get((1, ac_t)))
    if tbl is None:
        raise ValueError("JPEG scan references undefined Huffman table")
    alut = _build_dectab(tbl, ac=True)[0]
    grid = coef[ci]
    p1 = 1 << al
    m1 = -(1 << al)

    seg_i = 0
    br = _ProgBitReader(segs[0])
    eobrun = 0
    count = 0
    for by in range(nih[ci]):
        for bx in range(niw[ci]):
            if restart_interval and count and count % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("expected JPEG restart marker")
                br = _ProgBitReader(segs[seg_i])
                eobrun = 0
            count += 1
            blk = grid[by, bx]
            if ah == 0:  # AC first
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_code(br, alut)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index overflow")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
            else:  # AC refinement (T.81 G.2.2 decode structure)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _read_code(br, alut)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:  # EOB run (covers this block's tail)
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "JPEG AC refinement size must be 1"
                                )
                            newval = p1 if br.bit() else m1
                        # advance over r zero-history coefficients,
                        # applying correction bits to nonzero ones passed
                        while k <= se:
                            v = int(blk[k])
                            if v != 0:
                                if br.bit() and (v & p1) == 0:
                                    blk[k] = v + (p1 if v >= 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    # EOB region: correction bits only, for every
                    # history-nonzero coefficient left in the band
                    while k <= se:
                        v = int(blk[k])
                        if v != 0 and br.bit() and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1


# ----------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self):
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


def _encode_codes(counts, symbols):
    """symbol -> (code, length) for the canonical table."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(counts, symbols).items()
    }


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _quantized_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H/8, W/8, 64) quantized zigzag coefficients for a level-shifted
    plane (H, W both multiples of 8), vectorized over all blocks."""
    ph, pw = plane.shape
    D = _DCT_D
    blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("kn,ijnm,ml->ijkl", D, blocks, D.T)
    zz = coef.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]
    return np.round(zz / q).astype(np.int64)


def _prep_encode(img: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: color transform, MCU-grid padding,
    chroma downsample, quantization. Returns
    (qplanes, samp, tsel, qy, qc, h, w, ch, mcux, mcuy) where each
    qplanes[ci] is the (blocks_y, blocks_x, 64) zigzag coefficient grid."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsample not in ("444", "420"):
        raise NotImplementedError("encode_jpeg supports 444 or 420 only")
    qy = _scaled_qt(_QT_LUMA, quality)
    qc = _scaled_qt(_QT_CHROMA, quality)
    if ch == 3:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [qy, qc, qc]
        tsel = [0, 1, 1]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample == "420" else [(1, 1)] * 3
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        qts = [qy]
        tsel = [0]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux, mcuy = -(-w // mcu_w), -(-h // mcu_h)

    # per component: pad to the MCU grid (edge replication), downsample
    # chroma by block mean, level-shift, then quantize all blocks
    qplanes = []
    for ci, (p, q, (sh, sv)) in enumerate(zip(planes, qts, samp)):
        tgt_h, tgt_w = mcuy * sv * 8, mcux * sh * 8
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            src = np.pad(
                p,
                ((0, mcuy * mcu_h - h), (0, mcux * mcu_w - w)),
                mode="edge",
            )
            p = src.reshape(tgt_h, fy, tgt_w, fx).mean(axis=(1, 3))
        else:
            p = np.pad(p, ((0, tgt_h - h), (0, tgt_w - w)), mode="edge")
        qplanes.append(_quantized_blocks(p - 128.0, q))
    return qplanes, samp, tsel, qy, qc, h, w, ch, mcux, mcuy


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w[, 1|3]) uint8 array as a baseline JPEG with the
    Annex K default Huffman tables. ``subsample``: ``"444"`` (one block
    per component per MCU) or ``"420"`` (2x2 luma blocks + 2x2-mean
    downsampled chroma per MCU). ``restart_interval`` > 0 writes a DRI
    segment and an RSTn marker (with predictor reset) every that many
    MCUs."""
    qplanes, samp, tsel, qy, qc, h, w, ch, mcux, mcuy = _prep_encode(
        img, quality, subsample
    )

    dc_tabs = [_encode_codes(*_HT_DC_LUMA), _encode_codes(*_HT_DC_CHROMA)]
    ac_tabs = [_encode_codes(*_HT_AC_LUMA), _encode_codes(*_HT_AC_CHROMA)]
    wtr = _BitWriter()
    pred = [0] * len(qplanes)

    def emit_magnitude(v: int, t: int):
        wtr.write(v if v >= 0 else v + (1 << t) - 1, t)

    def emit_block(zzq, ci):
        dct, act = dc_tabs[tsel[ci]], ac_tabs[tsel[ci]]
        diff = int(zzq[0]) - pred[ci]
        pred[ci] = int(zzq[0])
        t = _category(diff)
        code, ln = dct[t]
        wtr.write(code, ln)
        if t:
            emit_magnitude(diff, t)
        run = 0
        nz = np.nonzero(zzq[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zzq[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]  # ZRL
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = act[(run << 4) | s]
            wtr.write(code, ln)
            emit_magnitude(v, s)
            run = 0
        if last < 63:
            code, ln = act[0x00]  # EOB
            wtr.write(code, ln)

    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(qplanes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        emit_block(
                            qplanes[ci][my * sv + by, mx * sh + bx], ci
                        )
    wtr.flush()

    # ---- assemble segments
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xDB, b"\x00" + qy.astype(np.uint8).tobytes()))
    if ch == 3:
        out.append(seg(0xDB, b"\x01" + qc.astype(np.uint8).tobytes()))

    def dht(tc, th, table):
        counts, symbols = table
        return seg(
            0xC4,
            bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols),
        )

    out.append(dht(0, 0, _HT_DC_LUMA))
    out.append(dht(1, 0, _HT_AC_LUMA))
    if ch == 3:
        out.append(dht(0, 1, _HT_DC_CHROMA))
        out.append(dht(1, 1, _HT_AC_CHROMA))
    ncomp = 3 if ch == 3 else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sh, sv = samp[c]
        sof += bytes([c + 1, (sh << 4) | sv, 0 if c == 0 else 1])
    out.append(seg(0xC0, sof))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for c in range(ncomp):
        dc_t = 0 if c == 0 else 1
        sos += bytes([c + 1, (dc_t << 4) | dc_t])
    sos += b"\x00\x3f\x00"
    out.append(seg(0xDA, sos))
    out.append(bytes(wtr.out))
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ----------------------------------------------------- progressive encode
# Flat 9-bit AC Huffman table for progressive scans: the Annex K AC
# tables carry no EOBn symbols (r<<4, r>0), which progressive AC scans
# need for EOB runs, so the encoder ships its own table in DHT — every
# symbol it can emit at code length 9 (176 codes of 512; prefix-free by
# construction, the all-ones word unused as T.81 C.2 requires).
# Compression is secondary here: this encoder exists to produce REAL
# SOF2 streams whose decode provably matches the baseline pipeline.
_PROG_AC_SYMBOLS = (
    [r << 4 for r in range(15)]                      # EOB0..EOB14
    + [0xF0]                                         # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_COUNTS = [0] * 8 + [len(_PROG_AC_SYMBOLS)] + [0] * 7


class _ProgACWriter:
    """Shared AC-scan state: one Huffman writer plus the cross-block
    EOB-run accumulator (T.81 G.1.2.2) and, for refinement scans, the
    correction bits buffered behind it."""

    def __init__(self, wtr: "_BitWriter", act: dict):
        self.wtr = wtr
        self.act = act
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits behind the EOB run

    def sym(self, s: int):
        code, ln = self.act[s]
        self.wtr.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.wtr.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.wtr.write(b, 1)
        self.pending = []

    def bump_eobrun(self, bits: list[int]):
        self.eobrun += 1
        self.pending.extend(bits)
        if self.eobrun == 0x7FFF or len(self.pending) > 900:
            self.flush_eobrun()


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 G.1.2.1)."""
    return -((-v) >> al) if v < 0 else v >> al


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    al: int = 1,
    ac_bands: tuple = ((1, 63),),
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w[, 1|3]) uint8 array as a progressive (SOF2) JPEG.

    Default scan script exercising every progressive decode path:
      1. DC first, all components interleaved, Al=``al``
      2. DC refinement passes, Ah=a -> Al=a-1 down to 0
      3. per (band, component): AC first, Ss..Se, Al=``al`` (EOB runs, ZRL)
      4. per (level, band, component): AC refinement, Ah=a -> Al=a-1
         (correction bits, newly-significant coefficients, buffered
         EOB-run bits)

    ``al`` deepens the successive approximation (al=2 → two refinement
    passes per coefficient class); ``ac_bands`` splits the AC spectrum
    into libjpeg-style spectral-selection bands (must tile 1..63);
    ``restart_interval`` emits a DRI segment and RSTn markers every that
    many MCUs (interleaved DC scan) / blocks (single-component scans) —
    together these parameterize the generic scan scripts real encoders
    produce, so tests can pin the decoder's band-split / Al>=2 / DRI
    branches (round-10 review).

    The quantized coefficients are IDENTICAL to ``encode_jpeg``'s for the
    same (img, quality, subsample), so ``decode_jpeg`` of this stream
    must equal ``decode_jpeg`` of the baseline stream bit-for-bit — the
    self-consistency proof pinned in tests/test_jpeg.py."""
    if al < 1 or al > 13:
        raise ValueError("al must be in 1..13")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in 0..65535")
    bands = sorted(tuple(b) for b in ac_bands)
    flat = [k for ss_, se_ in bands for k in range(ss_, se_ + 1)]
    if flat != list(range(1, 64)):
        raise ValueError("ac_bands must tile 1..63 without gaps/overlap")
    qplanes, samp, tsel, qy, qc, h, w, ch, mcux, mcuy = _prep_encode(
        img, quality, subsample
    )
    ncomp = len(qplanes)
    dc_tabs = [_encode_codes(*_HT_DC_LUMA), _encode_codes(*_HT_DC_CHROMA)]
    act = _encode_codes(_PROG_AC_COUNTS, _PROG_AC_SYMBOLS)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # non-interleaved block extents per component (decoder mirror)
    niw = [-(-(-(-w * sh // hmax)) // 8) for sh, _sv in samp]
    nih = [-(-(-(-h * sv // vmax)) // 8) for _sh, sv in samp]

    def interleaved_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, my * sv + by, mx * sh + bx

    scans: list[tuple[bytes, bytes]] = []  # (sos payload, entropy bytes)

    def sos_payload(comp_sel, ss_, se_, ah_, al_):
        p = bytes([len(comp_sel)])
        for cid, dc_t, ac_t in comp_sel:
            p += bytes([cid, (dc_t << 4) | ac_t])
        return p + bytes([ss_, se_, (ah_ << 4) | al_])

    def join_restarts(chunks: list) -> bytes:
        out = bytearray()
        for i, c in enumerate(chunks):
            out += c
            if i < len(chunks) - 1:
                out += bytes([0xFF, 0xD0 + (i % 8)])
        return bytes(out)

    # restart counting mirrors the decoder: MCUs when interleaved (the DC
    # scan covers blocks_per_mcu blocks per unit), blocks when ns == 1
    dc_per_restart = restart_interval * (
        sum(sh * sv for sh, sv in samp) if ncomp > 1 else 1
    )

    # ---- scan 1: DC first, interleaved, Al=al
    wtr = _BitWriter()
    chunks: list = []
    pred = [0] * ncomp
    for n, (ci, gy, gx) in enumerate(interleaved_blocks()):
        if dc_per_restart and n and n % dc_per_restart == 0:
            wtr.flush()
            chunks.append(bytes(wtr.out))
            wtr = _BitWriter()
            pred = [0] * ncomp
        v = int(qplanes[ci][gy, gx, 0]) >> al  # arithmetic shift (G.1.2.1)
        diff = v - pred[ci]
        pred[ci] = v
        t = _category(diff)
        code, ln = dc_tabs[tsel[ci]][t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    chunks.append(bytes(wtr.out))
    scans.append((
        sos_payload([(c + 1, tsel[c], 0) for c in range(ncomp)], 0, 0, 0, al),
        join_restarts(chunks),
    ))

    # ---- DC refinement passes, Ah=a -> Al=a-1 down to 0
    for a in range(al, 0, -1):
        wtr = _BitWriter()
        chunks = []
        for n, (ci, gy, gx) in enumerate(interleaved_blocks()):
            if dc_per_restart and n and n % dc_per_restart == 0:
                wtr.flush()
                chunks.append(bytes(wtr.out))
                wtr = _BitWriter()
            wtr.write((int(qplanes[ci][gy, gx, 0]) >> (a - 1)) & 1, 1)
        wtr.flush()
        chunks.append(bytes(wtr.out))
        scans.append((
            sos_payload(
                [(c + 1, tsel[c], 0) for c in range(ncomp)], 0, 0, a, a - 1
            ),
            join_restarts(chunks),
        ))

    # ---- per (band, component): AC first (Al=al)
    for ss_, se_ in bands:
        for ci in range(ncomp):
            wtr = _BitWriter()
            ac = _ProgACWriter(wtr, act)
            chunks = []
            count = 0
            for gy in range(nih[ci]):
                for gx in range(niw[ci]):
                    if (
                        restart_interval
                        and count
                        and count % restart_interval == 0
                    ):
                        ac.flush_eobrun()
                        wtr.flush()
                        chunks.append(bytes(wtr.out))
                        wtr = _BitWriter()
                        ac = _ProgACWriter(wtr, act)
                    count += 1
                    blk = qplanes[ci][gy, gx]
                    shifted = [
                        _pt_ac(int(blk[k]), al) for k in range(ss_, se_ + 1)
                    ]
                    nz = [i for i, v in enumerate(shifted) if v]
                    if not nz:
                        ac.bump_eobrun([])
                        continue
                    ac.flush_eobrun()
                    r = 0
                    for i in range(nz[-1] + 1):
                        v = shifted[i]
                        if v == 0:
                            r += 1
                            continue
                        while r > 15:
                            ac.sym(0xF0)
                            r -= 16
                        s = _category(v)
                        ac.sym((r << 4) | s)
                        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                        r = 0
                    if nz[-1] < se_ - ss_:  # trailing zeros: EOB run
                        ac.bump_eobrun([])
            ac.flush_eobrun()
            wtr.flush()
            chunks.append(bytes(wtr.out))
            scans.append((
                sos_payload([(ci + 1, 0, 0)], ss_, se_, 0, al),
                join_restarts(chunks),
            ))

    # ---- per (level, band, component): AC refinement, Ah=a -> Al=a-1
    # (T.81 G.1.2.3 / the classic two-buffer shape)
    for a in range(al, 0, -1):
        for ss_, se_ in bands:
            for ci in range(ncomp):
                wtr = _BitWriter()
                ac = _ProgACWriter(wtr, act)
                chunks = []
                count = 0
                for gy in range(nih[ci]):
                    for gx in range(niw[ci]):
                        if (
                            restart_interval
                            and count
                            and count % restart_interval == 0
                        ):
                            ac.flush_eobrun()
                            wtr.flush()
                            chunks.append(bytes(wtr.out))
                            wtr = _BitWriter()
                            ac = _ProgACWriter(wtr, act)
                        count += 1
                        blk = qplanes[ci][gy, gx]
                        absv = [
                            abs(int(blk[k])) >> (a - 1)
                            for k in range(ss_, se_ + 1)
                        ]
                        eob = 0  # index AFTER the last newly-significant coef
                        for i, t in enumerate(absv):
                            if t == 1:
                                eob = i + 1
                        r = 0
                        corr: list = []  # bits since the last emitted code
                        for i in range(se_ - ss_ + 1):
                            t = absv[i]
                            if t == 0:
                                r += 1
                                continue
                            while r > 15 and i < eob:
                                ac.flush_eobrun()
                                ac.sym(0xF0)
                                r -= 16
                                for b in corr:
                                    wtr.write(b, 1)
                                corr = []
                            if t > 1:  # history-nonzero: buffer its bit
                                corr.append(t & 1)
                                continue
                            # newly significant (magnitude 1 this precision)
                            ac.flush_eobrun()
                            ac.sym((r << 4) | 1)
                            wtr.write(
                                0 if int(blk[ss_ + i]) < 0 else 1, 1
                            )
                            for b in corr:
                                wtr.write(b, 1)
                            corr = []
                            r = 0
                        if r > 0 or corr:
                            ac.bump_eobrun(corr)
                ac.flush_eobrun()
                wtr.flush()
                chunks.append(bytes(wtr.out))
                scans.append((
                    sos_payload([(ci + 1, 0, 0)], ss_, se_, a, a - 1),
                    join_restarts(chunks),
                ))

    # ---- assemble segments
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]
    out.append(seg(0xDB, b"\x00" + qy.astype(np.uint8).tobytes()))
    if ch == 3:
        out.append(seg(0xDB, b"\x01" + qc.astype(np.uint8).tobytes()))

    def dht(tc, th, counts, symbols):
        return seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
        )

    out.append(dht(0, 0, *_HT_DC_LUMA))
    if ch == 3:
        out.append(dht(0, 1, *_HT_DC_CHROMA))
    out.append(dht(1, 0, _PROG_AC_COUNTS, _PROG_AC_SYMBOLS))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sh, sv = samp[c]
        sof += bytes([c + 1, (sh << 4) | sv, 0 if c == 0 else 1])
    out.append(seg(0xC2, sof))  # SOF2: progressive
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    for payload, entropy in scans:
        out.append(seg(0xDA, payload))
        out.append(entropy)
    out.append(b"\xff\xd9")
    return b"".join(out)
