"""MPEG audio (MP1/MP2/MP3) FRAME-level parsing, pure stdlib.

Closes the curation-relevant half of the "MP3/OGG" media gap (VERDICT
r10 #7): a 100 TB audio-curation pipeline filters on duration, bitrate,
sample rate, channel layout, CBR/VBR and corruption — all properties of
the FRAME LAYER, which is a pure public header grammar (ISO/IEC 11172-3
§2.4 / ISO 13818-3 for the LSF extension; bitrate and sample-rate
tables below are the published ones). This module walks that grammar:
ID3v2/ID3v1 tag skip, per-frame header validation, frame-length
arithmetic, Xing/Info VBR header detection, desync/truncation
accounting.

Full PCM decode of Layer III stays env-gated with the other compressed
codecs (multimodal/columns.py): it needs the Huffman tables + IMDCT +
polyphase synthesis of the spec, and this container has no reference
decoder to certify a from-scratch implementation against — the repo's
media bar is bit-exact proof (JPEG/PNG/GIF/WAV) or an explicit gate,
never an uncertified decoder.

Deliberately total and non-throwing on garbage: ``mpeg_audio_meta``
reports what it found (0 frames for a non-MPEG payload) rather than
raising, because at corpus scale the CALLER's job is to filter on
``n_frames == 0`` / ``desync_bytes > 0``, not to catch per-row
exceptions.
"""

from __future__ import annotations

# bitrate tables in kbps, index 1..14 (index 0 = "free format", 15 = bad)
# keyed by (version_group, layer); version group "1" = MPEG-1,
# "2" = MPEG-2 and MPEG-2.5 (they share tables)
_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_VERSIONS = {0: "2.5", 2: "2", 3: "1"}  # header version bits -> name
_LAYERS = {1: 3, 2: 2, 3: 1}  # header layer bits -> layer number


def _parse_header(b: bytes, pos: int) -> dict | None:
    """Parse the 4-byte frame header at ``pos``; None if invalid."""
    if pos + 4 > len(b):
        return None
    h = int.from_bytes(b[pos : pos + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = _VERSIONS.get((h >> 19) & 3)
    layer = _LAYERS.get((h >> 17) & 3)
    if version is None or layer is None:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        # free-format (0) has no in-band frame length; treat as invalid
        # for the walk — a real pipeline flags it rather than guessing
        return None
    vgroup = "1" if version == "1" else "2"
    bitrate = _BITRATES[(vgroup, layer)][br_idx - 1]
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate * 1000 // sample_rate + padding) * 4
    elif layer == 2:
        samples = 1152
        frame_len = 144 * bitrate * 1000 // sample_rate + padding
    else:  # layer 3
        samples = 1152 if version == "1" else 576
        coeff = 144 if version == "1" else 72
        frame_len = coeff * bitrate * 1000 // sample_rate + padding
    if frame_len < 4:
        return None
    return {
        "version": version,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "channels": channels,
        "mode": mode,
        "padding": padding,
        "samples": samples,
        "frame_len": frame_len,
        "offset": pos,
    }


def _id3v2_size(b: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none). Syncsafe size
    per the ID3v2 spec + 10-byte header (+10 footer when flagged)."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    footer = 10 if b[5] & 0x10 else 0
    return 10 + size + footer


def _xing_offset(hdr: dict) -> int:
    """Offset of a Xing/Info VBR tag inside an L3 frame: 4-byte header +
    side info (MPEG-1: 17 mono / 32 stereo; MPEG-2/2.5: 9 / 17)."""
    if hdr["version"] == "1":
        side = 17 if hdr["channels"] == 1 else 32
    else:
        side = 9 if hdr["channels"] == 1 else 17
    return 4 + side


def parse_mpeg_frames(data: bytes) -> dict:
    """Walk every MPEG audio frame in ``data``.

    Returns {frames: [per-frame header dicts], id3v2_bytes, id3v1,
    desync_bytes, truncated, xing}: ``desync_bytes`` counts garbage
    skipped while resyncing (0 for a clean file), ``truncated`` is True
    when the last frame header promises more bytes than remain, and
    ``xing`` is the first frame's Xing/Info tag content when present
    ({tag, n_frames?, n_bytes?}).

    Resync discipline: a candidate header only counts as a frame when
    it is followed by EOF, the ID3v1 trailer, or ANOTHER valid header
    that agrees on (version, layer, sample_rate) — single 0xFFEx byte
    pairs inside payload data otherwise masquerade as frames.
    """
    frames: list[dict] = []
    id3v2 = _id3v2_size(data)
    end = len(data)
    id3v1 = end >= 128 and data[end - 128 : end - 125] == b"TAG"
    if id3v1:
        end -= 128
    pos = id3v2
    desync = 0
    truncated = False
    xing = None
    while pos < end:
        hdr = _parse_header(data, pos)
        ok = False
        if hdr is not None:
            nxt = pos + hdr["frame_len"]
            if nxt >= end:
                ok = True
                truncated = nxt > end
            else:
                peek = _parse_header(data, nxt)
                ok = peek is not None and (
                    peek["version"] == hdr["version"]
                    and peek["layer"] == hdr["layer"]
                    and peek["sample_rate"] == hdr["sample_rate"]
                )
        if not ok:
            pos += 1
            desync += 1
            continue
        if not frames and hdr["layer"] == 3:
            xo = pos + _xing_offset(hdr)
            tag = data[xo : xo + 4]
            if tag in (b"Xing", b"Info"):
                xing = {"tag": tag.decode()}
                flags = int.from_bytes(data[xo + 4 : xo + 8], "big")
                p = xo + 8
                if flags & 1 and p + 4 <= end:
                    xing["n_frames"] = int.from_bytes(data[p : p + 4], "big")
                    p += 4
                if flags & 2 and p + 4 <= end:
                    xing["n_bytes"] = int.from_bytes(data[p : p + 4], "big")
        frames.append(hdr)
        pos += hdr["frame_len"]
    return {
        "frames": frames,
        "id3v2_bytes": id3v2,
        "id3v1": id3v1,
        "desync_bytes": desync,
        "truncated": truncated,
        "xing": xing,
    }


def is_mpeg_audio(data: bytes) -> bool:
    """True when the payload starts (after any ID3v2 tag) with at least
    one validated MPEG audio frame at offset 0 of the audio region."""
    walk = parse_mpeg_frames(data)
    return bool(walk["frames"]) and walk["frames"][0]["offset"] == _id3v2_size(data)


def mpeg_audio_meta(data: bytes) -> dict:
    """Curation-grade metadata for one MPEG audio payload.

    Always returns the full dict; a non-MPEG payload yields n_frames=0
    (filter on that — no exceptions at corpus scale). duration_sec sums
    each frame's samples/sample_rate, so VBR files are exact.
    """
    walk = parse_mpeg_frames(data)
    frames = walk["frames"]
    if not frames:
        return {
            "format": None, "layer": None, "version": None,
            "sample_rate": None, "channels": None, "n_frames": 0,
            "duration_sec": 0.0, "bitrate_kbps_mean": None, "vbr": None,
            "id3v2_bytes": walk["id3v2_bytes"], "id3v1": walk["id3v1"],
            "desync_bytes": walk["desync_bytes"],
            "truncated": walk["truncated"], "xing_frames": None,
        }
    rates = {f["bitrate_kbps"] for f in frames}
    duration = sum(f["samples"] / f["sample_rate"] for f in frames)
    f0 = frames[0]
    return {
        "format": f"mpeg{f0['version']}-layer{f0['layer']}",
        "layer": f0["layer"],
        "version": f0["version"],
        "sample_rate": f0["sample_rate"],
        "channels": f0["channels"],
        "n_frames": len(frames),
        "duration_sec": duration,
        "bitrate_kbps_mean": sum(f["bitrate_kbps"] for f in frames) / len(frames),
        "vbr": len(rates) > 1 or walk["xing"] is not None and walk["xing"]["tag"] == "Xing",
        "id3v2_bytes": walk["id3v2_bytes"],
        "id3v1": walk["id3v1"],
        "desync_bytes": walk["desync_bytes"],
        "truncated": walk["truncated"],
        "xing_frames": (walk["xing"] or {}).get("n_frames"),
    }


def encode_frame_header(
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    padding: int = 0,
) -> bytes:
    """Build one VALID 4-byte frame header (test-fixture constructor —
    the exact inverse of ``_parse_header``; payload bytes are free)."""
    vbits = {v: k for k, v in _VERSIONS.items()}[version]
    lbits = {v: k for k, v in _LAYERS.items()}[layer]
    vgroup = "1" if version == "1" else "2"
    br_idx = _BITRATES[(vgroup, layer)].index(bitrate_kbps) + 1
    sr_idx = _SAMPLE_RATES[version].index(sample_rate)
    mode = 3 if channels == 1 else 0
    h = (0x7FF << 21) | (vbits << 19) | (lbits << 17) | (1 << 16)
    h |= (br_idx << 12) | (sr_idx << 10) | (padding << 9) | (mode << 6)
    return h.to_bytes(4, "big")


def encode_cbr_stream(
    n_frames: int,
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    fill: int = 0,
) -> bytes:
    """A syntactically valid CBR frame sequence with ``fill``-byte
    payloads — fixture constructor for the parser's tests and the
    oracle entry (header grammar only; not decodable audio)."""
    hdr = encode_frame_header(
        version, layer, bitrate_kbps, sample_rate, channels
    )
    probe = _parse_header(hdr + b"\x00" * 8, 0)
    body = bytes([fill & 0xFF]) * (probe["frame_len"] - 4)
    return (hdr + body) * n_frames
