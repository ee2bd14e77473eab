"""FLAC, OGG/Vorbis and MP4 (ISO-BMFF) CONTAINER-level parsing, stdlib.

Round-11 extension of the frame-grammar curation lane
(``multimodal/mpegaudio.py``): the remaining named media gaps — "OGG"
audio and "non-MJPEG video" — are, at the curation level, container
walks over public specs:

- FLAC: the ``fLaC`` marker + METADATA_BLOCK chain; STREAMINFO (block
  type 0, 34 bytes) carries sample rate / channels / bit depth / total
  samples / PCM md5 exactly (the format's own spec, xiph.org).
- OGG: a page walk (``OggS`` capture pattern, 27-byte header + segment
  table); a Vorbis stream's first packet is the identification header
  (``\\x01vorbis`` + version/channels/rate), and the LAST page's granule
  position IS the total PCM sample count — exact duration with no
  packet decode.
- MP4/ISO-BMFF: a box walk; ``mvhd`` carries timescale + duration,
  ``tkhd`` the track dims, ``stsd`` the codec fourcc, ``hdlr`` the
  track kind. Everything a video-curation filter needs (duration,
  resolution, codec, track inventory) without touching a single coded
  frame.

Same contract as the MPEG walker: TOTAL functions — garbage yields an
empty/zero result to filter on, never an exception — and PCM/pixel
decode of these codecs stays env-gated (no reference decoder in this
container to certify against; the media bar is bit-exact proof or an
explicit gate).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------- FLAC


def is_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


def flac_streaminfo(data: bytes) -> dict | None:
    """Parse the STREAMINFO block of a FLAC payload; None if not FLAC or
    the block is missing/short. Fields per the FLAC format spec."""
    if not is_flac(data):
        return None
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        last, btype = bool(hdr & 0x80), hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                return None
            min_bs, max_bs = struct.unpack(">HH", body[0:4])
            min_fs = int.from_bytes(body[4:7], "big")
            max_fs = int.from_bytes(body[7:10], "big")
            packed = int.from_bytes(body[10:18], "big")  # 64 bits
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits_per_sample = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
            return {
                "min_block": min_bs, "max_block": max_bs,
                "min_frame": min_fs, "max_frame": max_fs,
                "sample_rate": sample_rate, "channels": channels,
                "bits_per_sample": bits_per_sample,
                "total_samples": total_samples,
                "duration_sec": (
                    total_samples / sample_rate if sample_rate else 0.0
                ),
                "pcm_md5": body[18:34].hex(),
            }
        pos += 4 + length
        if last:
            break
    return None


def encode_flac_streaminfo(
    sample_rate: int = 44100,
    channels: int = 2,
    bits_per_sample: int = 16,
    total_samples: int = 44100,
    pcm_md5: bytes = b"\x00" * 16,
) -> bytes:
    """Fixture constructor: a minimal valid FLAC header (marker + one
    last-flagged STREAMINFO block) — the exact inverse of the parser."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body = (
        struct.pack(">HH", 4096, 4096)
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + pcm_md5
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


# ---------------------------------------------------------------------- OGG


def is_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS"


def ogg_vorbis_meta(data: bytes) -> dict | None:
    """Walk OGG pages; return stream metadata for the first Vorbis
    logical stream. Duration is exact: the final granule position of the
    stream is its total PCM sample count (Vorbis mapping spec). Returns
    None for non-OGG payloads; an OGG without a Vorbis stream yields
    {"format": "ogg", ...} with null audio fields."""
    if not is_ogg(data):
        return None
    pos = 0
    n_pages = 0
    desync = 0
    vorbis_serial = None
    sample_rate = None
    channels = None
    last_granule = 0
    truncated = False
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            pos += 1
            desync += 1
            continue
        granule = int.from_bytes(
            data[pos + 6 : pos + 14], "little", signed=True
        )
        serial = int.from_bytes(data[pos + 14 : pos + 18], "little")
        nseg = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nseg]
        if len(seg_table) < nseg:
            truncated = True
            break
        body_len = sum(seg_table)
        body = data[pos + 27 + nseg : pos + 27 + nseg + body_len]
        if len(body) < body_len:
            truncated = True
            # count the partial page; its granule may still be valid
        n_pages += 1
        if vorbis_serial is None and body[:7] == b"\x01vorbis":
            # identification header: version(4) channels(1) rate(4 LE)
            if len(body) >= 16:
                vorbis_serial = serial
                channels = body[11]
                sample_rate = int.from_bytes(body[12:16], "little")
        if serial == vorbis_serial and granule >= 0:
            last_granule = max(last_granule, granule)
        pos += 27 + nseg + body_len
    return {
        "format": "ogg-vorbis" if vorbis_serial is not None else "ogg",
        "sample_rate": sample_rate,
        "channels": channels,
        "n_pages": n_pages,
        "total_samples": last_granule if vorbis_serial is not None else 0,
        "duration_sec": (
            last_granule / sample_rate
            if vorbis_serial is not None and sample_rate
            else 0.0
        ),
        "desync_bytes": desync,
        "truncated": truncated,
    }


def _ogg_page(
    serial: int, seq: int, granule: int, body: bytes, header_type: int = 0
) -> bytes:
    """One OGG page (CRC left zero — the walker does not verify CRCs, a
    deliberate curation-lane choice: a flipped bit should not hide the
    whole file's metadata)."""
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (
        b"OggS" + bytes([0, header_type])
        + granule.to_bytes(8, "little", signed=True)
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + bytes([len(segs)]) + bytes(segs) + body
    )


def encode_ogg_vorbis(
    sample_rate: int = 44100,
    channels: int = 2,
    total_samples: int = 44100,
    n_audio_pages: int = 3,
    serial: int = 0x1234,
) -> bytes:
    """Fixture constructor: an identification-header page followed by
    ``n_audio_pages`` audio pages whose final granule is
    ``total_samples`` (header grammar only — bodies are not decodable
    Vorbis packets)."""
    ident = (
        b"\x01vorbis" + (0).to_bytes(4, "little")
        + bytes([channels]) + sample_rate.to_bytes(4, "little")
        + (0).to_bytes(12, "little") + bytes([0xB8, 0x01])
    )
    out = [_ogg_page(serial, 0, 0, ident, header_type=2)]
    for i in range(n_audio_pages):
        granule = total_samples * (i + 1) // n_audio_pages
        out.append(_ogg_page(serial, i + 1, granule, b"\x00" * 64))
    return b"".join(out)


# --------------------------------------------------------------- JPEG dims


def jpeg_dimensions(data: bytes) -> tuple[int, int] | None:
    """(height, width) from a JPEG's SOF marker — a marker walk only, no
    entropy decode (the curation lane needs dims, not pixels)."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 <= len(data):
                h = int.from_bytes(data[pos + 5 : pos + 7], "big")
                w = int.from_bytes(data[pos + 7 : pos + 9], "big")
                return h, w
            return None
        if marker == 0xDA:  # start of scan: no SOF seen before it
            return None
        pos += 2 + seg_len
    return None


# ---------------------------------------------------------------- MP4/BMFF


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end).
    Tolerates 64-bit largesize boxes; stops cleanly on a short/invalid
    size (reported by the caller as truncation)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < 8 or pos + size > end:
            yield (b"!trunc", pos, end)
            return
        yield (fourcc, body, pos + size)
        pos += size


def mp4_meta(data: bytes) -> dict | None:
    """Container metadata for an ISO-BMFF (MP4/MOV) payload: brand,
    movie duration (mvhd timescale-normalized), per-track kind
    (hdlr: vide/soun), dims (tkhd) and sample-entry codec fourcc
    (stsd). None for non-MP4 payloads."""
    if not is_mp4(data):
        return None
    out = {
        "format": "mp4",
        "brand": data[8:12].decode("ascii", "replace"),
        "duration_sec": 0.0,
        "n_tracks": 0,
        "tracks": [],
        "truncated": False,
    }

    def parse_moov(b0: int, b1: int):
        for cc, s, e in _walk_boxes(data, b0, b1):
            if cc == b"!trunc":
                out["truncated"] = True
            elif cc == b"mvhd":
                # TOTAL-function guard: an empty/short box body (s == e,
                # possibly at EOF) must mark truncation, not IndexError.
                ver = data[s] if s < e else None
                if ver == 1 and s + 32 <= e:
                    ts = int.from_bytes(data[s + 20 : s + 24], "big")
                    dur = int.from_bytes(data[s + 24 : s + 32], "big")
                elif ver == 0 and s + 20 <= e:
                    ts = int.from_bytes(data[s + 12 : s + 16], "big")
                    dur = int.from_bytes(data[s + 16 : s + 20], "big")
                else:
                    out["truncated"] = True
                    continue
                out["duration_sec"] = dur / ts if ts else 0.0
            elif cc == b"trak":
                trk = {"kind": None, "width": None, "height": None,
                       "codec": None, "n_samples": None, "fps": None,
                       "bitrate_kbps": None}
                parse_trak(s, e, trk)
                # derived per-track rates from the sample tables (round
                # 12, VERDICT r11 #7): pure box arithmetic — frame count
                # from stsz (stts as fallback), media seconds from
                # mdhd's clock (stts tick sum as fallback), payload
                # bytes from stsz
                n = trk["n_samples"] or trk.get("stts_samples")
                ts_m = trk.get("media_timescale")
                dur_m = trk.get("media_duration") or trk.get("stts_ticks")
                if n and ts_m and dur_m:
                    sec = dur_m / ts_m
                    trk["n_samples"] = n
                    trk["fps"] = n / sec
                    if trk.get("sample_bytes"):
                        trk["bitrate_kbps"] = (
                            trk["sample_bytes"] * 8 / sec / 1000
                        )
                out["tracks"].append(trk)
                out["n_tracks"] += 1

    def parse_trak(b0: int, b1: int, trk: dict):
        for cc, s, e in _walk_boxes(data, b0, b1):
            if cc == b"tkhd":
                # TOTAL-function guard: empty body → truncated, not a raise.
                if e - s < 8:
                    out["truncated"] = True
                    continue
                # width/height are 16.16 fixed point at the box tail
                w = int.from_bytes(data[e - 8 : e - 4], "big") >> 16
                h = int.from_bytes(data[e - 4 : e], "big") >> 16
                trk["width"], trk["height"] = w or None, h or None
            elif cc in (b"mdia", b"minf", b"stbl"):
                parse_trak(s, e, trk)
            elif cc == b"hdlr":
                if e - s < 12:
                    out["truncated"] = True
                    continue
                kind = data[s + 8 : s + 12]
                trk["kind"] = {
                    b"vide": "video", b"soun": "audio"
                }.get(kind, kind.decode("ascii", "replace"))
            elif cc == b"stsd":
                # version/flags(4) entry_count(4) then first sample entry
                if e - s >= 16:
                    trk["codec"] = data[s + 12 : s + 16].decode(
                        "ascii", "replace"
                    )
            elif cc == b"mdhd":
                # per-track media clock (needed for fps/bitrate): v0
                # ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4);
                # v1 widens the times to 8 bytes
                ver = data[s] if s < e else None
                if ver == 1 and s + 32 <= e:
                    trk["media_timescale"] = int.from_bytes(
                        data[s + 20 : s + 24], "big")
                    trk["media_duration"] = int.from_bytes(
                        data[s + 24 : s + 32], "big")
                elif ver == 0 and s + 20 <= e:
                    trk["media_timescale"] = int.from_bytes(
                        data[s + 12 : s + 16], "big")
                    trk["media_duration"] = int.from_bytes(
                        data[s + 16 : s + 20], "big")
                else:
                    out["truncated"] = True
            elif cc == b"stts":
                # time-to-sample: entry_count x (sample_count, delta) —
                # sample count + total media ticks by pure box arithmetic
                if e - s < 8:
                    out["truncated"] = True
                    continue
                n_ent = int.from_bytes(data[s + 4 : s + 8], "big")
                total = ticks = 0
                p, ok = s + 8, True
                for _ in range(n_ent):
                    if p + 8 > e:
                        out["truncated"] = True
                        ok = False
                        break
                    cnt = int.from_bytes(data[p : p + 4], "big")
                    total += cnt
                    ticks += cnt * int.from_bytes(data[p + 4 : p + 8], "big")
                    p += 8
                if ok:
                    trk["stts_samples"] = total
                    trk["stts_ticks"] = ticks
            elif cc == b"stsz":
                # sample sizes: fixed sample_size or per-sample table —
                # sample count + total payload bytes
                if e - s < 12:
                    out["truncated"] = True
                    continue
                fixed = int.from_bytes(data[s + 4 : s + 8], "big")
                cnt = int.from_bytes(data[s + 8 : s + 12], "big")
                trk["n_samples"] = cnt
                if fixed:
                    trk["sample_bytes"] = fixed * cnt
                elif s + 12 + 4 * cnt <= e:
                    trk["sample_bytes"] = sum(
                        int.from_bytes(data[p : p + 4], "big")
                        for p in range(s + 12, s + 12 + 4 * cnt, 4)
                    )
                else:
                    out["truncated"] = True
            elif cc == b"stco":
                if e - s >= 8:
                    trk["n_chunks"] = int.from_bytes(data[s + 4 : s + 8], "big")
                else:
                    out["truncated"] = True
            elif cc == b"!trunc":
                out["truncated"] = True

    for cc, s, e in _walk_boxes(data, 0, len(data)):
        if cc == b"moov":
            parse_moov(s, e)
        elif cc == b"!trunc":
            out["truncated"] = True
    return out


def _box(fourcc: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + fourcc + body


def encode_mp4_skeleton(
    duration_sec: float = 2.0,
    timescale: int = 1000,
    width: int = 640,
    height: int = 360,
    video_codec: bytes = b"avc1",
    with_audio: bool = True,
    n_samples: int = 0,
    sample_size: int = 1000,
    media_timescale: int = 600,
) -> bytes:
    """Fixture constructor: a structurally valid MP4 metadata skeleton
    (ftyp + moov with mvhd and video/audio traks; no mdat frames).

    With ``n_samples > 0`` the video trak additionally carries real
    sample tables (round 12, VERDICT r11 #7): mdhd (media clock at
    ``media_timescale``), one-entry stts (uniform deltas summing to the
    media duration), fixed-size stsz (``n_samples`` x ``sample_size``
    bytes) and a one-chunk stco — enough for ``mp4_meta`` to derive
    frame count, fps and bitrate by pure box arithmetic."""
    dur = int(round(duration_sec * timescale))
    mvhd = bytes(4) + bytes(8) + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big") + bytes(80)
    def trak(kind: bytes, codec: bytes, w: int, h: int) -> bytes:
        tkhd = bytes(4) + bytes(72) + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
        hdlr = bytes(8) + kind + bytes(12)
        stsd = bytes(4) + (1).to_bytes(4, "big") + _box(codec, bytes(70))
        stbl = _box(b"stsd", stsd)
        mdia = b""
        if kind == b"vide" and n_samples > 0:
            mdur = int(round(duration_sec * media_timescale))
            delta, rem = divmod(mdur, n_samples)
            # two stts entries when deltas don't divide evenly, so the
            # tick sum is EXACTLY the mdhd duration (parser sums entries)
            entries = [(n_samples - rem, delta)] + ([(rem, delta + 1)] if rem else [])
            stts = bytes(4) + len(entries).to_bytes(4, "big") + b"".join(
                c.to_bytes(4, "big") + d.to_bytes(4, "big") for c, d in entries
            )
            stsz = bytes(4) + sample_size.to_bytes(4, "big") + n_samples.to_bytes(4, "big")
            stco = bytes(4) + (1).to_bytes(4, "big") + (0).to_bytes(4, "big")
            stbl += _box(b"stts", stts) + _box(b"stsz", stsz) + _box(b"stco", stco)
            mdhd = bytes(4) + bytes(8) + media_timescale.to_bytes(4, "big") + mdur.to_bytes(4, "big") + bytes(4)
            mdia += _box(b"mdhd", mdhd)
        minf = _box(b"stbl", stbl)
        mdia += _box(b"hdlr", hdlr) + _box(b"minf", minf)
        return _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))
    moov = _box(b"mvhd", mvhd) + trak(b"vide", video_codec, width, height)
    if with_audio:
        moov += trak(b"soun", b"mp4a", 0, 0)
    return _box(b"ftyp", b"isom" + bytes(8)) + _box(b"moov", moov)
