"""Minimal pure-stdlib AVI (RIFF) container reader/writer for MJPEG.

With baseline JPEG decoded natively (jpeg.py), a real VIDEO format
needs only container parsing: AVI is RIFF chunk walking (the same
framing wav.py's RIFF audio uses), and Motion-JPEG stores each frame
as an independent baseline JPEG in a ``00dc`` chunk. This makes
``sample_frames(fake=False)`` a true video frame sampler with no media
library.

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- read: RIFF/AVI chunk walk (nested LISTs, even-byte padding), frames
  of the FIRST video stream (``00dc``/``00db`` chunks), MJPG/JPEG
  payloads decoded via ``jpeg.decode_jpeg`` (frames that omit DHT use
  the Annex K defaults per the OpenDML 'AVI1' convention). Other
  codecs raise ``NotImplementedError``.
- write: single-stream MJPEG AVI (avih + strl/strh/strf + movi + idx1)
  from uint8 RGB frames — enough for fixtures and round-trips, not a
  general muxer.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def read_avi_frames(data: bytes, max_frames: int | None = None) -> list[bytes]:
    """Walk the RIFF tree and return the raw per-frame payloads (JPEG
    byte strings for MJPEG) of the first video stream, in file order."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF signature)")
    frames: list[bytes] = []
    compression = None
    # stream headers appear in declaration order; the Nth strh owns the
    # NNdc/NNdb chunk prefix. Track which stream is the first 'vids' one
    # (an audio-first AVI puts video at 01) and read biCompression from
    # THAT stream's strf, not whichever strf comes first (an audio strf
    # is a WAVEFORMATEX whose bytes would be misread as a codec fourcc).
    n_strh = 0
    video_stream = None  # int index of the first vids stream
    want_video_strf = False

    def walk(pos: int, end: int):
        nonlocal compression, n_strh, video_stream, want_video_strf
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc in (b"RIFF", b"LIST"):
                walk(body_start + 4, body_end)  # skip the list-type fourcc
            elif fourcc == b"strh" and size >= 4:
                if data[body_start : body_start + 4] == b"vids" and video_stream is None:
                    video_stream = n_strh
                    want_video_strf = True
                n_strh += 1
            elif fourcc == b"strf" and want_video_strf and size >= 40:
                # the video stream's format chunk: BITMAPINFOHEADER.biCompression
                compression = data[body_start + 16 : body_start + 20]
                want_video_strf = False
            elif (
                fourcc[2:4] in (b"dc", b"db")
                and fourcc[:2] == (b"%02d" % video_stream if video_stream is not None else b"00")
            ):
                if max_frames is None or len(frames) < max_frames:
                    frames.append(data[body_start:body_end])
            pos = body_start + size + (size & 1)  # even-byte padding

    walk(0, len(data))
    if compression is not None and compression not in (
        b"MJPG", b"mjpg", b"JPEG", b"AVI1", b"\x00\x00\x00\x00"
    ):
        raise NotImplementedError(
            f"AVI codec {compression!r} not supported (MJPEG only)"
        )
    return frames


def decode_avi_frames(
    data: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Decode the MJPEG frames of an AVI to (h, w, 3) uint8 RGB arrays."""
    from mindb_spark.multimodal.jpeg import decode_jpeg, is_jpeg

    out = []
    for payload in read_avi_frames(data, max_frames=max_frames):
        if not is_jpeg(payload):
            raise NotImplementedError(
                "AVI frame is not a JPEG payload (MJPEG only)"
            )
        img = decode_jpeg(payload)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        out.append(img)
    if not out:
        raise ValueError("AVI contains no video frames")
    return out


def encode_avi_mjpeg(
    frames, fps: int = 10, quality: int = 90, subsample: str = "420"
) -> bytes:
    """Mux uint8 RGB frames (equal dims) into a single-stream MJPEG AVI."""
    from mindb_spark.multimodal.jpeg import encode_jpeg

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all AVI frames must share dimensions")
    payloads = [encode_jpeg(f, quality=quality, subsample=subsample) for f in frames]
    max_size = max(len(p) for p in payloads)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,        # microseconds per frame
        max_size * fps,          # max bytes per second (upper bound)
        0,                       # padding granularity
        0x10,                    # AVIF_HASINDEX
        len(frames), 0, 1,       # total frames, initial frames, streams
        max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0, 0,          # flags, priority, language, initial frames
            1, fps,              # scale, rate -> fps frames/sec
            0, len(frames),      # start, length
            max_size, 10000, 0,  # suggested buffer, quality, sample size
            0, 0,                # rcFrame left, top
            w, h,                # rcFrame right, bottom
        )
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_chunks = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_chunks)

    # idx1: offsets are relative to the 'movi' list-type fourcc
    idx_entries = []
    off = 4
    for p in payloads:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
