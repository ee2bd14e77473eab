"""Minimal pure-stdlib WAV (RIFF/WAVE) codec + raw-PCM interpretation.

This container has no audio libraries (soundfile/librosa), but WAV
needs none: the format is a RIFF chunk walk — a ``fmt `` chunk with the
sample layout and a ``data`` chunk of interleaved PCM frames
(spec: the original IBM/Microsoft RIFF WAVE definition, widely
mirrored, e.g. http://soundfile.sapp.org/doc/WaveFormat/). This makes
``decode_audio(fake=False)`` REAL for WAV payloads — true
(sample_rate, channels, n_samples) and sample data — while compressed
formats (MP3/OGG/FLAC) still require an external codec.

Scope (raises ``ValueError``/``NotImplementedError`` outside it):
- format tags 1 (integer PCM: 8-bit unsigned, 16/24/32-bit signed
  little-endian) and 3 (IEEE float32/float64);
- any channel count / sample rate; chunk walk skips unknown chunks
  (LIST/fact/cue) like every real-world reader must.

Samples decode to float64 in [-1, 1], shape (n_samples, channels) —
feature kernels (RMS, zero-crossings) are then dtype-independent.

The RAW interpretation (``decode_raw_pcm``) is the opaque-payload
counterpart: any byte string is readable as headerless unsigned 8-bit
mono PCM (the classic /dev/audio convention). It is not a stub — the
features computed from it are true functions of the payload bytes —
and it gives the decode pipeline a total function over arbitrary
binary columns, which is what a 100 TB pipeline needs when a payload's
codec is unknown or unsupported.
"""

from __future__ import annotations

import struct

import numpy as np

_DEF_RAW_RATE = 8000


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a WAV byte string -> (sample_rate, samples).

    ``samples`` is float64 in [-1, 1] with shape (n_samples, channels).
    """
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, channels, rate, _byterate, _align, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            payload = chunk
    if fmt is None or payload is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    tag, channels, rate, bits = fmt
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(payload, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} unsupported")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"float bit depth {bits} unsupported")
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed) needs an external codec"
        )
    n = len(x) - len(x) % max(1, channels)
    return rate, x[:n].reshape(-1, channels)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] (n, channels) as 16-bit PCM WAV."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if s.shape[0] == 1 and s.ndim == 2 and samples.ndim == 1:
        s = s.T
    channels = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_raw_pcm(data: bytes, sample_rate: int = _DEF_RAW_RATE) -> tuple[int, np.ndarray]:
    """Interpret arbitrary bytes as headerless unsigned 8-bit mono PCM."""
    x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    return sample_rate, ((x - 128.0) / 128.0).reshape(-1, 1)


def audio_features(samples: np.ndarray) -> tuple[float, float, float]:
    """(rms, zero_crossing_rate, peak) of a (n, channels) sample block.

    Channel-mean signal; zcr counts strict sign changes / (n - 1)."""
    if samples.size == 0:
        return 0.0, 0.0, 0.0
    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    if mono.size < 2:
        return rms, 0.0, peak
    sgn = np.signbit(mono)
    zcr = float(np.count_nonzero(sgn[1:] != sgn[:-1])) / (mono.size - 1)
    return rms, zcr, peak


def resample_linear(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample of (n, channels) to ``rate_out``.

    Output length is round(n * rate_out / rate_in); endpoints map to
    endpoints (np.interp over the sample-time grid, per channel)."""
    n = samples.shape[0]
    if n == 0 or rate_in == rate_out:
        return samples.copy()
    m = max(1, int(round(n * rate_out / rate_in)))
    t_in = np.arange(n, dtype=np.float64) / rate_in
    t_out = np.arange(m, dtype=np.float64) / rate_out
    return np.stack(
        [np.interp(t_out, t_in, samples[:, c]) for c in range(samples.shape[1])],
        axis=1,
    )
