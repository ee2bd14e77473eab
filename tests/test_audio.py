"""Audio codec + DataFrame ops: real WAV parsing with no audio library.

The stdlib RIFF/WAVE parser (multimodal/audio.py) is exercised on
synthesized fixtures across PCM widths; the DataFrame ops are checked
for real decode on WAV payloads and the total raw-PCM fallback on
arbitrary bytes.
"""

import struct

import numpy as np
import pytest

from mindb_spark.multimodal import decode_audio, resample_audio
from mindb_spark.multimodal.audio import (
    audio_features,
    decode_raw_pcm,
    decode_wav,
    encode_wav,
    is_wav,
    resample_linear,
)


def _sine(n, rate, freq, amp=0.5, channels=1):
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    return np.stack([x] * channels, axis=1)


def test_wav_roundtrip_16bit_stereo():
    rate, n = 16000, 1600
    s = _sine(n, rate, 440.0, channels=2)
    payload = encode_wav(s, rate)
    assert is_wav(payload)
    got_rate, got = decode_wav(payload)
    assert got_rate == rate and got.shape == (n, 2)
    # 16-bit quantization: within one LSB
    assert np.max(np.abs(got - s)) < 1.0 / 32767 + 1e-9


def _wav_bytes(fmt_tag, channels, rate, bits, payload):
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_8bit_24bit_float32():
    # 8-bit unsigned: 128 -> 0.0, 255 -> ~1.0, 0 -> -1.0
    rate = 8000
    w8 = _wav_bytes(1, 1, rate, 8, bytes([128, 255, 0]))
    r, s = decode_wav(w8)
    assert r == rate
    np.testing.assert_allclose(s[:, 0], [0.0, 127 / 128, -1.0])
    # 24-bit signed little-endian: max positive / min negative
    pos = (1 << 23) - 1
    neg = -(1 << 23)
    raw24 = struct.pack("<i", pos)[:3] + struct.pack("<i", neg)[:3]
    r, s = decode_wav(_wav_bytes(1, 1, rate, 24, raw24))
    np.testing.assert_allclose(s[:, 0], [pos / (1 << 23), -1.0])
    # float32 passthrough
    xs = np.array([0.25, -0.75], dtype="<f4")
    r, s = decode_wav(_wav_bytes(3, 1, rate, 32, xs.tobytes()))
    np.testing.assert_allclose(s[:, 0], xs, rtol=1e-6)


def test_wav_skips_unknown_chunks_and_rejects_compressed():
    rate = 8000
    xs = np.array([0.5, -0.5], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    junk = b"LIST" + struct.pack("<I", 5) + b"xxxxx" + b"\x00"  # odd len + pad
    body = (
        b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 8) + xs.tobytes()
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    r, s = decode_wav(payload)
    np.testing.assert_allclose(s[:, 0], xs, rtol=1e-6)
    mp3ish = _wav_bytes(85, 1, rate, 16, b"\x00\x00")  # tag 85 = MP3-in-WAV
    with pytest.raises(NotImplementedError):
        decode_wav(mp3ish)


def test_audio_features_and_resample():
    # alternating +/-: zcr = 1, rms = amp, peak = amp
    x = np.tile([0.5, -0.5], 50).reshape(-1, 1)
    rms, zcr, peak = audio_features(x)
    assert abs(rms - 0.5) < 1e-12 and zcr == 1.0 and peak == 0.5
    # linear resample: halving the rate halves the length; endpoints map
    s = _sine(1000, 16000, 100.0)
    out = resample_linear(s, 16000, 8000)
    assert out.shape == (500, 1)
    assert abs(out[0, 0] - s[0, 0]) < 1e-12
    # identity when rates match
    same = resample_linear(s, 16000, 16000)
    np.testing.assert_array_equal(same, s)


def test_decode_audio_real_wav_and_raw_fallback(spark):
    rate, n = 16000, 3200
    s = _sine(n, rate, 440.0, amp=0.5)
    wav = encode_wav(s, rate)
    raw = b"plain bytes payload!"
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(raw))], "doc_id long, content binary"
    )
    got = {r.doc_id: r for r in decode_audio(df).collect()}
    w = got[1]
    assert (w.sample_rate, w.channels, w.n_samples) == (rate, 1, n)
    assert abs(w.duration_sec - n / rate) < 1e-9
    # sine RMS = amp/sqrt(2); 16-bit quantization keeps it within 1e-4
    assert abs(w.rms - 0.5 / np.sqrt(2)) < 1e-4
    assert abs(w.peak - 0.5) < 1e-3
    r2 = got[2]
    assert (r2.sample_rate, r2.channels, r2.n_samples) == (8000, 1, len(raw))
    exp_rms, exp_zcr, exp_peak = audio_features(decode_raw_pcm(raw)[1])
    assert abs(r2.rms - exp_rms) < 1e-12 and abs(r2.zcr - exp_zcr) < 1e-12

    strict = decode_audio(df.where("doc_id = 2"), raw_fallback=False)
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="external codec"):
        strict.collect()


def test_resample_audio_dataframe(spark):
    rate, n = 16000, 1600
    s = _sine(n, rate, 200.0)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(s, rate)))], "doc_id long, content binary"
    )
    out = resample_audio(df, target_rate=8000).collect()
    assert len(out) == 1
    row = out[0]
    assert row.sample_rate == 8000 and row.n_samples == n // 2
    # the emitted content is itself a decodable WAV at the target rate
    got_rate, got = decode_wav(bytes(row.content))
    assert got_rate == 8000 and got.shape == (n // 2, 1)
    ref = resample_linear(s, rate, 8000)
    assert np.max(np.abs(got - ref)) < 2.0 / 32767
