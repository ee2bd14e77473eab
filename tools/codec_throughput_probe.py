"""Single-core decode-throughput probe for the stdlib multimodal codecs.

At 100 TB of media the per-task cost is decode MB/s/core — the Arrow
plumbing around the codecs is O(bytes) and shuffle-free, so the codec
kernel IS the pipeline's throughput ceiling. This probe times each
decoder on representative payloads (photo-like content, not flat color,
so entropy data dominates like real media) and prints one JSON line:

    {"jpeg_420_mbps": ..., "png_mbps": ..., ...}

Baselines and the judge's bar live in PERF_NOTES.md (round 6: JPEG was
the flagged hot loop — per-byte Python bit reader).

Usage: python tools/codec_throughput_probe.py [side_px] [reps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _photo(h: int, w: int, seed: int = 7) -> np.ndarray:
    """Photo-like RGB: smooth gradients + texture noise — mid-entropy
    content whose compressed size/pixel matches real photographs better
    than flat color (too fast) or white noise (too slow)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            128 + 80 * np.sin(yy / 37.0) + 40 * np.cos(xx / 23.0),
            128 + 70 * np.cos((yy + xx) / 41.0),
            128 + 60 * np.sin(xx / 29.0) - 30 * np.cos(yy / 31.0),
        ],
        axis=-1,
    )
    tex = rng.normal(0, 12, size=(h, w, 3))
    return np.clip(base + tex, 0, 255).astype(np.uint8)


def _time(fn, payload: bytes, reps: int) -> float:
    """Decode MB/s over `reps` runs (median-of-3 batches)."""
    fn(payload)  # warm (table caches, numpy JIT-ish paths)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn(payload)
        dt = time.perf_counter() - t0
        rates.append(len(payload) * reps / dt / 1e6)
    return round(sorted(rates)[1], 2)


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from mindb_spark.multimodal import audio as au
    from mindb_spark.multimodal import avi as av
    from mindb_spark.multimodal import bmp as bm
    from mindb_spark.multimodal import gif as gf
    from mindb_spark.multimodal import jpeg as jp
    from mindb_spark.multimodal import png as pn

    img = _photo(side, side)
    out: dict[str, float] = {"side_px": side, "reps": reps}

    j420 = jp.encode_jpeg(img, quality=85, subsample="420")
    j444 = jp.encode_jpeg(img, quality=85, subsample="444")
    out["jpeg_bytes_420"] = len(j420)
    out["jpeg_420_mbps"] = _time(jp.decode_jpeg, j420, reps)
    out["jpeg_444_mbps"] = _time(jp.decode_jpeg, j444, reps)

    png_b = pn.encode_png(img)
    out["png_mbps"] = _time(pn.decode_png, png_b, reps)

    bmp_b = bm.encode_bmp(img)
    out["bmp_mbps"] = _time(bm.decode_bmp, bmp_b, max(reps, 10))

    # GIF: palette content (GIF is 8-bit indexed); quantize the photo to a
    # <=216-color websafe cube so the encoder's palette fit accepts it
    gif_img = (img // 51 * 51).astype(np.uint8)
    gif_b = gf.encode_gif(gif_img)
    out["gif_mbps"] = _time(lambda d: gf.decode_gif_frames(d), gif_b, reps)

    wav_b = au.encode_wav(
        (np.sin(np.arange(side * side) / 17.0) * 20000).astype(np.int16), 16000
    )
    out["wav_mbps"] = _time(lambda d: au.decode_wav(d), wav_b, max(reps, 10))

    avi_b = av.encode_avi_mjpeg([_photo(side, side, s) for s in range(4)], fps=5)
    out["avi_mjpeg_mbps"] = _time(
        lambda d: av.decode_avi_frames(d), avi_b, max(1, reps // 2)
    )

    # native-decoder lane: the decode gate (multimodal/columns.py
    # _native_image_module) prefers PIL whenever importable — measure it
    # in the SAME harness on the same payloads so the stdlib-vs-native
    # ratio is on record (absent in this container: record null so the
    # artifact says "unmeasured", not "equal")
    from mindb_spark.multimodal.columns import _native_image_module

    Image = _native_image_module()
    if Image is not None:
        import io

        def _pil(payload: bytes):
            np.asarray(Image.open(io.BytesIO(payload)))

        out["pil_jpeg_420_mbps"] = _time(_pil, j420, max(reps, 20))
        out["pil_png_mbps"] = _time(_pil, png_b, max(reps, 20))
        out["pil_gif_mbps"] = _time(_pil, gif_b, max(reps, 20))
    else:
        out["pil_jpeg_420_mbps"] = None
        out["pil_note"] = "PIL not installed: stdlib floor is the measured ceiling"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
