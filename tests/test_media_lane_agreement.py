"""stdlib-vs-native media lane conformance (round 9, VERDICT r8 #5).

The decode gate (multimodal/columns.py::_real_decode) prefers PIL when
importable and otherwise uses this repo's stdlib codecs. This suite is
the AGREEMENT contract between the two lanes: on the same payloads,
dims must be bit-exact and pixels bit-exact for lossless formats
(PNG/GIF/BMP) or PSNR > 40 dB for lossy JPEG (our encoder's output,
their decoder). It runs whenever PIL is present and skips cleanly when
it is not — the gate preference itself stays pinned either way by
tests/test_multimodal.py::test_real_decode_prefers_native.

PIL is absent from this container and cannot be installed (no network,
installs prohibited), so in CI here the suite records SKIPs; any
environment with PIL (the realistic production deployment, where the
native lane actually serves) executes the full agreement matrix. The
stdlib lane's own correctness does not depend on this file — each codec
has bit-exact decode tests against hand-built payloads in
tests/test_{png,gif,bmp,jpeg,avi}.py.
"""

import numpy as np
import pytest

from mindb_spark.multimodal.columns import _native_image_module

PIL_PRESENT = _native_image_module() is not None

pytestmark = pytest.mark.skipif(
    not PIL_PRESENT,
    reason="PIL not installed: native lane absent, stdlib lane is the "
    "only decoder (its own tests pin correctness); agreement matrix "
    "runs wherever PIL exists",
)


def _corpus():
    """Deterministic test images: gradient, random noise, flat color —
    the same shapes the entry corpus uses."""
    rng = np.random.default_rng(42)
    grad = np.stack(
        [np.tile(np.arange(32, dtype=np.uint8) * 8, (24, 1))] * 3, axis=-1
    )
    noise = rng.integers(0, 256, (16, 21, 3), dtype=np.uint8)
    flat = np.full((8, 8, 3), 137, dtype=np.uint8)
    return {"grad": grad, "noise": noise, "flat": flat}


def _pil_decode(payload: bytes) -> np.ndarray:
    import io

    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    return img


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("name", ["grad", "noise", "flat"])
def test_png_lanes_bit_exact(name):
    from mindb_spark.multimodal.png import decode_png, encode_png

    img = _corpus()[name]
    payload = encode_png(img)
    ours, theirs = decode_png(payload), _pil_decode(payload)
    assert ours.shape == theirs.shape
    assert np.array_equal(ours, theirs)


@pytest.mark.parametrize("name", ["grad", "flat"])
def test_gif_lanes_bit_exact(name):
    from mindb_spark.multimodal.gif import decode_gif, encode_gif

    img = _corpus()[name]  # <=256 distinct colors: losslessly GIF-able
    payload = encode_gif(img)
    ours, theirs = decode_gif(payload), _pil_decode(payload)
    assert ours.shape == theirs.shape
    assert np.array_equal(ours, theirs)


@pytest.mark.parametrize("name", ["grad", "noise", "flat"])
def test_bmp_lanes_bit_exact(name):
    from mindb_spark.multimodal.bmp import decode_bmp, encode_bmp

    img = _corpus()[name]
    payload = encode_bmp(img)
    ours, theirs = decode_bmp(payload), _pil_decode(payload)
    assert ours.shape == theirs.shape
    assert np.array_equal(ours, theirs)


@pytest.mark.parametrize("name", ["grad", "noise", "flat"])
def test_jpeg_lanes_agree_psnr(name):
    """Lossy: both decoders read OUR encoder's baseline-JPEG output.
    IDCT/upsampling rounding may differ by a few counts per pixel
    between implementations; PSNR > 40 dB is the agreement bar (and
    dims stay bit-exact)."""
    from mindb_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _corpus()[name]
    payload = encode_jpeg(img, quality=90)
    ours, theirs = decode_jpeg(payload), _pil_decode(payload)
    assert ours.shape == theirs.shape
    assert _psnr(ours, theirs) > 40.0


@pytest.mark.parametrize("name", ["grad", "noise", "flat"])
def test_progressive_jpeg_lanes_agree_psnr(name):
    """Round 10: PROGRESSIVE (SOF2) streams from our encoder read by
    both decoders. Validates the multi-scan spectral-selection +
    successive-approximation bitstream against an independent
    implementation, not just our own decode (which is separately pinned
    bit-equal to the baseline pipeline in tests/test_jpeg.py)."""
    from mindb_spark.multimodal.jpeg import decode_jpeg, encode_jpeg_progressive

    img = _corpus()[name]
    payload = encode_jpeg_progressive(img, quality=90)
    ours, theirs = decode_jpeg(payload), _pil_decode(payload)
    assert ours.shape == theirs.shape
    assert _psnr(ours, theirs) > 40.0


def test_decode_gate_routes_to_native_and_matches_stdlib_features(spark):
    """End-to-end through the Spark operator: with PIL present the gate
    decodes natively; the emitted (height, width, channels, features)
    row must match what the stdlib lane computes for a lossless payload
    (same pixels -> same histogram)."""
    from mindb_spark.multimodal.columns import decode_images
    from mindb_spark.multimodal.png import decode_png, encode_png

    img = _corpus()["noise"]
    df = spark.createDataFrame(
        [(1, encode_png(img))], "doc_id long, content binary"
    )
    row = decode_images(df, fake=False).collect()[0]
    assert (row.height, row.width, row.channels) == img.shape
    ref = decode_png(encode_png(img))
    hist = np.bincount(ref.reshape(-1) >> 5, minlength=8) / ref.size
    assert np.allclose(np.array(row.features), hist, atol=1e-12)
