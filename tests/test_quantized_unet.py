"""Int8 post-training quantized UNet inference (zoo/quantized_unet.py).

Fidelity is judged against the f32 ``model.apply`` forward the
quantization is calibrated from; the tolerance encodes expected int8 PTQ
error (a few percent relative RMS), and the TRAINED-model quality deltas
live in benchmarks/RESULTS.md.  The torch reference has no quantized path
(TPU-native extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel
from pytorch_toolbelt_tpu.zoo.quantized_unet import (
    _q_upsample,
    _q_upsample_matrices,
    quantize_unet_inference,
)


def _rel_rms(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return float(np.sqrt(((got - want) ** 2).mean()) / np.sqrt((want**2).mean()))


def test_quantized_matches_f32_within_ptq_tolerance():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    rng = np.random.default_rng(1)
    cal = jnp.asarray(rng.random((2, 128, 128, 3)), jnp.float32)
    x = jnp.asarray(rng.random((2, 128, 128, 3)), jnp.float32)

    want = model.apply(variables, x)
    got = quantize_unet_inference(model, variables, cal)(x)
    assert got.dtype == jnp.float32
    assert _rel_rms(got, want) < 0.06  # int8 PTQ: a few percent


def test_quantized_deterministic_and_finite():
    model = UNetSegmentationModel(num_classes=3, encoder_channels=16, num_layers=3)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(2)
    cal = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    fwd = quantize_unet_inference(model, variables, cal)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    a, b = fwd(x), fwd(x)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # integer math: bit-exact


def test_q_upsample_matches_float_bilinear():
    """Int8 interpolation einsums track the float bilinear (align_corners)
    within interpolation-weight quantization error (~1%)."""
    rng = np.random.default_rng(3)
    x = rng.integers(-127, 127, (1, 8, 8, 4))
    mh, mw, mult = _q_upsample_matrices(8, 8, 16, 16)
    got = np.asarray(_q_upsample(jnp.asarray(x, jnp.int8), mh, mw), np.float64) * mult

    from pytorch_toolbelt_tpu.nn.functional import resize_bilinear

    want = np.asarray(resize_bilinear(jnp.asarray(x, jnp.float32), (16, 16), align_corners=True))
    assert _rel_rms(got, want) < 0.02


def test_quantized_inference_size_decoupled_from_calibration():
    """The quantized upsample matrices are built per trace from jit-static
    shapes, so one calibrated network serves any inference size."""
    model = UNetSegmentationModel(num_classes=2, encoder_channels=16, num_layers=3)
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(5)
    cal = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    fwd = quantize_unet_inference(model, variables, cal)
    for size in (32, 128):
        x = jnp.asarray(rng.random((1, size, size, 3)), jnp.float32)
        got = fwd(x)
        assert got.shape == (1, size, size, 2)
        assert _rel_rms(got, model.apply(variables, x)) < 0.06


def test_quantized_output_name_and_rejects_unsupported():
    model = UNetSegmentationModel(
        num_classes=1, encoder_channels=16, num_layers=3, output_name="mask"
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cal = jnp.zeros((1, 64, 64, 3), jnp.float32) + 0.5
    out = quantize_unet_inference(model, variables, cal)(cal)
    assert set(out.keys()) == {"mask"}

    bad = UNetSegmentationModel(num_classes=1, activation="silu")
    with pytest.raises(NotImplementedError):
        quantize_unet_inference(bad, {"params": {}, "batch_stats": {}}, cal)


def test_quantized_s2d_matches_f32_within_ptq_tolerance():
    """The s2d int8 variant must approximate the f32 model as well as the
    NHWC int8 network (same calibration, same quantization rules — only
    the stride-1 level's representation differs)."""
    from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference_s2d

    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    rng = np.random.RandomState(0)
    x_cal = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x_cal)

    q = quantize_unet_inference(model, variables, x_cal)
    q_s2d = quantize_unet_inference_s2d(model, variables, x_cal)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    want = model.apply(variables, x)
    got_nhwc = q(x)
    got_s2d = q_s2d(x)
    assert got_s2d.shape == want.shape
    assert _rel_rms(got_s2d, want) < 0.08
    # the two int8 networks share calibration: they must agree closely
    assert _rel_rms(got_s2d, got_nhwc) < 0.08


def test_quantized_s2d_other_sizes_and_layers():
    from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference_s2d

    model = UNetSegmentationModel(num_classes=3, encoder_channels=16, num_layers=3)
    rng = np.random.RandomState(1)
    x_cal = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x_cal)
    q_s2d = quantize_unet_inference_s2d(model, variables, x_cal)
    x = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    got = q_s2d(x)
    want = model.apply(variables, x)
    assert got.shape == want.shape == (1, 96, 96, 3)
    assert _rel_rms(got, want) < 0.08
