"""Numerics of the Pallas implicit-GEMM conv kernel and the fused HCW
UNet inference path (ops/conv_kernels.py + zoo/fast_unet.py).

Reference semantics: flax nn.Conv 3x3 SAME / torch Conv2d(3, padding=1)
(reference modules/unet.py:13-60) and the full
UNetSegmentationModel.apply inference forward.  Runs the Pallas
interpreter on the CPU test mesh; the real-chip numbers live in
benchmarks/RESULTS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_toolbelt_tpu.ops.conv_kernels import (
    conv3x3_eligible,
    conv3x3_hcw,
    fold_batchnorm,
    pack_conv3x3_weights,
)
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel
from pytorch_toolbelt_tpu.zoo.fast_unet import (
    _d2s,
    _s2d,
    _s2d_conv_weights,
    fuse_unet_inference,
    fuse_unet_inference_s2d,
)


def _reference_conv_hcw(x_hcw, w_hwio, scale, bias, relu):
    """fp32 oracle: XLA conv on NCHW + folded scale/bias [+ReLU], HCW out."""
    x_nchw = jnp.transpose(x_hcw, (0, 2, 1, 3)).astype(jnp.float32)
    w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1)).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x_nchw, w_oihw, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    y = y * scale[None, :, None, None] + bias[None, :, None, None]
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.transpose(y, (0, 2, 1, 3))


@pytest.mark.parametrize("c_in,c_out", [(8, 32), (32, 32), (32, 16)])
@pytest.mark.parametrize("relu", [False, True])
def test_conv3x3_hcw_matches_xla(c_in, c_out, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, c_in, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c_in, c_out)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c_out) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c_out), jnp.float32)

    got = conv3x3_hcw(x, pack_conv3x3_weights(w), scale, bias, relu=relu, interpret=True)
    want = _reference_conv_hcw(x, w, scale, bias, relu)
    # bf16 inputs/output: tolerance scales with the fp32 oracle's magnitude
    tol = 2e-2 * float(jnp.abs(want).max())
    assert float(jnp.abs(got.astype(jnp.float32) - want).max()) <= tol


def test_conv3x3_hcw_borders_are_zero_padded():
    """SAME semantics: a kernel of ones over a ones image undercounts at the
    borders exactly like torch's zero padding."""
    c = 8
    x = jnp.ones((1, 16, c, 128), jnp.bfloat16)
    w = jnp.ones((3, 3, c, 8), jnp.float32)
    y = conv3x3_hcw(
        x, pack_conv3x3_weights(w), jnp.ones(8), jnp.zeros(8), interpret=True
    ).astype(jnp.float32)
    assert float(y[0, 8, 0, 64]) == pytest.approx(9 * c, rel=1e-2)  # interior
    assert float(y[0, 0, 0, 64]) == pytest.approx(6 * c, rel=1e-2)  # top edge
    assert float(y[0, 0, 0, 0]) == pytest.approx(4 * c, rel=1e-2)  # corner
    assert float(y[0, 8, 0, 127]) == pytest.approx(6 * c, rel=1e-2)  # right edge


def test_fold_batchnorm_matches_flax_inference():
    rng = np.random.default_rng(1)
    c = 16
    x = jnp.asarray(rng.standard_normal((2, 4, 4, c)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(c) * 0.2 + 1.0)
    beta = jnp.asarray(rng.standard_normal(c))
    mean = jnp.asarray(rng.standard_normal(c))
    var = jnp.asarray(rng.random(c) + 0.5)
    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    want = bn.apply(
        {"params": {"scale": gamma, "bias": beta}, "batch_stats": {"mean": mean, "var": var}}, x
    )
    scale, bias = fold_batchnorm(gamma, beta, mean, var)
    np.testing.assert_allclose(x * scale + bias, want, rtol=1e-5, atol=1e-5)


def test_conv3x3_eligibility_predicate():
    assert conv3x3_eligible(512, 32, 512, 32)
    assert not conv3x3_eligible(512, 32, 64, 32)  # W not 128-multiple
    assert not conv3x3_eligible(500, 32, 512, 32)  # H not 16-multiple
    assert not conv3x3_eligible(512, 12, 512, 32)  # C_in not 8-multiple
    assert not conv3x3_eligible(512, 32, 512, 1)  # C_out not 8-multiple


def test_fuse_unet_inference_matches_model_apply():
    """End-to-end: the fused HCW replay equals model.apply at bf16
    tolerance.  H=W=128 exercises BOTH code paths: the 128-wide top level
    takes the Pallas kernel, the deeper (W<128) levels the XLA NHCW
    fallback."""
    model = UNetSegmentationModel(num_classes=3, encoder_channels=16, growth_factor=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 128, 128, 3)), jnp.float32)

    want = model.apply(variables, x)
    got = fuse_unet_inference(model, variables, interpret=True)(x).astype(jnp.float32)
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) <= 2e-2 * scale


def test_fuse_unet_inference_output_name_dict():
    model = UNetSegmentationModel(
        num_classes=1, encoder_channels=16, num_layers=3, output_name="mask"
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = fuse_unet_inference(model, variables, interpret=True)(
        jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    assert set(out.keys()) == {"mask"}
    assert out["mask"].shape == (1, 64, 64, 1)


def test_s2d_roundtrip_and_conv_equivalence():
    """conv(s2d(x), s2d_weights(w)) == s2d(conv(x, w)) exactly (fp32)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    np.testing.assert_allclose(_d2s(_s2d(x)), x)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = _d2s(
        jax.lax.conv_general_dilated(
            _s2d(x),
            _s2d_conv_weights(w),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("num_classes,channels", [(1, 32), (3, 16)])
def test_fuse_unet_inference_s2d_matches_model_apply(num_classes, channels):
    model = UNetSegmentationModel(num_classes=num_classes, encoder_channels=channels)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    want = model.apply(variables, x)
    got = fuse_unet_inference_s2d(model, variables)(x).astype(jnp.float32)
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) <= 2e-2 * scale


def test_fuse_unet_inference_rejects_unsupported_config():
    model = UNetSegmentationModel(num_classes=1, activation="silu")
    variables = {"params": {}, "batch_stats": {}}
    with pytest.raises(NotImplementedError):
        fuse_unet_inference(model, variables)
