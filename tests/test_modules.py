"""Shape/behavior tests for nn building blocks (style of reference
tests/test_modules.py + test_activations.py, adapted to NHWC/flax)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_toolbelt_tpu.nn as tnn

KEY = jax.random.PRNGKey(0)


def init_apply(module, x, training=False, **kwargs):
    rngs = {"params": KEY, "dropout": jax.random.PRNGKey(1)}
    variables = module.init(rngs, x, **kwargs)
    out = module.apply(
        variables, x, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats", "state"] if training else False, **kwargs,
    )
    if training:
        out = out[0]
    return out


@pytest.mark.parametrize(
    "name",
    [
        tnn.ACT_RELU, tnn.ACT_RELU6, tnn.ACT_LEAKY_RELU, tnn.ACT_ELU, tnn.ACT_SELU,
        tnn.ACT_CELU, tnn.ACT_GELU, tnn.ACT_SILU, tnn.ACT_SWISH, tnn.ACT_SWISH_NAIVE,
        tnn.ACT_MISH, tnn.ACT_MISH_NAIVE, tnn.ACT_HARD_SIGMOID, tnn.ACT_HARD_SWISH,
        tnn.ACT_SOFTPLUS, tnn.ACT_SIGMOID, tnn.ACT_NONE,
    ],
)
def test_activations(name):
    fn = tnn.instantiate_activation_block(name)
    x = jnp.linspace(-5, 5, 64)
    y = fn(x)
    assert y.shape == x.shape and np.all(np.isfinite(np.asarray(y)))


def test_swish_mish_values():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(tnn.swish(x), np.asarray(x) / (1 + np.exp(-np.asarray(x))), atol=1e-6)
    sp = np.log1p(np.exp(np.asarray(x)))
    np.testing.assert_allclose(tnn.mish(x), np.asarray(x) * np.tanh(sp), atol=1e-4)


def test_sanitize_activation_name():
    assert tnn.sanitize_activation_name(tnn.ACT_MISH) == tnn.ACT_LEAKY_RELU
    assert tnn.sanitize_activation_name(tnn.ACT_RELU) == tnn.ACT_RELU


@pytest.mark.parametrize("norm", ["batch_norm", "group_norm", "instance_norm", "bn", "gn", "in"])
def test_normalization_registry(norm):
    x = jnp.ones((2, 8, 8, 32))
    module = tnn.instantiate_normalization_block(norm, 32)
    out = init_apply(module, x)
    assert out.shape == x.shape


def test_unet_blocks():
    x = jnp.ones((2, 16, 16, 8))
    out = init_apply(tnn.UnetBlock(out_channels=16), x)
    assert out.shape == (2, 16, 16, 16)
    out = init_apply(tnn.UnetResidualBlock(out_channels=16, drop_path_rate=0.1), x)
    assert out.shape == (2, 16, 16, 16)


@pytest.mark.parametrize(
    "module",
    [
        tnn.ChannelGate2d(),
        tnn.SpatialGate2d(reduction=4),
        tnn.ChannelSpatialGate2d(),
        tnn.SpatialGate2dV2(),
        tnn.ChannelSpatialGate2dV2(),
    ],
)
def test_scse_blocks(module):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 32).astype(np.float32))
    out = init_apply(module, x)
    assert out.shape == x.shape


def test_srm():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 32).astype(np.float32))
    out = init_apply(tnn.SRMLayer(), x)
    assert out.shape == x.shape


@pytest.mark.parametrize(
    "pool,expected_c",
    [
        (tnn.GlobalAvgPool2d(), 32),
        (tnn.GlobalMaxPool2d(), 32),
        (tnn.GlobalKMaxPool2d(k=4), 32),
        (tnn.GlobalWeightedAvgPool2d(), 32),
        (tnn.GeneralizedMeanPooling2d(), 32),
    ],
)
def test_pooling_keepdims(pool, expected_c):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 32).astype(np.float32))
    out = init_apply(pool, x)
    assert out.shape == (2, 1, 1, expected_c)


def test_pooling_special():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 32).astype(np.float32))
    assert init_apply(tnn.RMSPool(), x).shape == (2, 1, 1, 32)
    assert init_apply(tnn.GlobalMaxAvgPooling2d(), x).shape == (2, 64)
    assert init_apply(tnn.GlobalRankPooling(spatial_size=64), x).shape == (2, 1, 1, 32)
    out = init_apply(tnn.MILCustomPoolingModule(out_channels=10), x)
    assert out.shape == (2, 10)


def test_gem_matches_avg_for_p1():
    """GeM with p -> 1 equals avg pooling of clamped input."""
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 4).astype(np.float32)) + 0.1
    gem = tnn.GeneralizedMeanPooling2d(p=3.0)
    variables = gem.init(KEY, x)
    # force p parameter so softplus(p)+1 == 2 -> generalized mean of order 2
    p_val = np.log(np.e - 1)  # softplus(p)=1
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = {"params": {"p": jnp.array([p_val])}}
    out = gem.apply(params, x)
    expected = np.sqrt(np.mean(np.asarray(x) ** 2, axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


@pytest.mark.parametrize(
    "layer_type,expected_c",
    [
        (tnn.UpsampleLayerType.NEAREST, 16),
        (tnn.UpsampleLayerType.BILINEAR, 16),
        (tnn.UpsampleLayerType.PIXEL_SHUFFLE, 4),
        (tnn.UpsampleLayerType.PIXEL_SHUFFLE_LINEAR, 16),
        (tnn.UpsampleLayerType.DECONVOLUTION, 16),
        (tnn.UpsampleLayerType.RESIDUAL_DECONV, 4),
    ],
)
def test_upsample_blocks(layer_type, expected_c):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16).astype(np.float32))
    block = tnn.instantiate_upsample_block(layer_type, scale_factor=2)
    out = init_apply(block, x)
    assert out.shape == (2, 16, 16, expected_c)
    assert tnn.upsample_out_channels(layer_type, 16, 2) == expected_c


def test_fpn_fuse():
    maps = [
        jnp.ones((2, 32, 32, 8)),
        jnp.ones((2, 16, 16, 16)),
        jnp.ones((2, 8, 8, 32)),
    ]
    fused = init_apply(tnn.FPNFuse(), maps)
    assert fused.shape == (2, 32, 32, 56)
    summed = init_apply(tnn.FPNFuseSum(), [m[..., :8] for m in maps])
    assert summed.shape == (2, 32, 32, 8)
    hff = init_apply(tnn.HFF(), [m[..., :8] for m in maps])
    assert hff.shape == (2, 32, 32, 8)


def test_fpn_context_bottleneck():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 64).astype(np.float32))
    out = init_apply(tnn.FPNContextBlock(out_channels=32), x)
    assert out.shape == (2, 16, 16, 32)
    out = init_apply(tnn.FPNBottleneckBlock(out_channels=32), x)
    assert out.shape == (2, 32, 32, 32)


def test_aspp():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 64).astype(np.float32))
    out = init_apply(tnn.ASPP(out_channels=32, atrous_rates=(2, 4, 6)), x)
    assert out.shape == (2, 16, 16, 32)
    out = init_apply(tnn.ASPP(out_channels=32, atrous_rates=(2, 4, 6), separable=True), x)
    assert out.shape == (2, 16, 16, 32)


def test_ocnet_blocks():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 12, 32).astype(np.float32))
    out = init_apply(
        tnn.ObjectContextBlock(out_channels=32, key_channels=16, value_channels=32), x
    )
    assert out.shape == (2, 12, 12, 32)
    out = init_apply(tnn.ASPObjectContextBlock(out_features=32, dilations=(2, 4, 6)), x)
    assert out.shape == (2, 12, 12, 64)
    out = init_apply(tnn.PyramidObjectContextBlock(out_channels=32, sizes=(1, 2, 3, 6)), x)
    assert out.shape == (2, 12, 12, 32)


def test_coord_conv():
    x = jnp.ones((2, 8, 8, 3))
    assert tnn.append_coords(x).shape == (2, 8, 8, 5)
    assert tnn.append_coords(x, with_r=True).shape == (2, 8, 8, 6)
    out = init_apply(tnn.CoordConv(out_channels=8), x)
    assert out.shape == (2, 8, 8, 8)


def test_dsconv():
    x = jnp.ones((2, 8, 8, 16))
    out = init_apply(tnn.DepthwiseSeparableConv2d(out_channels=24), x)
    assert out.shape == (2, 8, 8, 24)
    out = init_apply(tnn.DepthwiseSeparableConv2dBlock(out_channels=24, activation="relu"), x)
    assert out.shape == (2, 8, 8, 24)


def test_dropblock_train_eval():
    x = jnp.ones((2, 16, 16, 8))
    db = tnn.DropBlock2D(drop_prob=0.5, block_size=3)
    # eval: identity
    out = init_apply(db, x, training=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # train: some blocks dropped
    variables = db.init({"params": KEY, "dropout": KEY}, x, training=True)
    out = db.apply(variables, x, training=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.asarray(out).min() == 0.0


def test_drop_path():
    x = jnp.ones((8, 4, 4, 2))
    dp = tnn.DropPath(drop_prob=0.5)
    variables = dp.init({"params": KEY, "dropout": KEY}, x, training=True)
    out = dp.apply(variables, x, training=True, rngs={"dropout": jax.random.PRNGKey(5)})
    per_sample = np.asarray(out).reshape(8, -1).sum(axis=1)
    assert (per_sample == 0).any() or (per_sample > 0).any()
    out_eval = dp.apply(variables, x, training=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))


def test_resize_matches_torch_bilinear():
    """resize_2d must match torch interpolate for both align_corners modes."""
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 3, 13, 17).astype(np.float32)
    xt = torch.tensor(x)
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    for size in [(26, 34), (7, 9), (20, 11)]:
        for align in [False, True]:
            ref = torch.nn.functional.interpolate(xt, size=size, mode="bilinear", align_corners=align)
            mine = tnn.resize_2d(xj, size, mode="bilinear", align_corners=align)
            np.testing.assert_allclose(
                np.asarray(mine), np.moveaxis(ref.numpy(), 1, -1), atol=1e-5,
                err_msg=f"size={size} align={align}",
            )
        ref = torch.nn.functional.interpolate(xt, size=size, mode="nearest")
        mine = tnn.resize_2d(xj, size, mode="nearest")
        np.testing.assert_allclose(np.asarray(mine), np.moveaxis(ref.numpy(), 1, -1), atol=0)
