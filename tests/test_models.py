"""End-to-end model slice tests (reference test_encoders/test_decoders style)
+ multi-device sharded training step on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import pytorch_toolbelt_tpu.losses as L
from pytorch_toolbelt_tpu.core import FeatureMapsSpec
from pytorch_toolbelt_tpu.distributed import (
    batch_spatial_sharding,
    make_mesh,
    replicated,
    scale_learning_rate_for_ddp,
)
from pytorch_toolbelt_tpu.zoo import (
    ResizeHead,
    UNetDecoder,
    UNetSegmentationModel,
    UnetEncoder,
    change_stem_input_channels,
    make_n_channel_input_kernel,
)

KEY = jax.random.PRNGKey(0)


def test_unet_encoder_spec_and_shapes():
    encoder = UnetEncoder(out_channels=16, num_layers=4, growth_factor=2)
    spec = encoder.get_output_spec()
    assert spec.channels == (16, 32, 64, 128)
    assert spec.strides == (1, 2, 4, 8)

    x = jnp.zeros((2, 64, 64, 3))
    variables = encoder.init(KEY, x)
    maps = encoder.apply(variables, x)
    assert len(maps) == 4
    for fm, c, s in zip(maps, spec.channels, spec.strides):
        assert fm.shape == (2, 64 // s, 64 // s, c)


def test_unet_decoder_contract():
    encoder = UnetEncoder(out_channels=16, num_layers=4)
    spec = encoder.get_output_spec()
    decoder = UNetDecoder(input_spec=spec, out_channels=(16, 32, 64))

    x = jnp.zeros((2, 64, 64, 3))
    enc_vars = encoder.init(KEY, x)
    maps = encoder.apply(enc_vars, x)
    dec_vars = decoder.init(KEY, maps)
    outs = decoder.apply(dec_vars, maps)
    assert len(outs) == 3
    out_spec = decoder.get_output_spec()
    assert out_spec.channels == (16, 32, 64)
    for fm, c, s in zip(outs, out_spec.channels, out_spec.strides):
        assert fm.shape == (2, 64 // s, 64 // s, c)


def test_resize_head_dict_output():
    spec = FeatureMapsSpec(channels=(16, 32), strides=(1, 2))
    head = ResizeHead(input_spec=spec, num_classes=5, output_name="mask")
    maps = [jnp.zeros((2, 32, 32, 16)), jnp.zeros((2, 16, 16, 32))]
    variables = head.init(KEY, maps, output_size=(64, 64))
    out = head.apply(variables, maps, output_size=(64, 64))
    assert isinstance(out, dict) and out["mask"].shape == (2, 64, 64, 5)


@pytest.mark.parametrize("size", [64, 96])
def test_unet_segmentation_model_forward(size):
    model = UNetSegmentationModel(num_classes=3, encoder_channels=8, num_layers=3)
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(KEY, x)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (1, size, size, 3)


def test_change_stem_input_channels():
    kernel = jnp.asarray(np.random.RandomState(0).randn(3, 3, 3, 16).astype(np.float32))
    k5 = make_n_channel_input_kernel(kernel, 5)
    assert k5.shape == (3, 3, 5, 16)
    np.testing.assert_array_equal(np.asarray(k5[:, :, :3]), np.asarray(kernel))
    np.testing.assert_array_equal(np.asarray(k5[:, :, 3:5]), np.asarray(kernel[:, :, :2]))
    k2 = make_n_channel_input_kernel(kernel, 2)
    assert k2.shape == (3, 3, 2, 16)

    encoder = UnetEncoder(out_channels=8, num_layers=2)
    x3 = jnp.zeros((1, 32, 32, 3))
    variables = encoder.init(KEY, x3)
    path = ("UnetBlock_0", "Conv_0", "kernel")
    new_vars = change_stem_input_channels(variables, path, 5)
    x5 = jnp.zeros((1, 32, 32, 5))
    maps = encoder.apply(new_vars, x5)
    assert maps[0].shape == (1, 32, 32, 8)


def test_stem_surgery_ws_and_same_padded_stems():
    """Stem surgery on the hard stem flavors the reference special-cases
    (timm/common.py:41 Conv2dSame, efficient_net.py:33, nfnet WSConv):
    auto-discovered path, weight-standardized and same-padded stems, with a
    forward at the new channel count."""
    from pytorch_toolbelt_tpu.zoo import EfficientNetV2Encoder, NFNetEncoder, find_stem_kernel_path

    x3 = jnp.zeros((1, 32, 32, 3))
    x5 = jnp.zeros((1, 32, 32, 5))
    for encoder in _stem_surgery_cases(fast=True):
        variables = encoder.init({"params": KEY, "dropout": KEY}, x3)
        path = find_stem_kernel_path(variables)
        assert path[-1] == "kernel"
        new_vars = change_stem_input_channels(variables, None, 5)
        maps5 = encoder.apply(new_vars, x5)
        spec = encoder.get_output_spec()
        assert tuple(m.shape[-1] for m in maps5) == spec.channels
        assert all(np.all(np.isfinite(np.asarray(m))) for m in maps5)


def _stem_surgery_cases(fast):
    from pytorch_toolbelt_tpu.zoo import EfficientNetV2Encoder, NFNetEncoder

    cases = [NFNetEncoder(stage_blocks=(1, 1, 1, 1), stage_channels=(16, 16, 16, 16))]
    if not fast:
        cases.append(
            EfficientNetV2Encoder(
                config_override=(
                    ("fused", 1, 8, 1, 1),
                    ("fused", 2, 8, 1, 2),
                    ("mb", 2, 8, 1, 2),
                )
            )
        )
    return cases


@pytest.mark.slow
def test_stem_surgery_same_padded_stem_full():
    from pytorch_toolbelt_tpu.zoo import find_stem_kernel_path

    x3 = jnp.zeros((1, 32, 32, 3))
    x5 = jnp.zeros((1, 32, 32, 5))
    for encoder in _stem_surgery_cases(fast=False):
        variables = encoder.init({"params": KEY, "dropout": KEY}, x3)
        new_vars = change_stem_input_channels(variables, find_stem_kernel_path(variables), 5)
        maps5 = encoder.apply(new_vars, x5)
        assert all(np.all(np.isfinite(np.asarray(m))) for m in maps5)


def test_sharded_training_step_on_mesh():
    """Full training step sharded over an 8-device (data x spatial) mesh."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(jax.devices(), data_parallel=4, spatial_parallel=2)

    model = UNetSegmentationModel(num_classes=2, encoder_channels=8, num_layers=3)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64, 32, 3).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).randint(0, 2, size=(4, 64, 32)))

    variables = model.init(KEY, x)
    params, batch_stats = variables["params"], variables["batch_stats"]

    lr = scale_learning_rate_for_ddp(1e-3, world_size=8)
    assert lr == pytest.approx(8e-3)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    loss_fn = L.JointLoss(L.DiceLoss(mode="multiclass"), L.CrossEntropyFocalLoss(), 1.0, 0.5)

    def train_step(params, batch_stats, opt_state, x, y):
        def compute_loss(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, training=True, mutable=["batch_stats"]
            )
            return loss_fn(out, y), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt_state, loss

    rep = replicated(mesh)
    xs = batch_spatial_sharding(mesh, 4)
    ys = batch_spatial_sharding(mesh, 3)
    step = jax.jit(
        train_step, in_shardings=(rep, rep, rep, xs, ys), out_shardings=(rep, rep, rep, rep)
    )
    with mesh:
        x = jax.device_put(x, xs)
        y = jax.device_put(y, ys)
        params2, _, _, loss_sharded = step(params, batch_stats, opt_state, x, y)

    # sharded result must match the single-device computation
    params_ref, _, _, loss_ref = jax.jit(train_step)(
        params, batch_stats, opt_state,
        jax.device_put(x, jax.devices()[0]), jax.device_put(y, jax.devices()[0]),
    )
    np.testing.assert_allclose(float(loss_sharded), float(loss_ref), rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(params2)
    flat_b = jax.tree_util.tree_leaves(params_ref)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_graft_entry():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 1)
    # the sharded-train-step compile is covered by
    # test_sharded_training_step_on_mesh; the driver's own dryrun and the
    # slow tier below exercise dryrun_multichip itself


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [2, 8])
def test_graft_entry_mesh_dryrun(n_devices):
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry_full", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(n_devices)
