"""Encoder/decoder/head zoo sweeps (reference test_encoders.py /
test_decoders.py style: instantiate, run, check channels/strides)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_toolbelt_tpu.zoo as zoo
from pytorch_toolbelt_tpu.core import FeatureMapsSpec

KEY = jax.random.PRNGKey(0)


def run_encoder(encoder, size=64, in_channels=3):
    x = jnp.zeros((1, size, size, in_channels))
    variables = encoder.init(KEY, x)
    maps = encoder.apply(variables, x)
    spec = encoder.get_output_spec()
    assert len(maps) == len(spec)
    for fm, c, s in zip(maps, spec.channels, spec.strides):
        assert fm.shape == (1, size // s, size // s, c), (fm.shape, c, s)
    return maps, spec


@pytest.mark.parametrize(
    "factory,stem_c,stage1_c",
    [
        (zoo.resnet18_encoder, 64, 64),
        (zoo.resnet34_encoder, 64, 64),
        (zoo.resnet50_encoder, 64, 256),
        (zoo.seresnet50_encoder, 64, 256),
        (zoo.seresnext50_encoder, 64, 256),
    ],
)
def test_resnet_encoders(factory, stem_c, stage1_c):
    # preset identity only — forwards for this family run in
    # test_encoders.py (minimal fast tier + full presets under -m slow)
    encoder = factory()
    spec = encoder.get_output_spec()
    assert spec.strides == (2, 4, 8, 16, 32)
    assert spec.channels[0] == stem_c and spec.channels[1] == stage1_c


def test_resnet_encoder_layer_subset():
    encoder = zoo.resnet18_encoder(layers=(1, 2, 3, 4))
    spec = encoder.get_output_spec()
    assert spec.strides == (4, 8, 16, 32)
    run_encoder(encoder, size=64)


def _dummy_spec_and_maps(channels=(16, 32, 64, 128), strides=(4, 8, 16, 32), size=64):
    spec = FeatureMapsSpec(channels, strides)
    maps = [jnp.zeros((2, size // s, size // s, c)) for c, s in zip(channels, strides)]
    return spec, maps


def _run_decoder(decoder, maps):
    variables = decoder.init(KEY, maps)
    outs = decoder.apply(variables, maps, rngs={"dropout": KEY})
    spec = decoder.get_output_spec()
    assert len(outs) == len(spec)
    for fm, c, s in zip(outs, spec.channels, spec.strides):
        assert fm.shape[-1] == c
    return outs


def test_fpn_decoder():
    spec, maps = _dummy_spec_and_maps()
    decoder = zoo.FPNDecoder(input_spec=spec, out_channels=64)
    outs = _run_decoder(decoder, maps)
    assert all(o.shape[-1] == 64 for o in outs)
    assert outs[0].shape[1] == maps[0].shape[1]  # fine first


def test_deeplab_decoders():
    spec, maps = _dummy_spec_and_maps()
    outs = _run_decoder(zoo.DeeplabV3Decoder(input_spec=spec, out_channels=21, atrous_rates=(1, 2, 3)), maps)
    assert len(outs) == 1
    outs = _run_decoder(
        zoo.DeeplabV3PlusDecoder(input_spec=spec, out_channels=21, atrous_rates=(1, 2, 3)), maps
    )
    assert len(outs) == 2
    assert outs[0].shape[1] == maps[0].shape[1]


def test_can_decoder():
    spec, maps = _dummy_spec_and_maps(size=64)
    outs = _run_decoder(zoo.CANDecoder(input_spec=spec, out_channels=32), maps)
    assert all(o.shape[-1] == 32 for o in outs)


def test_bifpn_decoder():
    spec, maps = _dummy_spec_and_maps()
    outs = _run_decoder(zoo.BiFPNDecoder(input_spec=spec, out_channels=48, num_layers=2), maps)
    assert all(o.shape[-1] == 48 for o in outs)
    # fine->coarse ordering preserved
    assert outs[0].shape[1] > outs[-1].shape[1]


def _head_maps():
    return _dummy_spec_and_maps(channels=(16, 32, 64, 128), strides=(4, 8, 16, 32))


def test_hypercolumn_head():
    spec, maps = _head_maps()
    head = zoo.HypercolumnHead(input_spec=spec, num_classes=5, mid_channels=32, output_name="mask")
    variables = head.init(KEY, maps, output_size=(64, 64))
    out = head.apply(variables, maps, output_size=(64, 64))
    assert out["mask"].shape == (2, 64, 64, 5)


def test_deep_supervision_head():
    spec, maps = _head_maps()
    head = zoo.DeepSupervisionHead(input_spec=spec, num_classes=3, output_name_prefix="MASK")
    variables = head.init(KEY, maps)
    out = head.apply(variables, maps)
    assert set(out.keys()) == {"MASK_STRIDE_4", "MASK_STRIDE_8", "MASK_STRIDE_16", "MASK_STRIDE_32"}
    assert out["MASK_STRIDE_4"].shape == (2, 16, 16, 3)


def test_progressive_shuffle_head():
    spec, maps = _head_maps()
    head = zoo.ProgressiveShuffleHead(input_spec=spec, num_classes=2)
    variables = head.init(KEY, maps)
    out = head.apply(variables, maps)
    assert out.shape == (2, 64, 64, 2)  # stride 4 -> full resolution


def test_segformer_head():
    spec, maps = _head_maps()
    head = zoo.SegFormerHead(input_spec=spec, num_classes=7, embedding_dim=32,
                             with_supervision=True, output_name="MASK")
    variables = head.init(KEY, maps, output_size=(64, 64))
    out = head.apply(variables, maps, output_size=(64, 64))
    assert out["MASK"].shape == (2, 64, 64, 7)
    assert out["MASK_STRIDE_32"].shape == (2, 2, 2, 7)


@pytest.mark.parametrize(
    "head_cls",
    [
        zoo.GlobalAveragePoolingClassificationHead,
        zoo.GlobalMaxPoolingClassificationHead,
        zoo.GeneralizedMeanPoolingClassificationHead,
        zoo.FullyConnectedClassificationHead,
        zoo.GlobalMaxAvgSumPoolingClassificationHead,
    ],
)
def test_classification_heads(head_cls):
    spec, maps = _head_maps()
    head = head_cls(input_spec=spec, num_classes=10)
    variables = head.init(KEY, maps)
    out = head.apply(variables, maps)
    assert out.shape == (2, 10)


def test_max_avg_classification_head_with_bn():
    spec, maps = _head_maps()
    head = zoo.GlobalMaxAvgPoolingClassificationHead(input_spec=spec, num_classes=10)
    variables = head.init(KEY, maps)
    out = head.apply(variables, maps)
    assert out.shape == (2, 10)


def test_encoder_decoder_head_composition():
    """Full model: ResNet18 + FPN + hypercolumn head."""
    encoder = zoo.resnet18_encoder(layers=(1, 2, 3, 4))
    decoder = zoo.FPNDecoder(input_spec=encoder.get_output_spec(), out_channels=32)
    head = zoo.ResizeHead(input_spec=decoder.get_output_spec(), num_classes=4)
    model = zoo.EncoderDecoderModel(encoder=encoder, decoder=decoder, head=head)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(KEY, x)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (1, 64, 64, 4)


def test_ppm_decoder():
    spec, maps = _dummy_spec_and_maps(channels=(16, 32, 64, 128), strides=(4, 8, 16, 32), size=96)
    outs = _run_decoder(zoo.PPMDecoder(input_spec=spec, out_channels=64, pool_sizes=(1, 3)), maps)
    assert len(outs) == 1 and outs[0].shape[-1] == 64


def test_port_torch_state_dict():
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    class Tiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, training=False):
            x = fnn.Conv(8, (3, 3), padding="SAME")(x)
            x = fnn.BatchNorm(use_running_average=not training)(x)
            x = x.mean(axis=(1, 2))
            return fnn.Dense(4)(x)

    model = Tiny()
    variables = model.init(KEY, jnp.zeros((1, 8, 8, 3)))

    tmodel = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1),
        torch.nn.BatchNorm2d(8),
    )
    tlinear = torch.nn.Linear(8, 4)
    sd = {**{f"0.{k}": v for k, v in tmodel[0].state_dict().items()},
          **{f"1.{k}": v for k, v in tmodel[1].state_dict().items()},
          **{f"fc.{k}": v for k, v in tlinear.state_dict().items()}}

    mapping = {
        ("params", "Conv_0", "kernel"): "0.weight",
        ("params", "Conv_0", "bias"): "0.bias",
        ("params", "BatchNorm_0", "scale"): "1.weight",
        ("params", "BatchNorm_0", "bias"): "1.bias",
        ("batch_stats", "BatchNorm_0", "mean"): "1.running_mean",
        ("batch_stats", "BatchNorm_0", "var"): "1.running_var",
        ("params", "Dense_0", "kernel"): "fc.weight",
        ("params", "Dense_0", "bias"): "fc.bias",
    }
    ported = zoo.port_torch_state_dict(variables, sd, mapping)

    # numerical equivalence: same input -> same output (eval mode)
    x = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    mine = np.asarray(model.apply(ported, jnp.asarray(x)))
    with torch.no_grad():
        tmodel.eval()
        feats = tmodel(torch.tensor(np.moveaxis(x, -1, 1)))
        ref = tlinear(feats.mean(dim=(2, 3))).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def _training_mode_decoders(spec, fast):
    decoders = [
        zoo.UNetDecoder(input_spec=spec, out_channels=(8, 16, 32)),
        zoo.DeeplabV3PlusDecoder(input_spec=spec, out_channels=8, atrous_rates=(1, 2, 3)),
    ]
    if not fast:
        decoders += [
            zoo.FPNDecoder(input_spec=spec, out_channels=16),
            zoo.CANDecoder(input_spec=spec, out_channels=16),
            zoo.BiFPNDecoder(input_spec=spec, out_channels=16, num_layers=1),
        ]
    return decoders


def test_decoders_training_mode():
    """Training-mode forward (BatchNorm batch stats + dropout rngs): two
    representative decoders fast (one skip-concat, one ASPP); the rest of
    the zoo under -m slow (eval-mode forwards for all run elsewhere)."""
    spec, maps = _dummy_spec_and_maps()
    for decoder in _training_mode_decoders(spec, fast=True):
        variables = decoder.init(
            {"params": KEY, "dropout": KEY}, maps, training=True
        )
        outs, updates = decoder.apply(
            variables, maps, training=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert len(outs) >= 1


@pytest.mark.slow
def test_decoders_training_mode_full():
    spec, maps = _dummy_spec_and_maps()
    for decoder in _training_mode_decoders(spec, fast=False):
        variables = decoder.init({"params": KEY, "dropout": KEY}, maps, training=True)
        outs, updates = decoder.apply(
            variables, maps, training=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert len(outs) >= 1
