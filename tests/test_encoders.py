"""Encoder zoo sweeps (reference test_encoders.py style: instantiate, run,
check outputs against channels/strides).

Two tiers, because this CI box has one CPU core and XLA compile time
dominates:

* FAST (default): every family runs a forward at MINIMAL depth (1 block per
  stage where the family has a depth knob) under one jitted init+apply
  program — this proves the stem/block/transition/subset contracts with a
  single persistent-cacheable compile. Preset identity (channel/stride
  tuples, depths) is asserted via cheap spec checks that never build params.
* SLOW (``-m slow``): the original full-preset forwards, kept for
  exhaustive sweeps on beefier machines (reference's own sweeps,
  /root/reference/tests/test_encoders.py:35-78, instantiate full presets).

Numerical architecture fidelity (beyond shapes) is covered separately by
tests/test_arch_parity.py against the reference's vendored torch backbones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_toolbelt_tpu.zoo as zoo

KEY = jax.random.PRNGKey(0)


def run_encoder(encoder, size=64, in_channels=3):
    """Forward an encoder through ONE jitted init+apply program and check
    the list-of-feature-maps contract against its output spec."""
    x = jnp.zeros((1, size, size, in_channels))

    @jax.jit
    def full(x):
        variables = encoder.init({"params": KEY, "dropout": KEY}, x)
        return encoder.apply(variables, x)

    maps = full(x)
    spec = encoder.get_output_spec()
    assert len(maps) == len(spec), (len(maps), len(spec))
    for fm, c, s in zip(maps, spec.channels, spec.strides):
        assert fm.shape == (1, size // s, size // s, c), (fm.shape, (1, size // s, size // s, c))
    return maps


# ---------------------------------------------------------------------------
# FAST tier: minimal-depth forward per family
# ---------------------------------------------------------------------------

_MINIMAL = {
    "resnet": lambda: zoo.ResNetEncoder(stage_blocks=(1, 1, 1, 1), bottleneck=True),
    # deep stem + avg-down shortcut (ResNet-D path)
    "resnet_d": lambda: zoo.ResNetEncoder(
        stage_blocks=(1, 1, 1, 1), bottleneck=True, deep_stem=True, avg_down=True
    ),
    "seresnext": lambda: zoo.ResNetEncoder(
        stage_blocks=(1, 1, 1, 1), bottleneck=True, use_se=True, groups=32, base_width=4
    ),
    "densenet": lambda: zoo.DenseNetEncoder(block_config=(1, 1, 1, 1)),
    "xresnet": lambda: zoo.XResNetEncoder(blocks=(1, 1, 1, 1)),
    "se_xresnet": lambda: zoo.XResNetEncoder(blocks=(1, 1, 1, 1), use_se=True),
    "wider_resnet": lambda: zoo.wider_resnet16_encoder(layers=(1, 2, 3, 4, 5)),
    "wider_resnet_a2": lambda: zoo.wider_resnet16_a2_encoder(layers=(1, 2, 3, 4, 5)),
    "hrnet": lambda: zoo.HRNetEncoder(width=18, stage_modules=(1, 1, 1)),
    "swin": lambda: zoo.SwinTransformerEncoder(depths=(1, 1, 1, 1), num_heads=(3, 6, 12, 24)),
    "mit": lambda: zoo.MixVisionTransformerEncoder(depths=(1, 1, 1, 1)),
    "hourglass": lambda: zoo.StackedHGEncoder(stack_level=1, depth=1, features=32),
    "dpn": lambda: zoo.DPNEncoder(
        stage_blocks=(1, 1, 1, 1), base_width=(64, 128, 256, 512),
        res_width=(64, 128, 256, 512), inc=(16, 32, 32, 64),
        stem_channels=10, small_stem=True,
    ),
    # b_style: separate res/dense output projections (dpn68b/107 flavor)
    "dpn_b": lambda: zoo.DPNEncoder(
        stage_blocks=(1, 1, 1, 1), base_width=(64, 128, 256, 512),
        res_width=(64, 128, 256, 512), inc=(16, 32, 32, 64),
        stem_channels=10, small_stem=True, b_style=True,
    ),
    "res2net": lambda: zoo.Res2NetEncoder(stage_blocks=(1, 1, 1, 1)),
    "skresnet": lambda: zoo.SKResNetEncoder(stage_blocks=(1, 1, 1, 1), bottleneck=False),
    "tresnet": lambda: zoo.TResNetEncoder(stage_blocks=(1, 1, 1, 1)),
    "nfnet": lambda: zoo.NFNetEncoder(stage_blocks=(1, 1, 1, 1)),
    "nf_regnet": lambda: zoo.NFNetEncoder(
        stage_blocks=(1, 1, 1, 1), stage_channels=(48, 104, 208, 440)
    ),
    "efficientnet_v2": lambda: zoo.EfficientNetV2Encoder(
        config_override=(
            ("fused", 1, 24, 1, 1),
            ("fused", 4, 48, 1, 2),
            ("mb", 4, 64, 1, 2),
            ("mb", 6, 128, 1, 2),
            ("mb", 6, 160, 1, 2),
        )
    ),
    "squeezenet": lambda: zoo.squeezenet_encoder(),
    "mobilenet_v3": lambda: zoo.mobilenet_v3_small_encoder(),
    # depth_mult=0.01 -> 1 block per stage (B0..B7 identity via spec checks;
    # full presets under -m slow)
    "efficientnet": lambda: zoo.EfficientNetEncoder(width_mult=1.0, depth_mult=0.01),
    # depth_mult=0.01 -> ceil rounds every stage to 1 block (preset identity
    # for S/M/XL is asserted via spec checks; full presets run under -m slow)
    "mixnet": lambda: zoo.MixNetEncoder(width_mult=1.0, depth_mult=0.01),
}


@pytest.mark.parametrize("family", sorted(_MINIMAL))
def test_family_forward(family):
    run_encoder(_MINIMAL[family]())


def test_maxvit_forward():
    run_encoder(zoo.MaxViTEncoder(stage_blocks=(1, 1, 1, 1), partition=4), size=64)


def test_inception_v4_spec():
    # forward fidelity is proven numerically in test_arch_parity.py
    spec = zoo.inception_v4_encoder().get_output_spec()
    assert spec.channels == (64, 192, 384, 1024, 1536)


def test_mobilenet_v2_spec():
    # forward fidelity is proven numerically in test_arch_parity.py
    spec = zoo.MobileNetV2Encoder().get_output_spec()
    assert spec.strides == (2, 4, 8, 16, 32)


def test_supervised_hourglass():
    encoder = zoo.StackedSupervisedHGEncoder(
        supervision_channels=1, stack_level=2, depth=2, features=64
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = encoder.init(KEY, x)
    outputs, supervision = encoder.apply(variables, x)
    assert len(outputs) == 3
    assert len(supervision) == 1
    assert supervision[0].shape == (1, 16, 16, 1)


def test_encoders_layer_subsets():
    # subset selection lives in the shared EncoderBase contract
    encoder = zoo.DenseNetEncoder(block_config=(1, 1, 1, 1), layers=(1, 2, 3, 4))
    maps = run_encoder(encoder)
    assert len(maps) == 4


# ---------------------------------------------------------------------------
# Preset identity (spec-only; no parameters built)
# ---------------------------------------------------------------------------


def test_densenet_spec_channels():
    spec = zoo.densenet121_encoder().get_output_spec()
    assert spec.channels == (64, 256, 512, 1024, 1024)
    spec161 = zoo.densenet161_encoder().get_output_spec()
    assert spec161.channels[0] == 96


def test_xresnet_spec():
    spec = zoo.xresnet50_encoder().get_output_spec()
    assert spec.channels == (64, 256, 512, 1024, 2048)


def test_efficientnet_scaling():
    b4 = zoo.efficientnet_b4_encoder().get_output_spec()
    assert b4.channels == (24, 32, 56, 160, 448)


def test_dpn_preset_specs():
    assert zoo.dpn107_encoder().get_output_spec().channels[0] == 128
    assert zoo.dpn131_encoder().get_output_spec().channels[0] == 128
    # res_width + (blocks+2)*inc at the last stage
    assert zoo.dpn107_encoder().get_output_spec().channels[-1] == 2048 + 5 * 128
    assert zoo.dpn131_encoder().get_output_spec().channels[-1] == 2048 + 5 * 128


def test_resnet_d_and_swsl_specs():
    for factory in [
        zoo.resnet26d_encoder, zoo.resnet50d_encoder, zoo.resnet101d_encoder,
        zoo.resnet152d_encoder, zoo.resnet200d_encoder, zoo.seresnet152d_encoder,
    ]:
        spec = factory().get_output_spec()
        assert spec.channels == (64, 256, 512, 1024, 2048)
        assert spec.strides == (2, 4, 8, 16, 32)
    assert zoo.swsl_resnext101_encoder().get_output_spec().channels[-1] == 2048


def test_nfnet_f_series_specs():
    for n, factory in enumerate([
        zoo.nfnet_f2_encoder, zoo.nfnet_f3_encoder, zoo.nfnet_f4_encoder,
        zoo.nfnet_f5_encoder, zoo.nfnet_f6_encoder, zoo.nfnet_f7_encoder,
    ]):
        enc = factory()
        assert enc.stage_blocks == tuple(b * (n + 3) for b in (1, 2, 6, 3))
        assert enc.get_output_spec().channels == (128, 256, 512, 1536, 1536)


def test_nf_regnet_b_series_specs():
    assert zoo.nf_regnet_b1_encoder().get_output_spec().channels[-1] == 440
    assert zoo.nf_regnet_b2_encoder().get_output_spec().channels[-1] == 488
    assert zoo.nf_regnet_b3_encoder().get_output_spec().channels[-1] == 528
    assert zoo.nf_regnet_b4_encoder().get_output_spec().channels[-1] == 610
    assert zoo.nf_regnet_b5_encoder().get_output_spec().channels[-1] == 704


def test_efficientnet_v2_lm_specs():
    # M now carries the paper's 7th (512-ch) stage; L tops out at 640
    assert zoo.efficientnet_v2_m_encoder().get_output_spec().channels[-1] == 512
    assert zoo.efficientnet_v2_l_encoder().get_output_spec().channels == (32, 64, 96, 224, 640)


def test_maxvit_blx_specs():
    assert zoo.maxvit_base_encoder().get_output_spec().channels == (64, 96, 192, 384, 768)
    assert zoo.maxvit_large_encoder().get_output_spec().channels == (128, 128, 256, 512, 1024)
    assert zoo.maxvit_xlarge_encoder().get_output_spec().channels == (192, 192, 384, 768, 1536)


# ---------------------------------------------------------------------------
# SLOW tier: full-preset forwards (run with `pytest -m slow`)
# ---------------------------------------------------------------------------

_FULL_PRESETS = {
    "densenet121": (lambda: zoo.densenet121_encoder(), 64),
    "mobilenet_v2": (lambda: zoo.MobileNetV2Encoder(), 64),
    "mobilenet_v3_large": (lambda: zoo.mobilenet_v3_large_encoder(), 64),
    "xresnet18": (lambda: zoo.xresnet18_encoder(), 64),
    "se_xresnet18": (lambda: zoo.se_xresnet18_encoder(), 64),
    "efficientnet_b0": (lambda: zoo.efficientnet_b0_encoder(), 64),
    "mit_b0": (lambda: zoo.mit_b0_encoder(), 64),
    "swin_tiny": (lambda: zoo.swin_tiny_encoder(), 64),
    "hrnet18": (lambda: zoo.hrnet18_encoder(), 64),
    "inception_v4": (lambda: zoo.inception_v4_encoder(), 64),
    "res2net50": (lambda: zoo.res2net50_encoder(), 64),
    "res2next50": (lambda: zoo.res2next50_encoder(), 64),
    "dpn68": (lambda: zoo.dpn68_encoder(), 64),
    "dpn68b": (lambda: zoo.dpn68b_encoder(), 64),
    "dpn92": (lambda: zoo.dpn92_encoder(), 64),
    "efficientnet_v2_s": (lambda: zoo.efficientnet_v2_s_encoder(), 64),
    "nfnet_f0": (lambda: zoo.nfnet_f0_encoder(), 64),
    "nf_regnet_b0": (lambda: zoo.nf_regnet_b0_encoder(), 64),
    "skresnet18": (lambda: zoo.skresnet18_encoder(), 64),
    "skresnet50": (lambda: zoo.skresnet50_encoder(), 64),
    "maxvit_tiny": (lambda: zoo.maxvit_tiny_encoder(partition=4), 128),
    "tresnet_m": (lambda: zoo.tresnet_m_encoder(), 64),
    "mixnet_xl": (lambda: zoo.mixnet_xl_encoder(), 64),
    "resnet26d": (lambda: zoo.resnet26d_encoder(), 64),
    "hourglass2": (lambda: zoo.StackedHGEncoder(stack_level=2, depth=2, features=64), 64),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_FULL_PRESETS))
def test_full_preset_forward(name):
    factory, size = _FULL_PRESETS[name]
    run_encoder(factory(), size=size)
