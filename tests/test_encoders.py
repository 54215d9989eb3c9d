"""Encoder zoo sweeps for the new families (reference test_encoders.py
style: instantiate, run, check outputs against channels/strides)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_toolbelt_tpu.zoo as zoo

KEY = jax.random.PRNGKey(0)


def run_encoder(encoder, size=64, in_channels=3, training=False):
    x = jnp.zeros((1, size, size, in_channels))
    variables = encoder.init({"params": KEY, "dropout": KEY}, x)
    maps = encoder.apply(variables, x)
    spec = encoder.get_output_spec()
    assert len(maps) == len(spec), (len(maps), len(spec))
    for fm, c, s in zip(maps, spec.channels, spec.strides):
        assert fm.shape == (1, size // s, size // s, c), (fm.shape, (1, size // s, size // s, c))
    return maps


def test_densenet121():
    run_encoder(zoo.densenet121_encoder(), size=64)


def test_densenet_spec_channels():
    spec = zoo.densenet121_encoder().get_output_spec()
    assert spec.channels == (64, 256, 512, 1024, 1024)
    spec161 = zoo.densenet161_encoder().get_output_spec()
    assert spec161.channels[0] == 96


def test_mobilenet_v2():
    run_encoder(zoo.MobileNetV2Encoder(), size=64)


@pytest.mark.parametrize("factory", [zoo.mobilenet_v3_large_encoder, zoo.mobilenet_v3_small_encoder])
def test_mobilenet_v3(factory):
    run_encoder(factory(), size=64)


def test_squeezenet():
    run_encoder(zoo.squeezenet_encoder(), size=64)


def test_xresnet_and_se():
    run_encoder(zoo.xresnet18_encoder(), size=64)
    run_encoder(zoo.se_xresnet18_encoder(), size=64)
    spec = zoo.xresnet50_encoder().get_output_spec()
    assert spec.channels == (64, 256, 512, 1024, 2048)


def test_wider_resnet16():
    run_encoder(zoo.wider_resnet16_encoder(layers=(1, 2, 3, 4, 5)), size=64)


def test_efficientnet_b0():
    run_encoder(zoo.efficientnet_b0_encoder(), size=64)


def test_efficientnet_scaling():
    b4 = zoo.efficientnet_b4_encoder().get_output_spec()
    assert b4.channels == (24, 32, 56, 160, 448)


def test_mit_b0():
    run_encoder(zoo.mit_b0_encoder(), size=64)


def test_swin_tiny():
    # window size 7 exercises the padding path at 64x64 (16x16, 8x8 maps)
    run_encoder(zoo.swin_tiny_encoder(), size=64)


def test_hrnet18():
    run_encoder(zoo.hrnet18_encoder(), size=64)


def test_inception_v4():
    run_encoder(zoo.inception_v4_encoder(), size=64)


def test_hourglass():
    encoder = zoo.StackedHGEncoder(stack_level=2, depth=2, features=64)
    maps = run_encoder(encoder, size=64)
    assert len(maps) == 3


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
    for factory in [zoo.densenet121_encoder, zoo.MobileNetV2Encoder, zoo.efficientnet_b0_encoder]:
        encoder = factory(layers=(1, 2, 3, 4))
        maps = run_encoder(encoder, size=64)
        assert len(maps) == 4


def test_res2net50():
    run_encoder(zoo.res2net50_encoder(), size=64)


def test_res2next50():
    run_encoder(zoo.res2next50_encoder(), size=64)


def test_dpn92():
    run_encoder(zoo.dpn92_encoder(), size=64)


def test_dpn68():
    run_encoder(zoo.dpn68_encoder(), size=64)


def test_efficientnet_v2_s():
    run_encoder(zoo.efficientnet_v2_s_encoder(), size=64)


def test_nfnet_f0():
    run_encoder(zoo.nfnet_f0_encoder(), size=64)


def test_nf_regnet_b0():
    run_encoder(zoo.nf_regnet_b0_encoder(), size=64)


def test_skresnet18():
    run_encoder(zoo.skresnet18_encoder(), size=64)


def test_skresnet50():
    run_encoder(zoo.skresnet50_encoder(), size=64)


def test_maxvit_tiny():
    run_encoder(zoo.maxvit_tiny_encoder(partition=4), size=128)


def test_tresnet_m():
    run_encoder(zoo.tresnet_m_encoder(), size=64)


def test_wider_resnet_a2():
    run_encoder(zoo.wider_resnet16_a2_encoder(layers=(1, 2, 3, 4, 5)), size=64)


def test_mixnet_s():
    run_encoder(zoo.mixnet_s_encoder(), size=64)


def test_mixnet_xl():
    run_encoder(zoo.mixnet_xl_encoder(), size=64)
