"""Compile-gate tests — the analogue of the reference's torch.jit.trace
export gate (tests/test_model_export.py:22-46): every sampled encoder must
lower + compile under jax.jit with static shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_toolbelt_tpu.zoo as zoo

KEY = jax.random.PRNGKey(0)

ENCODERS = [
    zoo.resnet18_encoder,
    zoo.seresnext50_encoder,
    zoo.densenet121_encoder,
    zoo.MobileNetV2Encoder,
    zoo.efficientnet_b0_encoder,
    zoo.mit_b0_encoder,
    zoo.swin_tiny_encoder,
    zoo.xresnet18_encoder,
    zoo.squeezenet_encoder,
    zoo.tresnet_m_encoder,
]


@pytest.mark.parametrize("factory", ENCODERS, ids=lambda f: getattr(f, "__name__", str(f)))
def test_encoder_compiles(factory):
    encoder = factory()
    x = jnp.zeros((1, 64, 64, 3))
    variables = encoder.init(KEY, x)
    lowered = jax.jit(lambda v, x: encoder.apply(v, x)).lower(variables, x)
    compiled = lowered.compile()
    maps = compiled(variables, x)
    assert all(np.all(np.isfinite(np.asarray(m))) for m in maps)
