"""Compile-gate tests — the analogue of the reference's torch.jit.trace
export gate (tests/test_model_export.py:22-46): every sampled encoder must
lower under jax.jit with static shapes.

Fast tier: abstract init (eval_shape — no parameter materialization) +
jit .lower() for every sampled encoder; this catches the JAX export bug
class (data-dependent control flow, dynamic shapes, tracer leaks) without
paying an XLA backend compile per preset on this 1-core box. One smallest
preset still backend-compiles and executes. The slow tier (-m slow)
backend-compiles and runs all of them, matching the reference's
check_trace=True semantics.
"""

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

_ids = lambda f: getattr(f, "__name__", str(f))


@pytest.mark.parametrize("factory", ENCODERS, ids=_ids)
def test_encoder_lowers(factory):
    encoder = factory()
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(encoder.init, KEY, x)
    lowered = jax.jit(lambda v, x: encoder.apply(v, x)).lower(variables, x)
    assert lowered.as_text().startswith("module")


def test_encoder_compiles_and_runs():
    encoder = zoo.resnet18_encoder()
    x = jnp.zeros((1, 64, 64, 3))
    variables = encoder.init(KEY, x)
    compiled = jax.jit(lambda v, x: encoder.apply(v, x)).lower(variables, x).compile()
    maps = compiled(variables, x)
    assert all(np.all(np.isfinite(np.asarray(m))) for m in maps)


@pytest.mark.slow
@pytest.mark.parametrize("factory", ENCODERS, ids=_ids)
def test_encoder_compiles_full(factory):
    encoder = factory()
    x = jnp.zeros((1, 64, 64, 3))
    variables = encoder.init(KEY, x)
    compiled = jax.jit(lambda v, x: encoder.apply(v, x)).lower(variables, x).compile()
    maps = compiled(variables, x)
    assert all(np.all(np.isfinite(np.asarray(m))) for m in maps)
