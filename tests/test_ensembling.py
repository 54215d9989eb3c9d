"""Ensembler / activation wrappers / checkpoint averaging tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_toolbelt_tpu.inference import (
    ApplySigmoidTo,
    ApplySoftmaxTo,
    Ensembler,
    PickModelOutput,
    SelectByIndex,
    average_checkpoints,
)


def test_ensembler_tensor_outputs():
    m1 = lambda x: x * 1.0
    m2 = lambda x: x * 3.0
    x = jnp.asarray(np.random.rand(2, 4, 4, 1).astype(np.float32))
    out = Ensembler([m1, m2])(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, atol=1e-6)


def test_ensembler_dict_outputs():
    m1 = lambda x: {"mask": x * 1.0, "aux": x + 1}
    m2 = lambda x: {"mask": x * 3.0, "aux": x + 3}
    x = jnp.asarray(np.random.rand(2, 4, 4, 1).astype(np.float32))
    out = Ensembler([m1, m2], outputs=["mask"])(x)
    assert set(out.keys()) == {"mask"}
    np.testing.assert_allclose(np.asarray(out["mask"]), np.asarray(x) * 2.0, atol=1e-6)


def test_ensembler_from_stacked_params():
    def apply_fn(p, x):
        return x * p["scale"]

    stacked = {"scale": jnp.asarray([1.0, 3.0])}
    x = jnp.asarray(np.random.rand(2, 4, 4, 1).astype(np.float32))
    out = Ensembler.from_stacked(apply_fn, stacked)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, atol=1e-6)


def test_apply_sigmoid_softmax():
    model = lambda x: {"logits": x}
    x = jnp.asarray(np.random.randn(2, 8).astype(np.float32))
    out = ApplySigmoidTo(model, "logits")(x)
    np.testing.assert_allclose(np.asarray(out["logits"]), 1 / (1 + np.exp(-np.asarray(x))), atol=1e-6)
    out = ApplySoftmaxTo(model, "logits")(x)
    np.testing.assert_allclose(np.asarray(out["logits"]).sum(-1), np.ones(2), atol=1e-6)


def test_pick_and_select():
    model = lambda x: {"a": x, "b": x * 2}
    x = jnp.ones((2, 2))
    assert np.allclose(PickModelOutput(model, "b")(x), 2.0)
    assert np.allclose(SelectByIndex("a")(model(x)), 1.0)


def test_average_checkpoints():
    p1 = {"w": jnp.asarray([1.0, 2.0]), "steps": jnp.asarray([4])}
    p2 = {"w": jnp.asarray([3.0, 4.0]), "steps": jnp.asarray([5])}
    avg = average_checkpoints([p1, p2])
    np.testing.assert_allclose(np.asarray(avg["w"]), [2.0, 3.0])
    assert int(avg["steps"][0]) == 4  # integer leaves: sum // n
