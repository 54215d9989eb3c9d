"""Activation registry (reference: pytorch_toolbelt/modules/activations.py).

In JAX, activations are pure functions.  The reference's "memory-efficient"
Swish/Mish custom autograd functions (activations.py:80-104, 127-160) exist
to avoid caching sigmoid(x); on TPU XLA rematerializes cheap elementwise ops
inside fusions automatically, so the plain compositions here are already the
memory-efficient versions.

``instantiate_activation_block(name, **kwargs)`` returns a callable with the
reference's kwarg-filtering behavior (activations.py:264-289); ``ABN``/``AGN``
are Flax modules fusing normalization + activation (activations.py:302-322).
"""

from functools import partial
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from .normalization import Normalization

__all__ = [
    "ABN",
    "AGN",
    "ACT_CELU",
    "ACT_ELU",
    "ACT_GELU",
    "ACT_GLU",
    "ACT_HARD_SIGMOID",
    "ACT_HARD_SWISH",
    "ACT_LEAKY_RELU",
    "ACT_MISH",
    "ACT_MISH_NAIVE",
    "ACT_NONE",
    "ACT_PRELU",
    "ACT_RELU",
    "ACT_RELU6",
    "ACT_SELU",
    "ACT_SIGMOID",
    "ACT_SILU",
    "ACT_SOFTMAX",
    "ACT_SOFTPLUS",
    "ACT_SWISH",
    "ACT_SWISH_NAIVE",
    "get_activation_fn",
    "get_activation_block",
    "hard_sigmoid",
    "hard_swish",
    "instantiate_activation_block",
    "mish",
    "mish_naive",
    "sanitize_activation_name",
    "swish",
    "swish_naive",
]

ACT_CELU = "celu"
ACT_ELU = "elu"
ACT_GELU = "gelu"
ACT_GLU = "glu"
ACT_HARD_SIGMOID = "hard_sigmoid"
ACT_HARD_SWISH = "hard_swish"
ACT_LEAKY_RELU = "leaky_relu"
ACT_MISH = "mish"
ACT_MISH_NAIVE = "mish_naive"
ACT_NONE = "none"
ACT_PRELU = "prelu"
ACT_RELU = "relu"
ACT_RELU6 = "relu6"
ACT_SELU = "selu"
ACT_SIGMOID = "sigmoid"
ACT_SILU = "silu"
ACT_SOFTMAX = "softmax"
ACT_SOFTPLUS = "softplus"
ACT_SWISH = "swish"
ACT_SWISH_NAIVE = "swish_naive"


def swish(x):
    return x * jax.nn.sigmoid(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


# The torch reference ships "naive" twins that differ only in autograd memory
# behavior (activations.py mish_naive/swish_naive); under jax AD there is no
# such distinction, so the naive spellings are the same function.
mish_naive = mish
swish_naive = swish


def hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


def relu6(x):
    return jax.nn.relu6(x)


def identity(x):
    return x


_ACTIVATIONS = {
    ACT_CELU: jax.nn.celu,
    ACT_ELU: jax.nn.elu,
    ACT_GELU: jax.nn.gelu,
    ACT_GLU: jax.nn.glu,
    ACT_HARD_SIGMOID: hard_sigmoid,
    ACT_HARD_SWISH: hard_swish,
    ACT_LEAKY_RELU: jax.nn.leaky_relu,
    ACT_MISH: mish,
    ACT_MISH_NAIVE: mish,
    ACT_NONE: identity,
    ACT_RELU: jax.nn.relu,
    ACT_RELU6: relu6,
    ACT_SELU: jax.nn.selu,
    ACT_SIGMOID: jax.nn.sigmoid,
    ACT_SILU: jax.nn.silu,
    ACT_SOFTMAX: jax.nn.softmax,
    ACT_SOFTPLUS: jax.nn.softplus,
    ACT_SWISH: swish,
    ACT_SWISH_NAIVE: swish,
}


def get_activation_fn(activation_name: str) -> Callable:
    """String -> elementwise activation function."""
    name = activation_name.lower()
    if name == ACT_PRELU:
        raise ValueError("prelu is parametric; use instantiate_activation_block or nn.PReLU-style module")
    return _ACTIVATIONS[name]


# Reference-compat alias (reference activations.py:237 returns a class; here
# activations are functions).
get_activation_block = get_activation_fn


def instantiate_activation_block(activation_name: str, **kwargs) -> Callable:
    """Return activation callable, filtering kwargs per activation kind
    (reference activations.py:264-289).  'inplace' is meaningless under XLA
    and ignored."""
    name = activation_name.lower()
    if name == ACT_LEAKY_RELU and "slope" in kwargs and kwargs["slope"] is not None:
        return partial(jax.nn.leaky_relu, negative_slope=kwargs["slope"])
    if name == ACT_SOFTMAX:
        return partial(jax.nn.softmax, axis=kwargs.get("dim", -1))
    if name == ACT_PRELU:
        # parametric: return a fresh module the caller applies like a function
        return PReLU(num_parameters=kwargs.get("num_parameters", 1))
    return get_activation_fn(name)


def sanitize_activation_name(activation_name: str) -> str:
    """Map hipster activations to leaky_relu for kaiming-style init gain
    (reference activations.py:292-299)."""
    if activation_name in {ACT_MISH, ACT_SWISH, ACT_SWISH_NAIVE, ACT_MISH_NAIVE}:
        return ACT_LEAKY_RELU
    return activation_name


class PReLU(nn.Module):
    """Parametric ReLU with learnable negative slope(s)."""

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.full((self.num_parameters,), self.init_value))
        return jnp.where(x >= 0, x, alpha * x)


class ABN(nn.Module):
    """BatchNorm + activation (reference activations.py:302-311)."""

    activation: str = ACT_RELU
    slope: float = 0.01
    eps: float = 1e-5
    momentum: float = 0.9  # flax convention: ra = momentum*ra + (1-momentum)*batch

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.BatchNorm(
            use_running_average=not training, epsilon=self.eps, momentum=self.momentum
        )(x)
        act = instantiate_activation_block(self.activation, slope=self.slope)
        return act(x)


class AGN(nn.Module):
    """GroupNorm + activation (reference activations.py:314-322)."""

    num_groups: int = 32
    activation: str = ACT_RELU
    slope: float = 0.01
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps)(x)
        act = instantiate_activation_block(self.activation, slope=self.slope)
        return act(x)
