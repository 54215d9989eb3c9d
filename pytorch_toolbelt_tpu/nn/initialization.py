"""Initializers (reference: modules/initialization.py:9-21, upsample.py:48-57)."""

import math

import jax
import jax.numpy as jnp

__all__ = [
    "first_class_background_init_bias",
    "zeros_kernel_init",
    "icnr_init",
    "bilinear_upsample_initializer",
]


def _logit(p: float) -> float:
    return math.log(p / (1.0 - p))


def zeros_kernel_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def first_class_background_init_bias(background_prob: float = 0.95):
    """Bias initializer [logit(bg), logit(fg), logit(fg), ...] for
    detection-style heads (reference initialization.py:9-21). Pair with
    zeros_kernel_init on the kernel."""

    def init(key, shape, dtype=jnp.float32):
        bias = jnp.full(shape, _logit(1.0 - background_prob), dtype)
        return bias.at[0].set(_logit(background_prob))

    return init


def bilinear_upsample_initializer(key, shape, dtype=jnp.float32):
    """Radial-tent kernel for transposed-conv upsampling, normalized to unit
    mass per (in, out) slice — the same arithmetic as reference
    upsample.py:47-57 (distance from kernel center, inverted, normalized),
    in HWIO layout for flax ConvTranspose kernels."""
    h, w = shape[0], shape[1]
    ci, cj = h // 2, w // 2
    ii = jnp.arange(h, dtype=dtype)[:, None]
    jj = jnp.arange(w, dtype=dtype)[None, :]
    dist = jnp.hypot(ci - ii, cj - jj)
    y = 1.0 - dist / jnp.sum(dist)
    y = y / jnp.sum(y)
    return jnp.broadcast_to(y[:, :, None, None], shape).astype(dtype)


def icnr_init(upscale_factor: int = 2, base_init=jax.nn.initializers.he_normal()):
    """Checkerboard-artifact-free init for conv kernels feeding pixel-shuffle
    (arXiv:1707.02937; reference upsample.py:60-96). Kernel layout HWIO with
    O = out_channels * upscale_factor**2."""

    n = upscale_factor * upscale_factor

    def init(key, shape, dtype=jnp.float32):
        h, w, i, o = shape
        sub = base_init(key, (h, w, i, o // n), dtype)
        return jnp.repeat(sub, n, axis=-1)

    return init
