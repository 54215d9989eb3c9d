"""Stochastic depth (reference: modules/drop_path.py:6-38)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["drop_path", "DropPath"]


def drop_path(x: jnp.ndarray, key, drop_prob: float = 0.0, scale_by_keep: bool = True) -> jnp.ndarray:
    """Drop entire residual paths per sample."""
    if drop_prob == 0.0:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep_prob, shape).astype(x.dtype)
    if keep_prob > 0.0 and scale_by_keep:
        mask = mask / keep_prob
    return x * mask


class DropPath(nn.Module):
    drop_prob: float = 0.0
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.drop_prob == 0.0:
            return x
        return drop_path(x, self.make_rng("dropout"), self.drop_prob, self.scale_by_keep)
