"""DropBlock structured dropout (arXiv:1810.12890).

Parity target: modules/dropblock.py:8-156.  NHWC / NDHWC layout; the
scheduled wrapper keeps its step counter as a flax variable (the analogue of
the reference's registered buffer, dropblock.py:140-156).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DropBlock2D", "DropBlock3D", "DropBlockScheduled"]


def _block_mask_2d(mask: jnp.ndarray, block_size: int):
    """mask [B,H,W] of dropped seeds -> block mask + kept count."""
    m = mask[..., None]  # [B,H,W,1]
    pad = block_size // 2
    pooled = nn.max_pool(
        m, window_shape=(block_size, block_size), strides=(1, 1), padding=((pad, pad), (pad, pad))
    )
    if block_size % 2 == 0:
        pooled = pooled[:, :-1, :-1, :]
    kept = pooled.size - jnp.sum(pooled, dtype=jnp.float32)
    return 1.0 - pooled[..., 0], kept


class DropBlock2D(nn.Module):
    """Randomly zero 2D spatial blocks; mask shared across channels."""

    drop_prob: float
    block_size: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert x.ndim == 4, "Expected NHWC input"
        if not training or self.drop_prob == 0.0:
            return x
        gamma = self.drop_prob / (self.block_size**2)
        key = self.make_rng("dropout")
        seed_mask = (jax.random.uniform(key, x.shape[:1] + x.shape[1:3]) < gamma).astype(x.dtype)
        block_mask, kept = _block_mask_2d(seed_mask, self.block_size)
        out = x * block_mask[..., None]
        return out * (block_mask.size / kept).astype(out.dtype)


class DropBlock3D(nn.Module):
    """3D analogue for NDHWC volumes (reference dropblock.py:74-134)."""

    drop_prob: float
    block_size: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert x.ndim == 5, "Expected NDHWC input"
        if not training or self.drop_prob == 0.0:
            return x
        gamma = self.drop_prob / (self.block_size**3)
        key = self.make_rng("dropout")
        seed_mask = (jax.random.uniform(key, x.shape[:1] + x.shape[1:4]) < gamma).astype(x.dtype)
        m = seed_mask[..., None]
        pad = self.block_size // 2
        pooled = nn.max_pool(
            m,
            window_shape=(self.block_size,) * 3,
            strides=(1, 1, 1),
            padding=((pad, pad),) * 3,
        )
        if self.block_size % 2 == 0:
            pooled = pooled[:, :-1, :-1, :-1, :]
        block_mask = 1.0 - pooled[..., 0]
        out = x * block_mask[..., None]
        return out * (block_mask.size / jnp.sum(block_mask)).astype(out.dtype)


class DropBlockScheduled(nn.Module):
    """Linearly ramp drop_prob from start_value to stop_value over nr_steps
    training calls (reference dropblock.py:137-156)."""

    block_size: int
    start_value: float
    stop_value: float
    nr_steps: int
    start_step: int = 0
    dims: int = 2

    @nn.compact
    def __call__(self, x, training: bool = False):
        step = self.variable("state", "step", lambda: jnp.zeros((), jnp.int32))
        if training:
            i = step.value
            ramp = jnp.clip(
                (i - self.start_step).astype(jnp.float32) / self.nr_steps, 0.0, 1.0
            )
            drop_prob = self.start_value + (self.stop_value - self.start_value) * ramp
            step.value = i + 1
        else:
            drop_prob = self.stop_value

        # drop_prob is traced; inline the DropBlock math with dynamic gamma
        if not training:
            return x
        assert x.ndim == 4
        gamma = drop_prob / (self.block_size**2)
        key = self.make_rng("dropout")
        seed_mask = (jax.random.uniform(key, x.shape[:1] + x.shape[1:3]) < gamma).astype(x.dtype)
        block_mask, kept = _block_mask_2d(seed_mask, self.block_size)
        out = x * block_mask[..., None]
        return out * (block_mask.size / kept).astype(out.dtype)
