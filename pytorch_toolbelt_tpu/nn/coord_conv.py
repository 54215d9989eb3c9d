"""CoordConv (arXiv:1807.03247; reference: modules/coord_conv.py:11-67).

NHWC: coordinate channels are appended on the last axis.
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["append_coords", "AddCoords", "CoordConv"]


def append_coords(input_tensor: jnp.ndarray, with_r: bool = False) -> jnp.ndarray:
    """Append normalized [-1, 1] row/col coordinate channels (+ radius)."""
    b, h, w, _ = input_tensor.shape
    dtype = input_tensor.dtype
    rows = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    cols = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    rr = jnp.broadcast_to(rows[:, None], (h, w))
    cc = jnp.broadcast_to(cols[None, :], (h, w))
    extra = [rr, cc]
    if with_r:
        extra.append(jnp.sqrt(jnp.square(rr - 0.5) + jnp.square(cc - 0.5)))
    extra = jnp.stack(extra, axis=-1)
    extra = jnp.broadcast_to(extra[None], (b, h, w, extra.shape[-1]))
    return jnp.concatenate([input_tensor, extra], axis=-1)


class AddCoords(nn.Module):
    with_r: bool = False

    def __call__(self, x):
        return append_coords(x, self.with_r)


class CoordConv(nn.Module):
    out_channels: int
    with_r: bool = False
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self, x):
        x = append_coords(x, self.with_r)
        return nn.Conv(self.out_channels, self.kernel_size, padding="SAME")(x)
