"""Functional helpers for NHWC feature maps.

Interpolation reproduces torch.nn.functional.interpolate semantics so that
models/TTA match the reference numerically:

* bilinear, align_corners=False — half-pixel centers (same as
  jax.image.resize 'linear').
* bilinear, align_corners=True  — corner-aligned grid; implemented as a
  separable weighted gather (XLA turns it into two small matmuls, which is
  MXU-friendly on TPU).
* nearest — torch's legacy asymmetric rule src = floor(dst * in/out).
"""

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_2d", "resize_bilinear", "resize_nearest"]


def _linear_weights(in_size: int, out_size: int, align_corners: bool, dtype) -> np.ndarray:
    """[out_size, in_size] interpolation matrix for one axis (2 nonzeros per
    row), built with numpy so it folds into the program as a constant."""
    if out_size == in_size:
        return np.eye(in_size, dtype=dtype)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * ((in_size - 1) / (out_size - 1))
    elif align_corners:
        src = np.zeros((1,), dtype=np.float64)
    else:
        scale = in_size / out_size
        src = np.maximum((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = (src - i0).astype(np.float64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, i0), 1.0 - frac)
    np.add.at(w, (rows, i1), frac)
    return w.astype(dtype)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC tensor to (rows, cols), matching torch.

    Implemented as two small matmuls against constant interpolation matrices —
    on TPU this rides the MXU and measured ~1.5x faster end-to-end than a
    gather-based two-point lerp (jnp.take gathers lower poorly). fp32 inputs
    use HIGHEST matmul precision for exact torch parity; bf16 inputs keep the
    default full-rate MXU path.
    """
    n, h, w, c = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (out_h, out_w) == (h, w):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    wh = jnp.asarray(_linear_weights(h, out_h, align_corners, dtype))  # [out_h, h]
    ww = jnp.asarray(_linear_weights(w, out_w, align_corners, dtype))  # [out_w, w]
    # rows: contract over h -> [n, out_h, w, c]
    x = jnp.einsum("nhwc,oh->nowc", x, wh, precision=precision)
    # cols: contract over w -> [n, out_h, out_w, c]
    x = jnp.einsum("nhwc,ow->nhoc", x, ww, precision=precision)
    return x


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize (torch legacy rule: src = floor(dst*in/out))."""
    n, h, w, c = x.shape
    out_h, out_w = int(size[0]), int(size[1])
    if (out_h, out_w) == (h, w):
        return x
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def resize_2d(
    x: jnp.ndarray,
    size: Tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.interpolate equivalent for NHWC tensors."""
    if mode == "nearest":
        return resize_nearest(x, size)
    if mode in ("bilinear", "linear"):
        return resize_bilinear(x, size, align_corners=align_corners)
    if mode == "bicubic":
        return jax.image.resize(x, (x.shape[0], int(size[0]), int(size[1]), x.shape[3]), method="cubic")
    raise ValueError(f"Unsupported interpolation mode {mode}")
