"""Geometric primitives, padding helpers and probability means for NHWC
tensors (parity target: pytorch_toolbelt/inference/functional.py:38-333).

The reference operates on NCHW with spatial dims (2, 3); here images are
NHWC with spatial dims (1, 2).  Function names keep the reference spelling
(minus the torch_ prefix) so the TTA symmetry-table code reads identically.
"""

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "geometric_mean",
    "harmonic_mean",
    "harmonic1p_mean",
    "logodd_mean",
    "log1p_mean",
    "pad_image_tensor",
    "pad_tensor_to_size",
    "unpad_image_tensor",
    "unpad_xyxy_bboxes",
    "image_fliplr",
    "image_flipud",
    "image_none",
    "image_rot180",
    "image_rot90_ccw",
    "image_rot90_ccw_transpose",
    "image_rot90_cw",
    "image_rot90_cw_transpose",
    "image_rot180_transpose",
    "image_transpose",
    "image_transpose_rot90_ccw",
    "image_transpose_rot90_cw",
    "image_transpose_rot180",
]


# ---------------------------------------------------------------------------
# D4 geometric primitives (NHWC; reference functional.py:38-145)
# ---------------------------------------------------------------------------


def image_none(x: jnp.ndarray) -> jnp.ndarray:
    return x


def image_rot90_ccw(x: jnp.ndarray) -> jnp.ndarray:
    """Counter-clockwise 90 deg in the reference's convention
    (torch rot90 k=1 over (H, W))."""
    return jnp.rot90(x, k=1, axes=(1, 2))


def image_rot90_cw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.rot90(x, k=-1, axes=(1, 2))


def image_rot180(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.rot90(x, k=2, axes=(1, 2))


def image_fliplr(x: jnp.ndarray) -> jnp.ndarray:
    """Flip along width (reference torch_fliplr flips dim 3)."""
    return jnp.flip(x, axis=2)


def image_flipud(x: jnp.ndarray) -> jnp.ndarray:
    """Flip along height (reference torch_flipud flips dim 2)."""
    return jnp.flip(x, axis=1)


def image_transpose(x: jnp.ndarray) -> jnp.ndarray:
    """Transpose over the main image diagonal."""
    return jnp.swapaxes(x, 1, 2)


def image_rot90_ccw_transpose(x: jnp.ndarray) -> jnp.ndarray:
    return image_transpose(image_rot90_ccw(x))


def image_rot90_cw_transpose(x: jnp.ndarray) -> jnp.ndarray:
    return image_transpose(image_rot90_cw(x))


def image_rot180_transpose(x: jnp.ndarray) -> jnp.ndarray:
    return image_transpose(image_rot180(x))


def image_transpose_rot90_ccw(x: jnp.ndarray) -> jnp.ndarray:
    return image_rot90_ccw(image_transpose(x))


def image_transpose_rot90_cw(x: jnp.ndarray) -> jnp.ndarray:
    return image_rot90_cw(image_transpose(x))


def image_transpose_rot180(x: jnp.ndarray) -> jnp.ndarray:
    return image_rot180(image_transpose(x))


# ---------------------------------------------------------------------------
# Padding (reference functional.py:148-247)
# ---------------------------------------------------------------------------


def pad_tensor_to_size(
    x: jnp.ndarray, size: Sequence[int], mode: str = "constant", value: float = 0
) -> Tuple[jnp.ndarray, Tuple[slice, ...]]:
    """Pad trailing-spatial NHWC-like tensor [B, *spatial, C] to ``size``
    (centered). Returns (padded, crop_slices) where crop_slices invert the pad.

    NOTE: spatial dims are axes 1..ndim-2 here (channels last), unlike the
    reference's axes 2..ndim-1.
    """
    num_spatial = len(size)
    if num_spatial != x.ndim - 2:
        raise ValueError(f"Expected {num_spatial} spatial dimensions, got {x.ndim - 2}")

    spatial = x.shape[1 : 1 + num_spatial]
    before_after = []
    crop = [slice(None)]
    for target, current in zip(size, spatial):
        pad_total = target - current
        before = pad_total // 2
        after = pad_total - before
        before_after.append((before, after))
        crop.append(slice(before, before + current))
    crop.append(slice(None))

    pad_width = [(0, 0)] + before_after + [(0, 0)]
    mode_map = {"constant": "constant", "reflect": "reflect", "replicate": "edge"}
    if mode == "constant":
        x = jnp.pad(x, pad_width, mode="constant", constant_values=value)
    else:
        x = jnp.pad(x, pad_width, mode=mode_map[mode])
    return x, tuple(crop)


def pad_image_tensor(
    image_tensor: jnp.ndarray, pad_size: Union[int, Tuple[int, int]] = 32
) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Pad NHWC tensor so H and W are divisible by pad_size.
    Returns (padded, (pad_left, pad_right, pad_top, pad_btm))."""
    if image_tensor.ndim != 4:
        raise ValueError("Tensor must have rank 4 ([B,H,W,C])")
    rows, cols = image_tensor.shape[1], image_tensor.shape[2]
    if isinstance(pad_size, (tuple, list)):
        pad_height, pad_width = int(pad_size[0]), int(pad_size[1])
    elif isinstance(pad_size, int):
        pad_height = pad_width = pad_size
    else:
        raise ValueError(f"Unsupported pad_size: {pad_size}")

    if rows > pad_height:
        pad_rows = rows % pad_height
        pad_rows = pad_height - pad_rows if pad_rows > 0 else 0
    else:
        pad_rows = pad_height - rows
    if cols > pad_width:
        pad_cols = cols % pad_width
        pad_cols = pad_width - pad_cols if pad_cols > 0 else 0
    else:
        pad_cols = pad_width - cols

    if pad_rows == 0 and pad_cols == 0:
        return image_tensor, (0, 0, 0, 0)

    pad_top = pad_rows // 2
    pad_btm = pad_rows - pad_top
    pad_left = pad_cols // 2
    pad_right = pad_cols - pad_left

    image_tensor = jnp.pad(
        image_tensor, ((0, 0), (pad_top, pad_btm), (pad_left, pad_right), (0, 0))
    )
    return image_tensor, (pad_left, pad_right, pad_top, pad_btm)


def unpad_image_tensor(image_tensor: jnp.ndarray, pad) -> jnp.ndarray:
    if image_tensor.ndim != 4:
        raise ValueError("Tensor must have rank 4 ([B,H,W,C])")
    pad_left, pad_right, pad_top, pad_btm = pad
    rows, cols = image_tensor.shape[1], image_tensor.shape[2]
    return image_tensor[:, pad_top : rows - pad_btm, pad_left : cols - pad_right, :]


def unpad_xyxy_bboxes(bboxes_tensor: jnp.ndarray, pad, dim: int = -1) -> jnp.ndarray:
    """Shift xyxy boxes back after unpadding (reference functional.py:236-247)."""
    pad_left, pad_right, pad_top, pad_btm = pad
    offsets = jnp.asarray([pad_left, pad_top, pad_left, pad_top], dtype=bboxes_tensor.dtype)
    if dim < 0:
        dim = bboxes_tensor.ndim + dim
    shape = [1] * bboxes_tensor.ndim
    shape[dim] = 4
    return bboxes_tensor - offsets.reshape(shape)


# ---------------------------------------------------------------------------
# Probability means (reference functional.py:250-333)
# ---------------------------------------------------------------------------


def geometric_mean(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """exp(mean(log(x))) — assumes probabilities in (0, 1)."""
    return jnp.exp(jnp.mean(jnp.log(x), axis=axis))


def harmonic_mean(x: jnp.ndarray, axis: int, eps: float = 1e-6) -> jnp.ndarray:
    x = 1.0 / jnp.maximum(x, eps)
    x = jnp.mean(x, axis=axis)
    return 1.0 / jnp.maximum(x, eps)


def harmonic1p_mean(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    x = 1.0 / (x + 1)
    x = jnp.mean(x, axis=axis)
    return 1.0 / x - 1


def logodd_mean(x: jnp.ndarray, axis: int, eps: float = 1e-6) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1.0 - eps)
    x = jnp.log(x / (1 - x))
    x = jnp.mean(x, axis=axis)
    return jnp.exp(x) / (1 + jnp.exp(x))


def log1p_mean(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    x = jnp.log1p(x)
    x = jnp.mean(x, axis=axis)
    return jnp.exp(x) - 1
