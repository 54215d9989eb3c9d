"""Array/pytree utilities (parity target: pytorch_toolbelt/utils/torch_utils.py).

Torch-tensor helpers translate to jax arrays / pytrees; HWC stays the native
layout (no CHW juggling on TPU).
"""

import math
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "count_parameters",
    "to_numpy",
    "to_tensor",
    "image_to_tensor",
    "tensor_from_rgb_image",
    "rgb_image_from_tensor",
    "mask_from_tensor",
    "transfer_weights",
    "describe_outputs",
    "resize_like",
    "logit",
    "sigmoid_with_threshold",
    "move_to_device",
    "container_to_tensor",
    "int_to_string_human_friendly",
]


def count_parameters(
    params, keys: Optional[List[str]] = None, human_friendly: bool = False
) -> Dict[str, Union[int, str]]:
    """Count parameters in a pytree: total plus per-top-level-key
    (reference torch_utils.py:101-141)."""

    def _count(tree) -> int:
        return sum(int(np.prod(leaf.shape)) for leaf in jax.tree_util.tree_leaves(tree))

    def _fmt(n: int):
        if not human_friendly:
            return n
        for divisor, unit in [(1e9, "G"), (1e6, "M"), (1e3, "K")]:
            if n >= divisor:
                return f"{n / divisor:.2f}{unit}"
        return str(n)

    total = {"total": _fmt(_count(params))}
    if isinstance(params, dict):
        wanted = keys if keys is not None else list(params.keys())
        for key in wanted:
            if key in params:
                total[key] = _fmt(_count(params[key]))
    return total


def to_numpy(x) -> np.ndarray:
    """Convert array-like (jax array, numpy, list, scalar) to numpy
    (reference torch_utils.py:144-165)."""
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, (jnp.ndarray, jax.Array)):
        return np.asarray(x)
    if isinstance(x, (list, tuple, int, float)):
        return np.array(x)
    raise ValueError("Unsupported type")


def to_tensor(x, dtype=None) -> jnp.ndarray:
    """Convert numpy/list/scalar to a jax array (reference torch_utils.py:168-185)."""
    arr = jnp.asarray(np.asarray(x))
    if dtype is not None:
        arr = arr.astype(dtype)
    return arr


def image_to_tensor(image: np.ndarray, dummy_channels_dim: bool = True) -> jnp.ndarray:
    """HWC uint8/float numpy image -> HWC jax array (channels-last native;
    the reference transposes to CHW, torch_utils.py:188-201 — unnecessary on
    TPU). Adds a trailing channel dim for 2D masks if requested."""
    if image.ndim == 2 and dummy_channels_dim:
        image = np.expand_dims(image, -1)
    return jnp.asarray(image)


tensor_from_rgb_image = image_to_tensor


def rgb_image_from_tensor(
    image: jnp.ndarray, mean=0.0, std=1.0, max_pixel_value: float = 255.0, dtype=np.uint8
) -> np.ndarray:
    """Denormalize [H, W, C] array back to a numpy image
    (reference torch_utils.py:204-228)."""
    image = np.asarray(image)
    rgb = (image * np.asarray(std) + np.asarray(mean)) * max_pixel_value
    return rgb.clip(0, max_pixel_value).astype(dtype)


def mask_from_tensor(mask: jnp.ndarray, squeeze_single_channel: bool = False, dtype=None) -> np.ndarray:
    mask = np.asarray(mask)
    if squeeze_single_channel and mask.ndim == 3 and mask.shape[-1] == 1:
        mask = mask[..., 0]
    if dtype is not None:
        mask = mask.astype(dtype)
    return mask


def transfer_weights(target_params, source_params, verbose: bool = False):
    """Shape-tolerant parameter transfer: copy every leaf from source whose
    path exists in target with a matching shape (reference
    torch_utils.py:290-341 state-dict surgery, pytree-style).

    Returns (new_params, transferred_paths, skipped_paths).
    """
    src_leaves = {
        tuple(str(k) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(source_params)
    }

    transferred, skipped = [], []

    def maybe_copy(path, leaf):
        key = tuple(str(k) for k in path)
        if key in src_leaves and src_leaves[key].shape == leaf.shape:
            transferred.append(key)
            return jnp.asarray(src_leaves[key], dtype=leaf.dtype)
        skipped.append(key)
        return leaf

    new_params = jax.tree_util.tree_map_with_path(maybe_copy, target_params)
    if verbose:
        print(f"Transferred {len(transferred)} tensors, skipped {len(skipped)}")
    return new_params, transferred, skipped


def describe_outputs(outputs) -> Union[Dict, List, Any]:
    """Shape/min/mean/max summary of nested outputs
    (reference torch_utils.py:382-413)."""
    if isinstance(outputs, (jnp.ndarray, jax.Array, np.ndarray)):
        x = np.asarray(outputs)
        return {
            "shape": tuple(x.shape),
            "dtype": str(x.dtype),
            "min": float(x.min()) if x.size else None,
            "max": float(x.max()) if x.size else None,
            "mean": float(x.mean()) if x.size and np.issubdtype(x.dtype, np.floating) else None,
        }
    if isinstance(outputs, dict):
        return {k: describe_outputs(v) for k, v in outputs.items()}
    if isinstance(outputs, (list, tuple)):
        return [describe_outputs(v) for v in outputs]
    return repr(outputs)


def resize_like(x: jnp.ndarray, target: jnp.ndarray, mode: str = "bilinear", align_corners: bool = False):
    """Resize NHWC x to target's spatial size (reference torch_utils.py:364-379)."""
    from ..nn.functional import resize_2d

    return resize_2d(x, target.shape[1:3], mode=mode, align_corners=align_corners)


def logit(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


def sigmoid_with_threshold(x: jnp.ndarray, threshold: float = 0.5, dtype=jnp.float32) -> jnp.ndarray:
    return (jax.nn.sigmoid(x) > threshold).astype(dtype)


def move_to_device(x, device, non_blocking: bool = False):
    """Recursively device_put nested containers (reference torch_utils.py:344-361)."""
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, device), x)


def container_to_tensor(value):
    """Recursively convert numeric numpy arrays inside lists/tuples/mappings
    to jax arrays; non-numeric leaves (strings, objects) pass through
    (reference torch_utils.py:188-205)."""
    if isinstance(value, jnp.ndarray):
        return value
    if isinstance(value, np.ndarray) and value.dtype.kind not in {"O", "M", "U", "S"}:
        return jnp.asarray(value)
    if isinstance(value, list):
        return [container_to_tensor(item) for item in value]
    if isinstance(value, tuple):
        return tuple(container_to_tensor(item) for item in value)
    if isinstance(value, dict):
        return {key: container_to_tensor(item) for key, item in value.items()}
    return value


def int_to_string_human_friendly(value: int) -> str:
    """1234 -> '1.23K', 2_500_000 -> '2.50M', ... (reference
    torch_utils.py:130-141, same thresholds and formats)."""
    if value < 1_000:
        return str(value)
    if value < 1_000_000:
        return f"{value / 1e3:.2f}K"
    if value < 10_000_000:
        return f"{value / 1e6:.2f}M"
    if value < 1_000_000_000:
        return f"{value / 1e6:.1f}M"
    return f"{value / 1e9:.2f}B"


def softmax_over(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax helper (reference torch_utils dim helpers)."""
    return jax.nn.softmax(x, axis=axis)


def argmax_over(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Argmax helper (reference torch_utils dim helpers)."""
    return jnp.argmax(x, axis=axis)
