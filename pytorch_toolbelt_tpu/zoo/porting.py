"""Pretrained-weight porting: torch state-dicts -> flax parameter pytrees
(SURVEY.md hard part (e): OIHW->HWIO transposes, BN stat mapping).

The converter is mapping-driven: you provide (or auto-derive) a dict from
flax leaf paths to torch state-dict keys; tensors are transposed per kind:

* conv kernel         OIHW  -> HWIO
* depthwise conv      O1HW  -> HWO1 (flax grouped conv layout HWI'O)
* linear kernel       OI    -> IO
* norm scale/bias     copied; running stats -> batch_stats mean/var
"""

from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["convert_torch_tensor", "port_torch_state_dict"]


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_tensor(value, flax_leaf: jnp.ndarray, leaf_name: str) -> np.ndarray:
    """Convert a single torch tensor to the layout of the given flax leaf."""
    value = _to_numpy(value)
    target_shape = tuple(flax_leaf.shape)

    if value.shape == target_shape:
        return value

    if leaf_name == "kernel" and value.ndim == 4:
        # torch conv OIHW -> flax HWIO
        hwio = value.transpose(2, 3, 1, 0)
        if hwio.shape == target_shape:
            return hwio
        # depthwise/grouped: torch (O, I/g, H, W) -> flax (H, W, I/g, O)
        if hwio.shape[:2] == target_shape[:2] and hwio.shape[2] * hwio.shape[3] == target_shape[2] * target_shape[3]:
            return hwio.reshape(target_shape)
    if leaf_name == "kernel" and value.ndim == 2:
        io = value.transpose(1, 0)
        if io.shape == target_shape:
            return io

    raise ValueError(
        f"Cannot convert torch tensor of shape {value.shape} to flax leaf '{leaf_name}' of shape {target_shape}"
    )


def port_torch_state_dict(
    variables,
    state_dict: Mapping[str, "object"],
    mapping: Dict[Tuple[str, ...], str],
    strict: bool = True,
):
    """Copy torch weights into a flax variables pytree.

    Args:
        variables: flax variables ({'params': ..., 'batch_stats': ...}).
        state_dict: torch state dict (str -> tensor).
        mapping: {flax_path_tuple: torch_key}; flax paths are the key chains
            inside ``variables`` including the collection, e.g.
            ('params', 'Conv_0', 'kernel') or
            ('batch_stats', 'BatchNorm_0', 'mean').
        strict: raise if a mapped torch key is missing.

    Returns:
        New variables pytree with mapped leaves replaced.
    """
    flat = {
        tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(variables)
    }

    replacements = {}
    for flax_path, torch_key in mapping.items():
        flax_path = tuple(str(p) for p in flax_path)
        if flax_path not in flat:
            raise KeyError(f"Flax path {flax_path} not found in variables")
        if torch_key not in state_dict:
            if strict:
                raise KeyError(f"Torch key '{torch_key}' not found in state dict")
            continue
        replacements[flax_path] = convert_torch_tensor(
            state_dict[torch_key], flat[flax_path], flax_path[-1]
        )

    def replace(path, leaf):
        key = tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if key in replacements:
            return jnp.asarray(replacements[key], dtype=leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(replace, variables)
