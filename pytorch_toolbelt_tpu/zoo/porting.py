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

__all__ = [
    "convert_torch_tensor",
    "port_torch_state_dict",
    "bn_mapping",
    "conv_mapping",
    "mobilenet_v2_mapping",
]


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
        # Depthwise ONLY: torch (C*mult, 1, H, W) -> flax (H, W, 1, C*mult) or
        # (H, W, C, mult).  A reshape is a layout-preserving regrouping only
        # when one of the channel extents is 1; for general grouped kernels or
        # ConvTranspose (I, O, kH, kW) a reshape would silently scramble
        # weights, so refuse and make the caller supply an explicit layout.
        depthwise = hwio.shape[2] == 1 or target_shape[2] == 1 or (len(target_shape) == 4 and target_shape[3] == 1)
        if (
            depthwise
            and hwio.shape[:2] == target_shape[:2]
            and hwio.shape[2] * hwio.shape[3] == target_shape[2] * target_shape[3]
        ):
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


# ---------------------------------------------------------------------------
# Mapping builders for the reference's vendored backbones
# (modules/backbone/{mobilenet,senet,inceptionv4,wider_resnet}.py). These let
# real torch checkpoints drop into our flax encoders and back the
# architecture-fidelity parity tests.
# ---------------------------------------------------------------------------


def conv_mapping(flax_prefix: Tuple[str, ...], torch_prefix: str, bias: bool = False) -> Dict:
    """{flax_path: torch_key} entries for one conv layer."""
    m = {("params",) + flax_prefix + ("kernel",): f"{torch_prefix}.weight"}
    if bias:
        m[("params",) + flax_prefix + ("bias",)] = f"{torch_prefix}.bias"
    return m


def bn_mapping(flax_prefix: Tuple[str, ...], torch_prefix: str) -> Dict:
    """{flax_path: torch_key} entries for one BatchNorm layer (affine +
    running stats)."""
    return {
        ("params",) + flax_prefix + ("scale",): f"{torch_prefix}.weight",
        ("params",) + flax_prefix + ("bias",): f"{torch_prefix}.bias",
        ("batch_stats",) + flax_prefix + ("mean",): f"{torch_prefix}.running_mean",
        ("batch_stats",) + flax_prefix + ("var",): f"{torch_prefix}.running_var",
    }


def mobilenet_v2_mapping() -> Dict[Tuple[str, ...], str]:
    """Flax MobileNetV2Encoder <- vendored torch MobileNetV2 state dict
    (reference modules/backbone/mobilenet.py:18-101)."""
    from .encoders.mobilenet import _V2_CONFIG

    m = {}
    m.update(conv_mapping(("Conv_0",), "layer0.0"))
    m.update(bn_mapping(("BatchNorm_0",), "layer0.1"))
    block = 0
    for layer_index, (t, c, n, s) in enumerate(_V2_CONFIG):
        for i in range(n):
            fp = f"InvertedResidual_{block}"
            tp = f"layer{layer_index + 1}.{i}.conv"
            if t == 1:  # dw, bn, act, pw-linear, bn
                m.update(conv_mapping((fp, "Conv_0"), f"{tp}.0"))
                m.update(bn_mapping((fp, "BatchNorm_0"), f"{tp}.1"))
                m.update(conv_mapping((fp, "Conv_1"), f"{tp}.3"))
                m.update(bn_mapping((fp, "BatchNorm_1"), f"{tp}.4"))
            else:  # pw, bn, act, dw, bn, act, pw-linear, bn
                m.update(conv_mapping((fp, "Conv_0"), f"{tp}.0"))
                m.update(bn_mapping((fp, "BatchNorm_0"), f"{tp}.1"))
                m.update(conv_mapping((fp, "Conv_1"), f"{tp}.3"))
                m.update(bn_mapping((fp, "BatchNorm_1"), f"{tp}.4"))
                m.update(conv_mapping((fp, "Conv_2"), f"{tp}.6"))
                m.update(bn_mapping((fp, "BatchNorm_2"), f"{tp}.7"))
            block += 1
    return m
