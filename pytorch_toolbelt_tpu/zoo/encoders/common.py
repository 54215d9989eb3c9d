"""Encoder machinery (reference: modules/encoders/common.py:23-152).

Encoders are flax modules whose ``__call__`` returns a list of NHWC feature
maps ordered fine -> coarse, and which expose ``get_output_spec()`` computed
statically from the module config (no forward pass needed).

``change_input_channels`` in the reference rebuilds the stem conv in-place
(common.py:44-84).  Functionally in JAX this is parameter surgery: we tile
the HWIO stem kernel along the input-channel axis.
"""

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec

__all__ = [
    "EncoderBase",
    "_take",
    "find_stem_kernel_path",
    "make_n_channel_input_kernel",
    "change_stem_input_channels",
]


def _take(elements: Sequence[Any], indexes: Sequence[int]) -> List[Any]:
    return [elements[i] for i in indexes]


class EncoderBase(nn.Module):
    """Base class for encoders: list-of-feature-maps contract."""

    def get_output_spec(self) -> FeatureMapsSpec:
        raise NotImplementedError

    @property
    def channels(self) -> Tuple[int, ...]:
        return self.get_output_spec().channels

    @property
    def strides(self) -> Tuple[int, ...]:
        return self.get_output_spec().strides


def make_n_channel_input_kernel(kernel: jnp.ndarray, in_channels: int) -> jnp.ndarray:
    """Tile/slice an HWIO conv kernel to accept ``in_channels`` inputs,
    reproducing the reference's weight-tiling surgery (common.py:44-84)."""
    h, w, i, o = kernel.shape
    if i == in_channels:
        return kernel
    if in_channels > i:
        n = -(-in_channels // i)  # ceil
        kernel = jnp.concatenate([kernel] * n, axis=2)
    return kernel[:, :, :in_channels, :]


def find_stem_kernel_path(variables, in_channels: int = 3) -> Tuple[str, ...]:
    """Locate the stem conv kernel inside a flax variables tree: the first
    4-D ``kernel`` leaf (HWIO) in traversal order whose input extent equals
    ``in_channels``.  Works for plain Conv stems, same-padded stems (padding
    is a module attribute in flax, not a weight property) and
    weight-standardized stems (NFNet ScaledWSConv — standardization happens
    at call time, so only the raw kernel needs surgery).

    The reference's per-encoder ``change_input_channels`` overrides
    (modules/encoders/common.py:44-84, timm/common.py:41) hand-pick the stem
    module; the flax tree makes it discoverable instead.
    """

    def walk(node, path):
        for key, value in node.items():
            if isinstance(value, dict) or hasattr(value, "items"):
                found = walk(value, path + (key,))
                if found is not None:
                    return found
            elif key == "kernel" and getattr(value, "ndim", 0) == 4 and value.shape[2] == in_channels:
                return path + (key,)
        return None

    found = walk(variables["params"], ())
    if found is None:
        raise ValueError(f"No 4-D conv kernel with {in_channels} input channels found in variables")
    return found


def change_stem_input_channels(variables, stem_kernel_path: Optional[Sequence[str]], in_channels: int):
    """Return a new variables pytree whose stem conv kernel accepts
    ``in_channels`` input channels.

    Args:
        variables: flax variables dict ({'params': {...}, ...}).
        stem_kernel_path: key path to the kernel inside variables['params'],
            e.g. ('layer0', 'Conv_0', 'kernel'); ``None`` auto-discovers the
            stem via :func:`find_stem_kernel_path` (assuming a 3-channel stem).
    """
    import flax

    if stem_kernel_path is None:
        stem_kernel_path = find_stem_kernel_path(variables)
    params = flax.core.unfreeze(variables["params"]) if hasattr(flax.core, "unfreeze") else dict(variables["params"])
    node = params
    for key in stem_kernel_path[:-1]:
        node[key] = dict(node[key])
        node = node[key]
    node[stem_kernel_path[-1]] = make_n_channel_input_kernel(node[stem_kernel_path[-1]], in_channels)
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars


class GenericEncoder(EncoderBase):
    """Wrap any feature-extractor module into the encoder contract — the
    analogue of the reference's GenericTimmEncoder (timm/common.py:13-39),
    which adapted arbitrary timm backbones via their feature_info.

    Args:
        backbone: a flax module whose __call__(x, training=...) returns a
            list of NHWC feature maps fine -> coarse.
        spec: the FeatureMapsSpec describing those maps.
    """

    backbone: Any = None
    spec: "FeatureMapsSpec" = None

    def get_output_spec(self) -> FeatureMapsSpec:
        return self.spec

    def __call__(self, x, training: bool = False):
        return self.backbone(x, training=training)
