"""Normalization registry (reference: pytorch_toolbelt/modules/normalization.py:11-35).

All spellings the reference accepts are accepted here.  2D/3D variants
collapse to the same implementation because flax norms act on channels-last
tensors of any rank.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Normalization", "instantiate_normalization_block", "NORM_BATCH", "NORM_INSTANCE", "NORM_GROUP"]

NORM_BATCH = "batch_norm"
NORM_INSTANCE = "instance_norm"
NORM_GROUP = "group_norm"

_BATCH_ALIASES = {
    "bn", "batch", "batch2d", "batch_norm", "batch_norm_2d", "batchnorm", "batchnorm2d",
    "bn3d", "batch3d", "batch_norm3d", "batch_norm_3d", "batchnorm3d",
}
_GROUP_ALIASES = {"gn", "group", "group_norm", "groupnorm"}
_INSTANCE_ALIASES = {
    "in", "instance", "instance2d", "instance_norm", "instancenorm", "instance_norm_2d",
    "instancenorm2d", "in3d", "instance3d", "instance_norm_3d", "instancenorm3d",
}


class Normalization(nn.Module):
    """Uniform wrapper so every block can call norm(x, training=...) without
    caring whether the underlying kind needs batch statistics."""

    kind: str = NORM_BATCH
    num_groups: Optional[int] = None  # for group norm
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        kind = self.kind.lower()
        if kind in _BATCH_ALIASES:
            return nn.BatchNorm(
                use_running_average=not training, epsilon=self.eps, momentum=self.momentum
            )(x)
        if kind in _GROUP_ALIASES:
            return nn.GroupNorm(num_groups=self.num_groups or 32, epsilon=self.eps)(x)
        if kind in _INSTANCE_ALIASES:
            # torch InstanceNorm default: no affine params
            return nn.InstanceNorm(epsilon=self.eps, use_bias=False, use_scale=False)(x)
        raise KeyError(f"Unknown normalization type '{self.kind}'")


def instantiate_normalization_block(normalization: str, in_channels: int = None, **kwargs) -> Normalization:
    """String factory matching the reference's accepted spellings.
    ``in_channels`` is accepted for API compatibility (flax infers it)."""
    return Normalization(kind=normalization, num_groups=kwargs.get("num_groups"))
