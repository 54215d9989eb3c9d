"""Simple conv factories + Identity (reference: modules/simple.py, identity.py)."""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Identity", "conv1x1", "conv3x3"]


class Identity(nn.Module):
    """Pass-through module; accepts and ignores extra args like the reference."""

    def __call__(self, x, *args, **kwargs):
        return x


def conv1x1(out_channels: int, groups: int = 1, bias: bool = True) -> nn.Conv:
    """1x1 conv; bias zero-initialized (flax default), matching the reference's
    explicit zero bias init (simple.py:7-12)."""
    return nn.Conv(out_channels, kernel_size=(1, 1), feature_group_count=groups, use_bias=bias)


def conv3x3(out_channels: int, stride: int = 1, groups: int = 1, bias: bool = True) -> nn.Conv:
    """3x3 SAME conv (simple.py:14-18)."""
    return nn.Conv(
        out_channels,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding="SAME",
        feature_group_count=groups,
        use_bias=bias,
    )
