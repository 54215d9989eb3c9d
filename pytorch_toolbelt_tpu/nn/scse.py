"""Squeeze & Excitation gates (arXiv:1803.02579; reference: modules/scse.py:13-106)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "ChannelGate2d",
    "SpatialGate2d",
    "ChannelSpatialGate2d",
    "SpatialGate2dV2",
    "ChannelSpatialGate2dV2",
]


class ChannelGate2d(nn.Module):
    """Channel squeeze: 1x1 conv to a single spatial gate map."""

    @nn.compact
    def __call__(self, x):
        gate = nn.Conv(1, (1, 1))(x)
        return x * jax.nn.sigmoid(gate)


class SpatialGate2d(nn.Module):
    """Spatial squeeze (classic SE): GAP -> bottleneck MLP -> channel gate."""

    reduction: int = None
    squeeze_channels: int = None

    @nn.compact
    def __call__(self, x):
        assert (self.reduction is None) != (self.squeeze_channels is None), (
            "One of 'reduction' and 'squeeze_channels' must be set"
        )
        channels = x.shape[-1]
        squeeze = self.squeeze_channels or max(1, channels // self.reduction)
        gate = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = nn.Conv(squeeze, (1, 1))(gate)
        gate = jax.nn.relu(gate)
        gate = nn.Conv(channels, (1, 1))(gate)
        return x * jax.nn.sigmoid(gate)


class ChannelSpatialGate2d(nn.Module):
    """Concurrent scSE: sum of channel and spatial gates."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        return ChannelGate2d()(x) + SpatialGate2d(reduction=self.reduction)(x)


class SpatialGate2dV2(nn.Module):
    """V2 with a dilated 7x7 conv in the bottleneck (reference scse.py:77-98)."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        squeeze = max(1, channels // self.reduction)
        g = nn.Conv(squeeze, (1, 1))(x)
        g = nn.Conv(squeeze, (7, 7), kernel_dilation=(3, 3), padding="SAME")(g)
        g = jax.nn.relu(g)
        g = nn.Conv(channels, (1, 1))(g)
        return x * jax.nn.sigmoid(g)


class ChannelSpatialGate2dV2(nn.Module):
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        return ChannelGate2d()(x) + SpatialGate2dV2(reduction=self.reduction)(x)
