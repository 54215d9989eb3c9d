"""Stacked Hourglass encoders (capability target:
modules/encoders/hourglass.py:26-312 — own flax implementation, NHWC).

Returns [stem@4] + one feature map per hourglass stack (all stride 4).
The supervised variant additionally returns intermediate supervision masks.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.functional import resize_nearest
from .common import EncoderBase

__all__ = ["StackedHGEncoder", "StackedSupervisedHGEncoder"]


class HGResidualBlock(nn.Module):
    out_channels: int
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        mid = self.out_channels // 2
        y = act(norm()(x))
        y = nn.Conv(mid, (1, 1), use_bias=False)(y)
        y = act(norm()(y))
        y = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False)(y)
        y = act(norm()(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        return y + x


class HGBlock(nn.Module):
    """Recursive hourglass: skip branch + (pool -> recurse -> upsample)."""

    depth: int
    features: int
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        up1 = HGResidualBlock(self.features, self.activation)(x, training=training)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = HGResidualBlock(self.features, self.activation)(low, training=training)
        if self.depth > 1:
            low = HGBlock(self.depth - 1, self.features, self.activation)(low, training=training)
        else:
            low = HGResidualBlock(self.features, self.activation)(low, training=training)
        low = HGResidualBlock(self.features, self.activation)(low, training=training)
        up2 = resize_nearest(low, up1.shape[1:3])
        return up1 + up2


class _HGStem(nn.Module):
    features: int
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = act(x)
        x = HGResidualBlock(128, self.activation)(x, training=training)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = HGResidualBlock(128, self.activation)(x, training=training)
        return HGResidualBlock(self.features, self.activation)(x, training=training)


class _HGFeatures(nn.Module):
    features: int
    blocks: int = 4
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)
        for _ in range(self.blocks):
            x = HGResidualBlock(self.features, self.activation)(x, training=training)
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        return act(x)


class StackedHGEncoder(EncoderBase):
    stack_level: int = 8
    depth: int = 4
    features: int = 256
    activation: str = ACT_RELU

    def get_output_spec(self) -> FeatureMapsSpec:
        n = self.stack_level + 1
        return FeatureMapsSpec((self.features,) * n, (4,) * n)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        x = _HGStem(self.features, self.activation)(x, training=training)
        outputs = [x]
        for i in range(self.stack_level):
            hg = HGBlock(self.depth, self.features, self.activation)(x, training=training)
            features = _HGFeatures(self.features, 4, self.activation)(hg, training=training)
            outputs.append(features)
            if i < self.stack_level - 1:
                x = x + nn.Conv(self.features, (1, 1))(features)
        return outputs


class StackedSupervisedHGEncoder(EncoderBase):
    """Stacked hourglass with intermediate supervision heads; returns
    (features, supervision_masks)."""

    supervision_channels: int = 1
    stack_level: int = 8
    depth: int = 4
    features: int = 256
    activation: str = ACT_RELU

    def get_output_spec(self) -> FeatureMapsSpec:
        n = self.stack_level + 1
        return FeatureMapsSpec((self.features,) * n, (4,) * n)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        x = _HGStem(self.features, self.activation)(x, training=training)
        outputs = [x]
        supervision = []
        for i in range(self.stack_level):
            hg = HGBlock(self.depth, self.features, self.activation)(x, training=training)
            features = _HGFeatures(self.features, 4, self.activation)(hg, training=training)
            outputs.append(features)
            if i < self.stack_level - 1:
                sup_mask = nn.Conv(self.supervision_channels, (1, 1))(features)
                sup_features = nn.Conv(self.features, (1, 1))(sup_mask)
                supervision.append(sup_mask)
                x = x + nn.Conv(self.features, (1, 1))(features) + sup_features
        return outputs, supervision
