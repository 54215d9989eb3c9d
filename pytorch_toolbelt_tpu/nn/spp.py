"""Atrous Spatial Pyramid Pooling (reference: modules/spp.py:10-124)."""

from typing import Tuple, Type, Union

import flax.linen as nn
import jax.numpy as jnp

from .activations import ACT_RELU, instantiate_activation_block
from .dsconv import DepthwiseSeparableConv2d
from .functional import resize_bilinear
from .normalization import Normalization

__all__ = ["ASPP", "ASPPModule", "SeparableASPPModule", "ASPPPooling"]


class ASPPModule(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=False,
        )(x)
        x = Normalization()(x, training=training)
        return instantiate_activation_block(self.activation)(x)


class SeparableASPPModule(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = DepthwiseSeparableConv2d(
            self.out_channels, kernel_size=self.kernel_size, dilation=self.dilation, bias=False
        )(x)
        x = Normalization()(x, training=training)
        return instantiate_activation_block(self.activation)(x)


class ASPPPooling(nn.Module):
    """Image-pooling branch: GAP -> 1x1 conv -> upsample back
    (reference spp.py:76-92)."""

    out_channels: int
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        size = x.shape[1:3]
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = nn.Conv(self.out_channels, (1, 1), use_bias=False)(p)
        p = Normalization()(p, training=training)
        p = instantiate_activation_block(self.activation)(p)
        return resize_bilinear(p, size, align_corners=False)


class ASPP(nn.Module):
    """Full ASPP head: dilated branches + pooling branch + projection
    (reference spp.py:95-124)."""

    out_channels: int
    atrous_rates: Tuple[int, ...] = (12, 24, 36)
    dropout: float = 0.5
    activation: str = ACT_RELU
    separable: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        module_cls = SeparableASPPModule if self.separable else ASPPModule
        res = [
            module_cls(self.out_channels, kernel_size=3, dilation=1, activation=self.activation)(
                x, training=training
            ),
            ASPPPooling(self.out_channels)(x, training=training),
        ]
        for ar in self.atrous_rates:
            res.append(
                module_cls(self.out_channels, kernel_size=3, dilation=ar)(x, training=training)
            )
        x = jnp.concatenate(res, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        x = Normalization()(x, training=training)
        x = instantiate_activation_block(self.activation)(x)
        return nn.Dropout(self.dropout, deterministic=not training)(x)
