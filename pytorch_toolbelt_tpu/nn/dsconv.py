"""Depthwise-separable convolutions (reference: modules/dsconv.py:9-66)."""

import flax.linen as nn

from .activations import instantiate_activation_block
from .normalization import NORM_BATCH, Normalization

__all__ = ["DepthwiseSeparableConv2d", "DepthwiseSeparableConv2dBlock"]


class DepthwiseSeparableConv2d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        x = nn.Conv(
            in_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            feature_group_count=in_channels,
            use_bias=self.bias,
        )(x)
        x = nn.Conv(self.out_channels, (1, 1), feature_group_count=self.groups, use_bias=self.bias)(x)
        return x


class DepthwiseSeparableConv2dBlock(nn.Module):
    out_channels: int
    activation: str
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    normalization: str = NORM_BATCH

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = DepthwiseSeparableConv2d(
            self.out_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            bias=False,
        )(x)
        x = Normalization(self.normalization)(x, training=training)
        return instantiate_activation_block(self.activation)(x)
