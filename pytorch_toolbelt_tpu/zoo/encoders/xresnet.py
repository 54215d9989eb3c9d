"""XResNet / SE-XResNet encoders (bag-of-tricks ResNet, arXiv:1812.01187;
capability target: modules/encoders/xresnet.py:53-251).

Tricks kept from the reference: 3-conv stem (8 -> 64 -> 64, first stride 2),
zero-init of the last BN scale in each residual branch, avg-pool + 1x1 conv
identity path on stride-2 blocks.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.scse import ChannelSpatialGate2d
from .common import EncoderBase

__all__ = [
    "XResNetEncoder",
    "xresnet18_encoder",
    "xresnet34_encoder",
    "xresnet50_encoder",
    "xresnet101_encoder",
    "xresnet152_encoder",
    "se_xresnet18_encoder",
    "se_xresnet34_encoder",
    "se_xresnet50_encoder",
    "se_xresnet101_encoder",
    "se_xresnet152_encoder",
]


class _ConvBN(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    zero_bn: bool = False
    activation: Optional[str] = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=False,
        )(x)
        scale_init = nn.initializers.zeros if self.zero_bn else nn.initializers.ones
        x = nn.BatchNorm(use_running_average=not training, scale_init=scale_init)(x)
        if self.activation is not None:
            x = instantiate_activation_block(self.activation)(x)
        return x


class XResNetBlock(nn.Module):
    expansion: int
    n_hidden: int
    stride: int = 1
    activation: str = ACT_RELU
    use_se: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        n_filters = self.n_hidden * self.expansion
        act = instantiate_activation_block(self.activation)

        if self.expansion == 1:
            y = _ConvBN(self.n_hidden, 3, self.stride, activation=self.activation)(x, training=training)
            y = _ConvBN(n_filters, 3, zero_bn=True, activation=None)(y, training=training)
        else:
            y = _ConvBN(self.n_hidden, 1, activation=self.activation)(x, training=training)
            y = _ConvBN(self.n_hidden, 3, self.stride, activation=self.activation)(y, training=training)
            y = _ConvBN(n_filters, 1, zero_bn=True, activation=None)(y, training=training)

        if self.use_se:
            y = ChannelSpatialGate2d(reduction=4)(y)

        identity = x
        if self.stride != 1:
            identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
        if identity.shape[-1] != n_filters:
            identity = _ConvBN(n_filters, 1, activation=None)(identity, training=training)
        return act(y + identity)


class XResNetEncoder(EncoderBase):
    expansion: int = 1
    blocks: Tuple[int, ...] = (2, 2, 2, 2)
    activation: str = ACT_RELU
    use_se: bool = False
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        e = self.expansion
        channels = (64, 64 * e, 128 * e, 256 * e, 512 * e)
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        # bag-of-tricks stem
        x = _ConvBN(8, 3, 2, activation=self.activation)(x, training=training)
        x = _ConvBN(64, 3, activation=self.activation)(x, training=training)
        x = _ConvBN(64, 3, activation=self.activation)(x, training=training)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        n_hidden = (64, 128, 256, 512)
        for stage, (num_blocks, hidden) in enumerate(zip(self.blocks, n_hidden)):
            for i in range(num_blocks):
                x = XResNetBlock(
                    expansion=self.expansion,
                    n_hidden=hidden,
                    stride=(1 if stage == 0 or i > 0 else 2),
                    activation=self.activation,
                    use_se=self.use_se,
                )(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def xresnet18_encoder(**kwargs):
    return XResNetEncoder(expansion=1, blocks=(2, 2, 2, 2), **kwargs)


def xresnet34_encoder(**kwargs):
    return XResNetEncoder(expansion=1, blocks=(3, 4, 6, 3), **kwargs)


def xresnet50_encoder(**kwargs):
    return XResNetEncoder(expansion=4, blocks=(3, 4, 6, 3), **kwargs)


def xresnet101_encoder(**kwargs):
    return XResNetEncoder(expansion=4, blocks=(3, 4, 23, 3), **kwargs)


def xresnet152_encoder(**kwargs):
    return XResNetEncoder(expansion=4, blocks=(3, 8, 36, 3), **kwargs)


def se_xresnet18_encoder(**kwargs):
    return XResNetEncoder(expansion=1, blocks=(2, 2, 2, 2), use_se=True, **kwargs)


def se_xresnet34_encoder(**kwargs):
    return XResNetEncoder(expansion=1, blocks=(3, 4, 6, 3), use_se=True, **kwargs)


def se_xresnet50_encoder(**kwargs):
    return XResNetEncoder(expansion=4, blocks=(3, 4, 6, 3), use_se=True, **kwargs)


def se_xresnet101_encoder(**kwargs):
    return XResNetEncoder(expansion=4, blocks=(3, 4, 23, 3), use_se=True, **kwargs)


def se_xresnet152_encoder(**kwargs):
    return XResNetEncoder(expansion=4, blocks=(3, 8, 36, 3), use_se=True, **kwargs)
