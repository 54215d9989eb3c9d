"""DenseNet encoders (capability target: modules/encoders/densenet.py:13-118
— torchvision-backed in the reference; own flax implementation, NHWC).

Returns [stem(2), block1(4), block2(8), block3(16), block4(32)]; subsets
selectable via ``layers`` like every encoder here.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = [
    "DenseNetEncoder",
    "densenet121_encoder",
    "densenet161_encoder",
    "densenet169_encoder",
    "densenet201_encoder",
]


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = nn.BatchNorm(use_running_average=not training)(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not training)(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        for _ in range(self.num_layers):
            x = DenseLayer(self.growth_rate)(x, training=training)
        return x


class Transition(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetEncoder(EncoderBase):
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    layers: Optional[Tuple[int, ...]] = None

    def _feature_channels(self) -> Tuple[int, ...]:
        channels = [self.num_init_features]
        c = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            c = c + num_layers * self.growth_rate
            channels.append(c)
            if i != len(self.block_config) - 1:
                c = c // 2
        return tuple(channels)

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = self._feature_channels()
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        outputs.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(num_layers, self.growth_rate)(x, training=training)
            outputs.append(x)
            if i != len(self.block_config) - 1:
                x = Transition(x.shape[-1] // 2)(x, training=training)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def densenet121_encoder(**kwargs) -> DenseNetEncoder:
    return DenseNetEncoder(block_config=(6, 12, 24, 16), growth_rate=32, num_init_features=64, **kwargs)


def densenet161_encoder(**kwargs) -> DenseNetEncoder:
    return DenseNetEncoder(block_config=(6, 12, 36, 24), growth_rate=48, num_init_features=96, **kwargs)


def densenet169_encoder(**kwargs) -> DenseNetEncoder:
    return DenseNetEncoder(block_config=(6, 12, 32, 32), growth_rate=32, num_init_features=64, **kwargs)


def densenet201_encoder(**kwargs) -> DenseNetEncoder:
    return DenseNetEncoder(block_config=(6, 12, 48, 32), growth_rate=32, num_init_features=64, **kwargs)
