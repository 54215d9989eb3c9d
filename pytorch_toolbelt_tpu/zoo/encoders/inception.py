"""Inception V4 encoder (arXiv:1602.07261; capability target:
modules/encoders/inception.py:7-42 + modules/backbone/inceptionv4.py —
own flax implementation, NHWC, SAME padding so strides are exact
(2, 4, 8, 16, 32) instead of the reference's "approximate" ones).

Channels per level: (64, 192, 384, 1024, 1536) like the reference.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = ["InceptionV4Encoder", "inception_v4_encoder"]


class ConvBN(nn.Module):
    out_channels: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=(self.stride, self.stride),
            padding="SAME", use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        b0 = ConvBN(96, (1, 1))(x, training=training)
        b1 = ConvBN(64, (1, 1))(x, training=training)
        b1 = ConvBN(96, (3, 3))(b1, training=training)
        b2 = ConvBN(64, (1, 1))(x, training=training)
        b2 = ConvBN(96, (3, 3))(b2, training=training)
        b2 = ConvBN(96, (3, 3))(b2, training=training)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = ConvBN(96, (1, 1))(b3, training=training)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 384


class ReductionA(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        b0 = ConvBN(384, (3, 3), stride=2)(x, training=training)
        b1 = ConvBN(192, (1, 1))(x, training=training)
        b1 = ConvBN(224, (3, 3))(b1, training=training)
        b1 = ConvBN(256, (3, 3), stride=2)(b1, training=training)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1024


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        b0 = ConvBN(384, (1, 1))(x, training=training)
        b1 = ConvBN(192, (1, 1))(x, training=training)
        b1 = ConvBN(224, (1, 7))(b1, training=training)
        b1 = ConvBN(256, (7, 1))(b1, training=training)
        b2 = ConvBN(192, (1, 1))(x, training=training)
        b2 = ConvBN(192, (7, 1))(b2, training=training)
        b2 = ConvBN(224, (1, 7))(b2, training=training)
        b2 = ConvBN(224, (7, 1))(b2, training=training)
        b2 = ConvBN(256, (1, 7))(b2, training=training)
        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = ConvBN(128, (1, 1))(b3, training=training)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 1024


class ReductionB(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        b0 = ConvBN(192, (1, 1))(x, training=training)
        b0 = ConvBN(192, (3, 3), stride=2)(b0, training=training)
        b1 = ConvBN(256, (1, 1))(x, training=training)
        b1 = ConvBN(256, (1, 7))(b1, training=training)
        b1 = ConvBN(320, (7, 1))(b1, training=training)
        b1 = ConvBN(320, (3, 3), stride=2)(b1, training=training)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1536


class InceptionC(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        b0 = ConvBN(256, (1, 1))(x, training=training)

        b1 = ConvBN(384, (1, 1))(x, training=training)
        b1a = ConvBN(256, (1, 3))(b1, training=training)
        b1b = ConvBN(256, (3, 1))(b1, training=training)

        b2 = ConvBN(384, (1, 1))(x, training=training)
        b2 = ConvBN(448, (3, 1))(b2, training=training)
        b2 = ConvBN(512, (1, 3))(b2, training=training)
        b2a = ConvBN(256, (1, 3))(b2, training=training)
        b2b = ConvBN(256, (3, 1))(b2, training=training)

        b3 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b3 = ConvBN(256, (1, 1))(b3, training=training)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)  # 1536


class InceptionV4Encoder(EncoderBase):
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (64, 192, 384, 1024, 1536)
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        # stem part 1 -> stride 2, 64ch
        x = ConvBN(32, (3, 3), stride=2)(x, training=training)
        x = ConvBN(32, (3, 3))(x, training=training)
        x = ConvBN(64, (3, 3))(x, training=training)
        outputs.append(x)

        # mixed 3a + 4a -> stride 4, 192ch
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        c = ConvBN(96, (3, 3), stride=2)(x, training=training)
        x = jnp.concatenate([p, c], axis=-1)  # 160
        b0 = ConvBN(64, (1, 1))(x, training=training)
        b0 = ConvBN(96, (3, 3))(b0, training=training)
        b1 = ConvBN(64, (1, 1))(x, training=training)
        b1 = ConvBN(64, (1, 7))(b1, training=training)
        b1 = ConvBN(64, (7, 1))(b1, training=training)
        b1 = ConvBN(96, (3, 3))(b1, training=training)
        x = jnp.concatenate([b0, b1], axis=-1)  # 192
        outputs.append(x)

        # mixed 5a -> stride 8, then Inception-A x4 (384ch)
        c = ConvBN(192, (3, 3), stride=2)(x, training=training)
        p = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = jnp.concatenate([c, p], axis=-1)  # 384
        for _ in range(4):
            x = InceptionA()(x, training=training)
        outputs.append(x)

        # Reduction-A -> stride 16, Inception-B x7 (1024ch)
        x = ReductionA()(x, training=training)
        for _ in range(7):
            x = InceptionB()(x, training=training)
        outputs.append(x)

        # Reduction-B -> stride 32, Inception-C x3 (1536ch)
        x = ReductionB()(x, training=training)
        for _ in range(3):
            x = InceptionC()(x, training=training)
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def inception_v4_encoder(**kwargs) -> InceptionV4Encoder:
    return InceptionV4Encoder(**kwargs)
