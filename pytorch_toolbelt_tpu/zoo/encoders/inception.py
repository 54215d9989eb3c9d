"""Inception V4 encoder (arXiv:1602.07261; capability target:
modules/encoders/inception.py:7-42 + modules/backbone/inceptionv4.py —
own flax implementation, NHWC).

Two padding regimes:

* default (``torch_compat=False``): SAME padding everywhere so output strides
  are exact (2, 4, 8, 16, 32) and any divisible-by-32 input works — the
  TPU-friendly choice for segmentation encoders.
* ``torch_compat=True``: reproduces the Cadene backbone exactly — VALID
  stem/reduction convs+pools (the reference's "approximate" strides,
  inceptionv4.py:262-285), count_include_pad=False average pools, BN
  eps=0.001 — so torch checkpoints port bit-for-bit
  (zoo/porting.py inception_v4_mapping).

Channels per level: (64, 192, 384, 1024, 1536) like the reference.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = ["InceptionV4Encoder", "inception_v4_encoder"]


def _avg_pool_3x3(x, compat: bool):
    if compat:
        return nn.avg_pool(
            x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), count_include_pad=False
        )
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")


def _max_pool_3x3s2(x, compat: bool):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID" if compat else "SAME")


class ConvBN(nn.Module):
    out_channels: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    valid: bool = False  # only honored in torch_compat mode via `compat`
    compat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.compat:
            if self.valid:
                padding = "VALID"
            else:
                padding = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
            eps = 1e-3  # reference inceptionv4.py:44
        else:
            padding = "SAME"
            eps = 1e-3
        x = nn.Conv(
            self.out_channels, self.kernel, strides=(self.stride, self.stride),
            padding=padding, use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not training, epsilon=eps)(x)
        return jax.nn.relu(x)


class InceptionA(nn.Module):
    compat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.compat
        b0 = ConvBN(96, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(64, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(96, (3, 3), compat=c)(b1, training=training)
        b2 = ConvBN(64, (1, 1), compat=c)(x, training=training)
        b2 = ConvBN(96, (3, 3), compat=c)(b2, training=training)
        b2 = ConvBN(96, (3, 3), compat=c)(b2, training=training)
        b3 = _avg_pool_3x3(x, c)
        b3 = ConvBN(96, (1, 1), compat=c)(b3, training=training)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 384


class ReductionA(nn.Module):
    compat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.compat
        b0 = ConvBN(384, (3, 3), stride=2, valid=True, compat=c)(x, training=training)
        b1 = ConvBN(192, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(224, (3, 3), compat=c)(b1, training=training)
        b1 = ConvBN(256, (3, 3), stride=2, valid=True, compat=c)(b1, training=training)
        b2 = _max_pool_3x3s2(x, c)
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1024


class InceptionB(nn.Module):
    compat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.compat
        b0 = ConvBN(384, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(192, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(224, (1, 7), compat=c)(b1, training=training)
        b1 = ConvBN(256, (7, 1), compat=c)(b1, training=training)
        b2 = ConvBN(192, (1, 1), compat=c)(x, training=training)
        b2 = ConvBN(192, (7, 1), compat=c)(b2, training=training)
        b2 = ConvBN(224, (1, 7), compat=c)(b2, training=training)
        b2 = ConvBN(224, (7, 1), compat=c)(b2, training=training)
        b2 = ConvBN(256, (1, 7), compat=c)(b2, training=training)
        b3 = _avg_pool_3x3(x, c)
        b3 = ConvBN(128, (1, 1), compat=c)(b3, training=training)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)  # 1024


class ReductionB(nn.Module):
    compat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.compat
        b0 = ConvBN(192, (1, 1), compat=c)(x, training=training)
        b0 = ConvBN(192, (3, 3), stride=2, valid=True, compat=c)(b0, training=training)
        b1 = ConvBN(256, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(256, (1, 7), compat=c)(b1, training=training)
        b1 = ConvBN(320, (7, 1), compat=c)(b1, training=training)
        b1 = ConvBN(320, (3, 3), stride=2, valid=True, compat=c)(b1, training=training)
        b2 = _max_pool_3x3s2(x, c)
        return jnp.concatenate([b0, b1, b2], axis=-1)  # 1536


class InceptionC(nn.Module):
    compat: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.compat
        b0 = ConvBN(256, (1, 1), compat=c)(x, training=training)

        b1 = ConvBN(384, (1, 1), compat=c)(x, training=training)
        b1a = ConvBN(256, (1, 3), compat=c)(b1, training=training)
        b1b = ConvBN(256, (3, 1), compat=c)(b1, training=training)

        b2 = ConvBN(384, (1, 1), compat=c)(x, training=training)
        b2 = ConvBN(448, (3, 1), compat=c)(b2, training=training)
        b2 = ConvBN(512, (1, 3), compat=c)(b2, training=training)
        b2a = ConvBN(256, (1, 3), compat=c)(b2, training=training)
        b2b = ConvBN(256, (3, 1), compat=c)(b2, training=training)

        b3 = _avg_pool_3x3(x, c)
        b3 = ConvBN(256, (1, 1), compat=c)(b3, training=training)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], axis=-1)  # 1536


class InceptionV4Encoder(EncoderBase):
    layers: Optional[Tuple[int, ...]] = None
    torch_compat: bool = False
    # Inception-A/B/C block repeats (reference inceptionv4.py:262-284 uses
    # 4/7/3); reducible for depth-cut experiments and fast parity twins
    stage_repeats: Tuple[int, int, int] = (4, 7, 3)

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (64, 192, 384, 1024, 1536)
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        c = self.torch_compat
        outputs = []
        # stem part 1 -> stride 2, 64ch (reference features.0-2: first two
        # convs VALID, third padded)
        x = ConvBN(32, (3, 3), stride=2, valid=True, compat=c)(x, training=training)
        x = ConvBN(32, (3, 3), valid=True, compat=c)(x, training=training)
        x = ConvBN(64, (3, 3), compat=c)(x, training=training)
        outputs.append(x)

        # mixed 3a + 4a -> stride 4, 192ch
        p = _max_pool_3x3s2(x, c)
        conv = ConvBN(96, (3, 3), stride=2, valid=True, compat=c)(x, training=training)
        x = jnp.concatenate([p, conv], axis=-1)  # 160
        b0 = ConvBN(64, (1, 1), compat=c)(x, training=training)
        b0 = ConvBN(96, (3, 3), valid=True, compat=c)(b0, training=training)
        b1 = ConvBN(64, (1, 1), compat=c)(x, training=training)
        b1 = ConvBN(64, (1, 7), compat=c)(b1, training=training)
        b1 = ConvBN(64, (7, 1), compat=c)(b1, training=training)
        b1 = ConvBN(96, (3, 3), valid=True, compat=c)(b1, training=training)
        x = jnp.concatenate([b0, b1], axis=-1)  # 192
        outputs.append(x)

        # mixed 5a -> stride 8, then Inception-A x4 (384ch)
        conv = ConvBN(192, (3, 3), stride=2, valid=True, compat=c)(x, training=training)
        p = _max_pool_3x3s2(x, c)
        x = jnp.concatenate([conv, p], axis=-1)  # 384
        for _ in range(self.stage_repeats[0]):
            x = InceptionA(compat=c)(x, training=training)
        outputs.append(x)

        # Reduction-A -> stride 16, Inception-B x7 (1024ch)
        x = ReductionA(compat=c)(x, training=training)
        for _ in range(self.stage_repeats[1]):
            x = InceptionB(compat=c)(x, training=training)
        outputs.append(x)

        # Reduction-B -> stride 32, Inception-C x3 (1536ch)
        x = ReductionB(compat=c)(x, training=training)
        for _ in range(self.stage_repeats[2]):
            x = InceptionC(compat=c)(x, training=training)
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def inception_v4_encoder(**kwargs) -> InceptionV4Encoder:
    return InceptionV4Encoder(**kwargs)
