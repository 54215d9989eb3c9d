"""Vanilla U-Net encoder (reference: modules/encoders/unet.py:13-52)."""

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU
from ...nn.normalization import NORM_BATCH
from ...nn.unet import UnetBlock, UnetResidualBlock
from .common import EncoderBase

__all__ = ["UnetEncoder"]


class UnetEncoder(EncoderBase):
    """Double-conv downsampling stack with channel growth factor."""

    out_channels: int = 32
    num_layers: int = 4
    growth_factor: int = 2
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    residual: bool = False
    pool: str = "max"  # 'max' | 'avg'

    def feature_channels(self) -> Tuple[int, ...]:
        return tuple(self.out_channels * (self.growth_factor**i) for i in range(self.num_layers))

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(
            channels=self.feature_channels(),
            strides=tuple(2**i for i in range(self.num_layers)),
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        block_cls = UnetResidualBlock if self.residual else UnetBlock
        pool = nn.max_pool if self.pool == "max" else nn.avg_pool
        outputs = []
        for layer, ch in enumerate(self.feature_channels()):
            if layer > 0:
                x = pool(x, (2, 2), strides=(2, 2))
            x = block_cls(
                out_channels=ch, activation=self.activation, normalization=self.normalization
            )(x, training=training)
            outputs.append(x)
        return outputs
