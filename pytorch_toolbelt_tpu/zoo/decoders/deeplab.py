"""DeepLabV3 / V3+ decoders (parity targets:
modules/decoders/deeplab_v3.py:13-66, deeplab_v3_plus.py:15-94)."""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.functional import resize_bilinear
from ...nn.spp import ASPP

__all__ = ["DeeplabV3Decoder", "DeeplabV3PlusDecoder"]


class DeeplabV3Decoder(nn.Module):
    """ASPP over the coarsest map + conv head; single-output list
    (arXiv:1706.05587)."""

    input_spec: FeatureMapsSpec
    out_channels: int
    aspp_channels: int = 256
    atrous_rates: Tuple[int, ...] = (12, 24, 36)
    dropout: float = 0.5
    activation: str = ACT_RELU

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.out_channels,), strides=(self.input_spec.strides[-1],))

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        x = feature_maps[-1]
        x = ASPP(
            out_channels=self.aspp_channels,
            atrous_rates=self.atrous_rates,
            dropout=self.dropout,
            activation=self.activation,
        )(x, training=training)
        x = nn.Conv(self.aspp_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = instantiate_activation_block(self.activation)(x)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        return [x]


class DeeplabV3PlusDecoder(nn.Module):
    """Separable-ASPP + low-level projection + fused final; returns
    [fine, coarse] maps."""

    input_spec: FeatureMapsSpec
    out_channels: int
    aspp_channels: int = 256
    low_level_channels: int = 48
    atrous_rates: Tuple[int, ...] = (12, 24, 36)
    dropout: float = 0.5
    activation: str = ACT_RELU

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(
            channels=(self.out_channels, self.aspp_channels),
            strides=(self.input_spec.strides[0], self.input_spec.strides[-1]),
        )

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        act = instantiate_activation_block(self.activation)

        coarse = ASPP(
            out_channels=self.aspp_channels,
            atrous_rates=self.atrous_rates,
            dropout=self.dropout,
            activation=self.activation,
            separable=True,
        )(feature_maps[-1], training=training)

        low = nn.Conv(self.low_level_channels, (1, 1), use_bias=False)(feature_maps[0])
        low = nn.BatchNorm(use_running_average=not training)(low)
        low = act(low)

        coarse_resized = resize_bilinear(coarse, low.shape[1:3], align_corners=False)
        combined = jnp.concatenate([low, coarse_resized], axis=-1)
        fine = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(combined)
        fine = nn.BatchNorm(use_running_average=not training)(fine)
        fine = act(fine)
        return [fine, coarse]
