"""Progressive pixel-shuffle head (parity target:
modules/heads/progressive_shuffle.py:13-105)."""

import math
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.normalization import NORM_BATCH, Normalization

__all__ = ["ProgressiveShuffleHead"]


def _divisible(channels: float, divisor: int) -> int:
    return int(math.ceil(channels / float(divisor))) * divisor


class ProgressiveShuffleHead(nn.Module):
    """log2(stride) x [conv3x3-norm-act-conv1x1-PixelShuffle] chain with
    channel reduction per stage, then dropout + final conv."""

    input_spec: FeatureMapsSpec
    num_classes: int
    activation: str = ACT_RELU
    dropout_rate: float = 0.0
    output_name: Optional[str] = None
    reduction_factor: int = 2
    normalization: str = NORM_BATCH

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.num_classes,), strides=(1,))

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        index = self.input_spec.get_index_of_largest_feature_map()
        x = feature_maps[index]
        min_stride = self.input_spec.strides[index]
        num_blocks = int(math.log2(min_stride))

        in_channels = self.input_spec.channels[index]
        act = instantiate_activation_block(self.activation)
        for _ in range(num_blocks):
            out_channels = _divisible(in_channels / self.reduction_factor, 8)
            y = nn.Conv(in_channels, (3, 3), padding="SAME", use_bias=False)(x)
            y = Normalization(self.normalization)(y, training=training)
            y = act(y)
            y = nn.Conv(out_channels * 4, (1, 1), use_bias=False)(y)
            x = rearrange(y, "b h w (c s1 s2) -> b (h s1) (w s2) c", s1=2, s2=2)
            in_channels = out_channels

        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        output = nn.Conv(self.num_classes, (3, 3), padding="SAME", use_bias=True)(x)
        if self.output_name is not None:
            return {self.output_name: output}
        return output
