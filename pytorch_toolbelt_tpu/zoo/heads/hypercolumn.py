"""Hypercolumn head (arXiv:1411.5752; parity target:
modules/heads/hypercolumn.py:12-63)."""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.fpn import FPNFuse
from ...nn.functional import resize_2d
from ...nn.normalization import NORM_BATCH, Normalization

__all__ = ["HypercolumnHead"]


class HypercolumnHead(nn.Module):
    """Concat-all-resized -> 1x1 projection (conv-norm-act-dropout) ->
    3x3 conv -> resize to output size."""

    input_spec: FeatureMapsSpec
    num_classes: int
    mid_channels: int = 128
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    output_name: Optional[str] = None
    dropout_rate: float = 0.0
    interpolation_mode: str = "bilinear"
    interpolation_align_corners: bool = False

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.num_classes,), strides=(1,))

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size: Tuple[int, int], training: bool = False):
        x = FPNFuse(mode=self.interpolation_mode, align_corners=self.interpolation_align_corners)(
            feature_maps
        )
        x = nn.Conv(self.mid_channels, (1, 1))(x)
        x = Normalization(self.normalization)(x, training=training)
        x = instantiate_activation_block(self.activation)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = nn.Conv(self.num_classes, (3, 3), padding="SAME")(x)
        output = resize_2d(
            x, output_size, mode=self.interpolation_mode, align_corners=self.interpolation_align_corners
        )
        if self.output_name is not None:
            return {self.output_name: output}
        return output
