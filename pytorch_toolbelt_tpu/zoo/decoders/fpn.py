"""FPN decoder (parity target: modules/decoders/fpn.py:13-88)."""

from typing import List, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.upsample import UpsampleLayerType, instantiate_upsample_block

__all__ = ["FPNDecoder"]


class FPNDecoder(nn.Module):
    """Lateral 1x1 projections + top-down sum + per-level prediction block.

    Returns fine->coarse maps, all with ``out_channels`` channels.
    """

    input_spec: FeatureMapsSpec
    out_channels: int = 256
    prediction_kernel: int = 3  # set 1 for conv1x1-style outputs, 0 for identity
    upsample_block: Union[str, UpsampleLayerType] = UpsampleLayerType.BILINEAR

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(
            channels=(self.out_channels,) * len(self.input_spec), strides=self.input_spec.strides
        )

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        lateral_maps = [
            nn.Conv(self.out_channels, (1, 1))(fm) for fm in feature_maps
        ]

        outputs = [lateral_maps[-1]]
        for index in range(len(feature_maps) - 2, -1, -1):
            target = lateral_maps[index]
            scale = self.input_spec.strides[index + 1] // self.input_spec.strides[index]
            upsample = instantiate_upsample_block(self.upsample_block, scale_factor=scale)
            upsampled = upsample(outputs[-1], output_size=target.shape[1:3])
            fused = target + upsampled
            if self.prediction_kernel > 0:
                k = self.prediction_kernel
                fused = nn.Conv(self.out_channels, (k, k), padding="SAME")(fused)
            outputs.append(fused)

        return outputs[::-1]
