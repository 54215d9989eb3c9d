"""U-Net decoder (reference: modules/decoders/unet.py:24-129).

Coarse -> fine loop: upsample previous output to the skip's spatial size,
concat, run decoder block(s).  Returns feature maps fine -> coarse like the
input.  Upsample target sizes come from the skip maps' static shapes (the
jit-land equivalent of the reference's runtime ``output_size`` hints).
"""

from typing import List, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU
from ...nn.normalization import NORM_BATCH
from ...nn.unet import UnetBlock, UnetResidualBlock
from ...nn.upsample import UpsampleLayerType, instantiate_upsample_block

__all__ = ["UNetDecoder"]


class UNetDecoder(nn.Module):
    input_spec: FeatureMapsSpec
    out_channels: Tuple[int, ...]
    block_type: str = "unet"  # 'unet' | 'unet_residual'
    upsample_block: Union[str, UpsampleLayerType] = UpsampleLayerType.BILINEAR
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    num_blocks_per_stage: Union[int, Tuple[int, ...]] = 1

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=tuple(self.out_channels), strides=self.input_spec.strides[:-1])

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        num_stages = len(self.input_spec) - 1
        if len(self.out_channels) != num_stages:
            raise ValueError(f"out_channels must have length of {num_stages}")

        blocks_per_stage = self.num_blocks_per_stage
        if isinstance(blocks_per_stage, int):
            blocks_per_stage = (blocks_per_stage,) * num_stages
        if len(blocks_per_stage) != num_stages:
            raise ValueError(f"num_blocks_per_stage must have length of {num_stages}")

        block_cls = UnetResidualBlock if self.block_type == "unet_residual" else UnetBlock

        x = feature_maps[-1]
        outputs = []
        for index in range(num_stages):
            block_index = num_stages - index - 1  # coarse -> fine
            skip = feature_maps[block_index]
            scale = self.input_spec.strides[block_index + 1] // self.input_spec.strides[block_index]
            upsample = instantiate_upsample_block(self.upsample_block, scale_factor=scale)
            x = upsample(x, output_size=skip.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
            for _ in range(blocks_per_stage[block_index]):
                x = block_cls(
                    out_channels=self.out_channels[block_index],
                    activation=self.activation,
                    normalization=self.normalization,
                )(x, training=training)
            outputs.append(x)

        return outputs[::-1]  # fine -> coarse
