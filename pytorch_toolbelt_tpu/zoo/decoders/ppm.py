"""Pyramid Pooling Module decoder (PSPNet, arXiv:1612.01105).

The reference ships this file entirely commented out
(modules/decoders/pyramid_pooling.py:1-51 is dead code); this is the working
capability it documents.
"""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.functional import resize_bilinear

__all__ = ["PPMDecoder"]


class PPMDecoder(nn.Module):
    """Pool the coarsest map at several bin sizes, project, upsample,
    concat with the input, fuse. Single-output list at the coarsest stride."""

    input_spec: FeatureMapsSpec
    out_channels: int = 512
    pool_sizes: Tuple[int, ...] = (1, 2, 3, 6)
    activation: str = ACT_RELU
    dropout: float = 0.1

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.out_channels,), strides=(self.input_spec.strides[-1],))

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        act = instantiate_activation_block(self.activation)
        x = feature_maps[-1]
        b, h, w, c = x.shape
        branch_channels = self.out_channels // len(self.pool_sizes)

        branches = [x]
        for bins in self.pool_sizes:
            # adaptive average pool to (bins, bins)
            ph, pw = h // bins, w // bins
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = nn.Conv(branch_channels, (1, 1), use_bias=False)(pooled)
            pooled = nn.BatchNorm(use_running_average=not training)(pooled)
            pooled = act(pooled)
            branches.append(resize_bilinear(pooled, (h, w), align_corners=False))

        fused = jnp.concatenate(branches, axis=-1)
        fused = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(fused)
        fused = nn.BatchNorm(use_running_average=not training)(fused)
        fused = act(fused)
        fused = nn.Dropout(self.dropout, deterministic=not training)(fused)
        return [fused]
