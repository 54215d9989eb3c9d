"""Context Aggregation Network decoder (parity target:
modules/decoders/can.py:14-141)."""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.dsconv import DepthwiseSeparableConv2d
from ...nn.functional import resize_bilinear

__all__ = ["CANDecoder"]


class RCM(nn.Module):
    """Residual context module: 1x1 proj + conv-bn-relu-conv residual."""

    out_channels: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not training)(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME")(y)
        return y + x


class CFM(nn.Module):
    """Context fusion: multi-kernel depthwise-separable branches + global
    pooling branch, concatenated."""

    out_channels: int
    kernel_sizes: Tuple[int, ...] = (3, 5, 7, 11)

    @nn.compact
    def __call__(self, x, training: bool = False):
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = nn.Conv(self.out_channels, (1, 1), use_bias=False)(gp)
        gp = nn.BatchNorm(use_running_average=not training)(gp)
        gp = jnp.broadcast_to(gp, x.shape[:3] + (self.out_channels,))

        branches = []
        for ks in self.kernel_sizes:
            y = DepthwiseSeparableConv2d(self.out_channels, kernel_size=ks, bias=False)(x)
            y = nn.BatchNorm(use_running_average=not training)(y)
            y = jax.nn.relu(y)
            y = DepthwiseSeparableConv2d(self.out_channels, kernel_size=ks, bias=False)(y)
            y = nn.BatchNorm(use_running_average=not training)(y)
            branches.append(y)
        return jnp.concatenate(branches + [gp], axis=-1)


class AMM(nn.Module):
    """Attention mixing: upsample decoder map, concat with encoder map,
    conv, GAP-gate, residual add."""

    out_channels: int

    @nn.compact
    def __call__(self, encoder, decoder, training: bool = False):
        decoder = resize_bilinear(decoder, encoder.shape[1:3], align_corners=False)
        x = jnp.concatenate([encoder, decoder], axis=-1)
        x = DepthwiseSeparableConv2d(self.out_channels, kernel_size=3, bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True) * x
        return encoder + x


class CANDecoder(nn.Module):
    """Context Aggregation Network: RCM projections, CFM center, AMM+RCM
    top-down refinement. Returns fine->coarse maps."""

    input_spec: FeatureMapsSpec
    out_channels: int = 256

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(
            channels=(self.out_channels,) * len(self.input_spec), strides=self.input_spec.strides
        )

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        features = [RCM(self.out_channels)(fm, training=training) for fm in feature_maps]

        x = CFM(self.out_channels)(features[-1], training=training)
        x = RCM(self.out_channels)(x, training=training)

        outputs = [x]
        for block_index in range(len(features) - 2, -1, -1):
            x = AMM(self.out_channels)(features[block_index], x, training=training)
            x = RCM(self.out_channels)(x, training=training)
            outputs.append(x)

        return outputs[::-1]
