"""Res2Net encoders (arXiv:1904.01169; capability target:
modules/encoders/timm/res2net.py:10-24 — timm-backed in the reference;
own flax implementation, NHWC).

Bottleneck with hierarchical multi-scale splits: the 3x3 stage splits its
width into ``scale`` groups; group i adds group i-1's output before its conv,
widening the receptive-field mix per block.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = ["Res2NetEncoder", "res2net50_encoder", "res2net101_encoder", "res2next50_encoder"]


class Res2NetBottleneck(nn.Module):
    out_channels: int  # expanded (width * 4)
    stride: int = 1
    scale: int = 4
    base_width: int = 26
    groups: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        planes = self.out_channels // self.expansion
        width = int(planes * (self.base_width / 64.0)) * self.groups
        total_width = width * self.scale

        residual = x
        y = nn.Conv(total_width, (1, 1), use_bias=False)(x)
        y = jax.nn.relu(norm()(y))

        # hierarchical splits
        splits = jnp.split(y, self.scale, axis=-1)
        outs = []
        prev = None
        for i, sp in enumerate(splits):
            if i == 0:
                outs.append(sp if self.stride == 1 else nn.avg_pool(sp, (self.stride,) * 2, strides=(self.stride,) * 2))
                continue
            inp = sp if (prev is None or self.stride != 1) else sp + prev
            conv = nn.Conv(
                width, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                feature_group_count=self.groups, use_bias=False,
            )(inp)
            prev = jax.nn.relu(norm()(conv))
            outs.append(prev)
        y = jnp.concatenate(outs, axis=-1)

        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2, use_bias=False)(x)
            residual = norm()(residual)
        return jax.nn.relu(y + residual)


class Res2NetEncoder(EncoderBase):
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    scale: int = 4
    base_width: int = 26
    groups: int = 1
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (64, 256, 512, 1024, 2048)
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(self.stage_blocks):
            channels = 256 * (2**stage)
            for i in range(num_blocks):
                x = Res2NetBottleneck(
                    out_channels=channels,
                    stride=(2 if stage > 0 and i == 0 else 1),
                    scale=self.scale,
                    base_width=self.base_width,
                    groups=self.groups,
                )(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def res2net50_encoder(**kwargs):
    return Res2NetEncoder(stage_blocks=(3, 4, 6, 3), **kwargs)


def res2net101_encoder(**kwargs):
    return Res2NetEncoder(stage_blocks=(3, 4, 23, 3), **kwargs)


def res2next50_encoder(**kwargs):
    return Res2NetEncoder(stage_blocks=(3, 4, 6, 3), base_width=4, groups=8, **kwargs)
