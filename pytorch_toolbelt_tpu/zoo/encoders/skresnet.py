"""Selective-Kernel ResNet encoders (arXiv:1903.06586; capability target:
modules/encoders/timm/resnet.py SK variants — timm-backed in the reference;
own flax implementation, NHWC).

The SK unit runs parallel 3x3 and dilated-3x3 branches and fuses them with
channel-wise soft attention over branches.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = [
    "SKResNetEncoder",
    "skresnet18_encoder",
    "skresnet34_encoder",
    "skresnet50_encoder",
    "skresnext50_encoder",
]


class SelectiveKernelConv(nn.Module):
    out_channels: int
    stride: int = 1
    num_paths: int = 2
    reduction: int = 16
    groups: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        paths = []
        for k in range(self.num_paths):
            y = nn.Conv(
                self.out_channels, (3, 3), strides=(self.stride,) * 2,
                kernel_dilation=(k + 1, k + 1), padding="SAME", use_bias=False,
                feature_group_count=self.groups,
            )(x)
            paths.append(jax.nn.relu(norm()(y)))
        stacked = jnp.stack(paths, axis=1)  # [B, P, H, W, C]

        u = stacked.sum(axis=1)
        s = jnp.mean(u, axis=(1, 2))  # [B, C]
        z = nn.Dense(max(self.out_channels // self.reduction, 32))(s)
        z = jax.nn.relu(z)
        logits = nn.Dense(self.out_channels * self.num_paths)(z)
        attn = jax.nn.softmax(
            logits.reshape(-1, self.num_paths, self.out_channels), axis=1
        )  # [B, P, C]
        return (stacked * attn[:, :, None, None, :]).sum(axis=1)


class SKBasicBlock(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        y = SelectiveKernelConv(self.out_channels, stride=self.stride)(x, training=training)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = norm()(y)
        residual = x
        if residual.shape != y.shape:
            residual = nn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2, use_bias=False)(x)
            residual = norm()(residual)
        return jax.nn.relu(y + residual)


class SKBottleneck(nn.Module):
    out_channels: int
    stride: int = 1
    expansion: int = 4
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        planes = self.out_channels // self.expansion
        # ResNeXt-style width: int(planes * base_width/64) * groups
        width = int(planes * (self.base_width / 64.0)) * self.groups
        y = nn.Conv(width, (1, 1), use_bias=False)(x)
        y = jax.nn.relu(norm()(y))
        y = SelectiveKernelConv(width, stride=self.stride, groups=self.groups)(y, training=training)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        residual = x
        if residual.shape != y.shape:
            residual = nn.Conv(self.out_channels, (1, 1), strides=(self.stride,) * 2, use_bias=False)(x)
            residual = norm()(residual)
        return jax.nn.relu(y + residual)


class SKResNetEncoder(EncoderBase):
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    bottleneck: bool = False
    groups: int = 1
    base_width: int = 64
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        e = 4 if self.bottleneck else 1
        channels = (64, 64 * e, 128 * e, 256 * e, 512 * e)
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        block_cls = SKBottleneck if self.bottleneck else SKBasicBlock
        e = 4 if self.bottleneck else 1
        outputs = []
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(self.stage_blocks):
            channels = 64 * (2**stage) * e
            for i in range(num_blocks):
                stride = 2 if stage > 0 and i == 0 else 1
                if self.bottleneck:
                    x = block_cls(
                        channels, stride=stride, groups=self.groups, base_width=self.base_width
                    )(x, training=training)
                else:
                    x = block_cls(channels, stride=stride)(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def skresnet18_encoder(**kwargs):
    return SKResNetEncoder(stage_blocks=(2, 2, 2, 2), bottleneck=False, **kwargs)


def skresnet34_encoder(**kwargs):
    return SKResNetEncoder(stage_blocks=(3, 4, 6, 3), bottleneck=False, **kwargs)


def skresnet50_encoder(**kwargs):
    return SKResNetEncoder(stage_blocks=(3, 4, 6, 3), bottleneck=True, **kwargs)


def skresnext50_encoder(**kwargs):
    """SK-ResNeXt50 32x4d (capability target: encoders/timm/resnet.py
    SKResNeXt50Encoder): grouped SK bottlenecks, cardinality 32, width 4."""
    return SKResNetEncoder(
        stage_blocks=(3, 4, 6, 3), bottleneck=True, groups=32, base_width=4, **kwargs
    )
