"""Normalizer-Free encoders: NFNet-F0..F7 (arXiv:2102.06171) and
NF-RegNet-style variants (capability target:
modules/encoders/timm/nfnet.py:15-127, nf_regnet.py:14-85 — timm-backed in
the reference; own flax implementation, NHWC).

Key pieces: scaled weight-standardized convs (gamma-corrected), signal-
preserving alpha/beta residual scaling, SE gates, no normalization layers —
great for TPU (no batch-stat traffic, pure matmul/elementwise fusions).
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = [
    "NFNetEncoder",
    "nfnet_f0_encoder",
    "nfnet_f1_encoder",
    "nfnet_f2_encoder",
    "nfnet_f3_encoder",
    "nfnet_f4_encoder",
    "nfnet_f5_encoder",
    "nfnet_f6_encoder",
    "nfnet_f7_encoder",
    "nf_regnet_b0_encoder",
    "nf_regnet_b1_encoder",
    "nf_regnet_b2_encoder",
    "nf_regnet_b3_encoder",
    "nf_regnet_b4_encoder",
    "nf_regnet_b5_encoder",
]

_GELU_GAMMA = 1.7015043497085571  # variance-preserving gelu gain


def _scaled_gelu(x):
    return jax.nn.gelu(x) * _GELU_GAMMA


class WSConv(nn.Module):
    """Scaled weight-standardized conv (NFNet's normalization replacement)."""

    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (kh, kw, in_channels // self.groups, self.out_channels)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        gain = self.param("gain", nn.initializers.ones, (self.out_channels,))

        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        fan_in = kh * kw * (in_channels // self.groups)
        scale = jax.lax.rsqrt(jnp.maximum(var * fan_in, 1e-4)) * gain
        kernel = (kernel - mean) * scale

        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return y + bias


class NFBlock(nn.Module):
    """Pre-activation normalizer-free bottleneck with alpha/beta scaling + SE."""

    out_channels: int
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    group_size: int = 128
    se_ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        width = self.out_channels // 2
        groups = max(1, width // self.group_size)
        width = groups * self.group_size if width >= self.group_size else width

        out = _scaled_gelu(x) * self.beta

        shortcut = x
        if self.stride > 1:
            shortcut = nn.avg_pool(out, (2, 2), strides=(2, 2))
        if shortcut.shape[-1] != self.out_channels:
            src = shortcut if self.stride > 1 else out
            shortcut = WSConv(self.out_channels, (1, 1))(src)

        y = WSConv(width, (1, 1))(out)
        y = _scaled_gelu(y)
        y = WSConv(width, (3, 3), stride=self.stride, groups=groups)(y)
        y = _scaled_gelu(y)
        y = WSConv(width, (3, 3), groups=groups)(y)
        y = _scaled_gelu(y)
        y = WSConv(self.out_channels, (1, 1))(y)

        # squeeze-excite (doubled output like NFNet)
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = nn.Conv(max(1, int(self.out_channels * self.se_ratio)), (1, 1))(se)
        se = jax.nn.relu(se)
        se = nn.Conv(self.out_channels, (1, 1))(se)
        y = y * jax.nn.sigmoid(se) * 2.0

        skip_gain = self.param("skip_gain", nn.initializers.zeros, ())
        return shortcut + y * skip_gain * self.alpha


class NFNetEncoder(EncoderBase):
    stage_blocks: Tuple[int, ...] = (1, 2, 6, 3)  # F0
    stage_channels: Tuple[int, ...] = (256, 512, 1536, 1536)
    alpha: float = 0.2
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (128,) + self.stage_channels
        strides = (4, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        # NFNet stem: 4 convs to stride 4
        x = _scaled_gelu(WSConv(16, (3, 3), stride=2)(x))
        x = _scaled_gelu(WSConv(32, (3, 3))(x))
        x = _scaled_gelu(WSConv(64, (3, 3))(x))
        x = WSConv(128, (3, 3), stride=2)(x)
        outputs.append(x)

        expected_var = 1.0
        for stage, (num_blocks, channels) in enumerate(zip(self.stage_blocks, self.stage_channels)):
            for i in range(num_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                beta = 1.0 / (expected_var**0.5)
                x = NFBlock(channels, stride=stride, alpha=self.alpha, beta=beta)(x)
                if i == 0:
                    expected_var = 1.0  # reset at transition
                expected_var += self.alpha**2
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


# NFNet F-series depths are F0's (1, 2, 6, 3) scaled by N+1
# (arXiv:2102.06171 table 1; capability target timm/nfnet.py:15-127)


def _nfnet_f(n, **kwargs):
    base = (1, 2, 6, 3)
    return NFNetEncoder(**{**dict(stage_blocks=tuple(b * (n + 1) for b in base)), **kwargs})


def nfnet_f0_encoder(**kwargs):
    return _nfnet_f(0, **kwargs)


def nfnet_f1_encoder(**kwargs):
    return _nfnet_f(1, **kwargs)


def nfnet_f2_encoder(**kwargs):
    return _nfnet_f(2, **kwargs)


def nfnet_f3_encoder(**kwargs):
    return _nfnet_f(3, **kwargs)


def nfnet_f4_encoder(**kwargs):
    return _nfnet_f(4, **kwargs)


def nfnet_f5_encoder(**kwargs):
    return _nfnet_f(5, **kwargs)


def nfnet_f6_encoder(**kwargs):
    return _nfnet_f(6, **kwargs)


def nfnet_f7_encoder(**kwargs):
    return _nfnet_f(7, **kwargs)


# NF-RegNet B-series (capability target timm/nf_regnet.py:14-85; configs
# follow timm's nf_regnet_b0..b5 depth/width progression)


def nf_regnet_b0_encoder(**kwargs):
    return NFNetEncoder(**{**dict(stage_blocks=(1, 3, 6, 6), stage_channels=(48, 104, 208, 440)), **kwargs})


def nf_regnet_b1_encoder(**kwargs):
    return NFNetEncoder(**{**dict(stage_blocks=(2, 4, 7, 7), stage_channels=(48, 104, 208, 440)), **kwargs})


def nf_regnet_b2_encoder(**kwargs):
    return NFNetEncoder(**{**dict(stage_blocks=(2, 4, 8, 8), stage_channels=(56, 112, 232, 488)), **kwargs})


def nf_regnet_b3_encoder(**kwargs):
    return NFNetEncoder(**{**dict(stage_blocks=(2, 5, 9, 9), stage_channels=(56, 128, 248, 528)), **kwargs})


def nf_regnet_b4_encoder(**kwargs):
    return NFNetEncoder(**{**dict(stage_blocks=(2, 6, 11, 11), stage_channels=(64, 144, 288, 610)), **kwargs})


def nf_regnet_b5_encoder(**kwargs):
    return NFNetEncoder(**{**dict(stage_blocks=(3, 7, 14, 14), stage_channels=(80, 168, 336, 704)), **kwargs})
