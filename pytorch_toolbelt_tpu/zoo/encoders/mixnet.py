"""MixNet encoders (arXiv:1907.09595; capability target: the MixNet-XL
preset in modules/encoders/timm/efficient_net.py — timm-backed in the
reference; own flax implementation, NHWC).

MixConv splits channels into groups convolved with different kernel sizes
(3/5/7/9) inside an MBConv-style block.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = ["MixNetEncoder", "mixnet_s_encoder", "mixnet_m_encoder", "mixnet_xl_encoder"]


class MixConv(nn.Module):
    """Depthwise conv with per-group kernel sizes."""

    kernel_sizes: Tuple[int, ...]
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        num_groups = len(self.kernel_sizes)
        split = [channels // num_groups] * num_groups
        split[0] += channels - sum(split)
        outs = []
        start = 0
        for k, c in zip(self.kernel_sizes, split):
            part = x[..., start : start + c]
            outs.append(
                nn.Conv(
                    c, (k, k), strides=(self.stride,) * 2, padding="SAME",
                    feature_group_count=c, use_bias=False,
                )(part)
            )
            start += c
        return jnp.concatenate(outs, axis=-1)


class MixBlock(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    kernel_sizes: Tuple[int, ...] = (3, 5, 7)
    use_se: bool = True
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False)(y)
            y = jax.nn.silu(norm()(y))
        y = MixConv(self.kernel_sizes, stride=self.stride)(y)
        y = jax.nn.silu(norm()(y))
        if self.use_se:
            se = jnp.mean(y, axis=(1, 2), keepdims=True)
            se = nn.Conv(max(1, int(in_channels * self.se_ratio)), (1, 1))(se)
            se = jax.nn.silu(se)
            se = nn.Conv(hidden, (1, 1))(se)
            y = y * jax.nn.sigmoid(se)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        if self.stride == 1 and in_channels == self.out_channels:
            y = y + x
        return y


# (expand, channels, blocks, stride, kernel_sizes) — MixNet-S-like baseline
_S_CONFIG = [
    (1, 16, 1, 1, (3,)),
    (6, 24, 2, 2, (3,)),
    (6, 40, 3, 2, (3, 5, 7)),
    (6, 80, 3, 2, (3, 5, 7)),
    (6, 120, 3, 1, (3, 5, 7, 9)),
    (6, 200, 3, 2, (3, 5, 7, 9)),
]


class MixNetEncoder(EncoderBase):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    stem_channels: int = 16
    layers: Optional[Tuple[int, ...]] = None

    def _c(self, c: float) -> int:
        v = int(c * self.width_mult + 4) // 8 * 8
        return max(8, v)

    def _snapshot_channels(self) -> Tuple[int, ...]:
        channels = []
        last = self._c(_S_CONFIG[0][1])
        for t, c, n, s, ks in _S_CONFIG:
            if s == 2:
                channels.append(last)
            last = self._c(c)
        channels.append(last)
        return tuple(channels)

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = self._snapshot_channels()
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        import math

        x = nn.Conv(self._c(self.stem_channels), (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.silu(x)

        outputs = []
        for t, c, n, s, ks in _S_CONFIG:
            repeats = int(math.ceil(n * self.depth_mult))
            for i in range(repeats):
                stride = s if i == 0 else 1
                if stride == 2:
                    outputs.append(x)
                x = MixBlock(
                    self._c(c), stride=stride, expand_ratio=t, kernel_sizes=ks
                )(x, training=training)
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def mixnet_s_encoder(**kwargs):
    return MixNetEncoder(width_mult=1.0, **kwargs)


def mixnet_m_encoder(**kwargs):
    return MixNetEncoder(width_mult=1.2, **kwargs)


def mixnet_xl_encoder(**kwargs):
    return MixNetEncoder(width_mult=1.6, depth_mult=1.2, **kwargs)
