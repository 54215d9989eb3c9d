"""EfficientNet B0-B7 encoders (arXiv:1905.11946; capability target:
modules/encoders/timm/efficient_net.py:65-270 — timm-backed in the
reference; own flax implementation, NHWC, SiLU + SE(0.25 of input)).
"""

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = [
    "EfficientNetEncoder",
    "efficientnet_b0_encoder",
    "efficientnet_b1_encoder",
    "efficientnet_b2_encoder",
    "efficientnet_b3_encoder",
    "efficientnet_b4_encoder",
    "efficientnet_b5_encoder",
    "efficientnet_b6_encoder",
    "efficientnet_b7_encoder",
]

# (expand, channels, num_blocks, stride, kernel) — EfficientNet-B0 baseline
_B0_CONFIG = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]

# (width_mult, depth_mult)
_SCALING = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}


def _round_channels(c: float, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class MBConv(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    kernel_size: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False)(y)
            y = norm()(y)
            y = jax.nn.silu(y)
        y = nn.Conv(
            hidden,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=hidden,
            use_bias=False,
        )(y)
        y = norm()(y)
        y = jax.nn.silu(y)
        # SE with ratio relative to INPUT channels (EfficientNet convention)
        se_channels = max(1, int(in_channels * self.se_ratio))
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_channels, (1, 1))(se)
        se = jax.nn.silu(se)
        se = nn.Conv(hidden, (1, 1))(se)
        y = y * jax.nn.sigmoid(se)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        if self.stride == 1 and in_channels == self.out_channels:
            y = y + x
        return y


class EfficientNetEncoder(EncoderBase):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    layers: Optional[Tuple[int, ...]] = None

    def _snapshot_channels(self) -> Tuple[int, ...]:
        w = self.width_mult
        # maps before each downsample + final: stride 2, 4, 8, 16, 32
        return (
            _round_channels(16, w),
            _round_channels(24, w),
            _round_channels(40, w),
            _round_channels(112, w),
            _round_channels(320, w),
        )

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = self._snapshot_channels()
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        w, d = self.width_mult, self.depth_mult
        x = nn.Conv(_round_channels(32, w), (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.silu(x)

        outputs = []
        for t, c, n, s, k in _B0_CONFIG:
            repeats = _round_repeats(n, d)
            for i in range(repeats):
                stride = s if i == 0 else 1
                if stride == 2:
                    outputs.append(x)
                x = MBConv(
                    _round_channels(c, w), stride=stride, expand_ratio=t, kernel_size=k
                )(x, training=training)
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def _make(scale: str, **kwargs) -> EfficientNetEncoder:
    w, d = _SCALING[scale]
    return EfficientNetEncoder(width_mult=w, depth_mult=d, **kwargs)


def efficientnet_b0_encoder(**kwargs):
    return _make("b0", **kwargs)


def efficientnet_b1_encoder(**kwargs):
    return _make("b1", **kwargs)


def efficientnet_b2_encoder(**kwargs):
    return _make("b2", **kwargs)


def efficientnet_b3_encoder(**kwargs):
    return _make("b3", **kwargs)


def efficientnet_b4_encoder(**kwargs):
    return _make("b4", **kwargs)


def efficientnet_b5_encoder(**kwargs):
    return _make("b5", **kwargs)


def efficientnet_b6_encoder(**kwargs):
    return _make("b6", **kwargs)


def efficientnet_b7_encoder(**kwargs):
    return _make("b7", **kwargs)
