"""EfficientNetV2 encoders (arXiv:2104.00298; capability target:
modules/encoders/timm/efficient_net_v2.py:47 — timm-backed in the
reference; own flax implementation, NHWC).

Early stages use FusedMBConv (plain 3x3 expansion conv — friendlier to the
MXU than depthwise at large spatial sizes); later stages use MBConv with SE.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase
from .efficientnet import MBConv

__all__ = [
    "EfficientNetV2Encoder",
    "efficientnet_v2_s_encoder",
    "efficientnet_v2_m_encoder",
    "efficientnet_v2_l_encoder",
]


class FusedMBConv(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_channels = x.shape[-1]
        hidden = in_channels * self.expand_ratio
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(
                hidden, (self.kernel_size,) * 2, strides=(self.stride,) * 2,
                padding="SAME", use_bias=False,
            )(y)
            y = jax.nn.silu(norm()(y))
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
            y = norm()(y)
        else:
            y = nn.Conv(
                self.out_channels, (self.kernel_size,) * 2, strides=(self.stride,) * 2,
                padding="SAME", use_bias=False,
            )(y)
            y = jax.nn.silu(norm()(y))
        if self.stride == 1 and in_channels == self.out_channels:
            y = y + x
        return y


# (block_type, expand, channels, num_blocks, stride) — V2-S table
_V2_S = [
    ("fused", 1, 24, 2, 1),
    ("fused", 4, 48, 4, 2),
    ("fused", 4, 64, 4, 2),
    ("mb", 4, 128, 6, 2),
    ("mb", 6, 160, 9, 1),
    ("mb", 6, 256, 15, 2),
]
_V2_M = [
    ("fused", 1, 24, 3, 1),
    ("fused", 4, 48, 5, 2),
    ("fused", 4, 80, 5, 2),
    ("mb", 4, 160, 7, 2),
    ("mb", 6, 176, 14, 1),
    ("mb", 6, 304, 18, 2),
    ("mb", 6, 512, 5, 1),
]
_V2_L = [
    ("fused", 1, 32, 4, 1),
    ("fused", 4, 64, 7, 2),
    ("fused", 4, 96, 7, 2),
    ("mb", 4, 192, 10, 2),
    ("mb", 6, 224, 19, 1),
    ("mb", 6, 384, 25, 2),
    ("mb", 6, 640, 7, 1),
]


class EfficientNetV2Encoder(EncoderBase):
    config_name: str = "s"
    # optional custom stage table [(kind, expand, channels, blocks, stride), ...]
    # overriding the named config (useful for depth-reduced experiments)
    config_override: Optional[Tuple[Tuple, ...]] = None
    layers: Optional[Tuple[int, ...]] = None

    def _config(self):
        if self.config_override is not None:
            return self.config_override
        return {"s": _V2_S, "m": _V2_M, "l": _V2_L}[self.config_name]

    def _snapshot_channels(self) -> Tuple[int, ...]:
        config = self._config()
        channels = []
        last = config[0][2]  # after stage 1 (stride still 2)
        current = 24
        for kind, t, c, n, s in config:
            if s == 2:
                channels.append(last)
            last = c
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
        config = self._config()
        x = nn.Conv(config[0][2], (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.silu(x)

        outputs = []
        for kind, t, c, n, s in config:
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2:
                    outputs.append(x)
                if kind == "fused":
                    x = FusedMBConv(c, stride=stride, expand_ratio=t)(x, training=training)
                else:
                    x = MBConv(c, stride=stride, expand_ratio=t, kernel_size=3)(x, training=training)
            # stage done
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def efficientnet_v2_s_encoder(**kwargs):
    return EfficientNetV2Encoder(config_name="s", **kwargs)


def efficientnet_v2_m_encoder(**kwargs):
    return EfficientNetV2Encoder(config_name="m", **kwargs)


def efficientnet_v2_l_encoder(**kwargs):
    """Capability target: timm/efficient_net_v2.py:47 (tf_efficientnetv2_l)."""
    return EfficientNetV2Encoder(config_name="l", **kwargs)
