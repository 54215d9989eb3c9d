"""MobileNet V2 / V3 encoders (capability target:
modules/encoders/mobilenet.py:7-79 and modules/backbone/mobilenet.py —
own flax implementations, NHWC).
"""

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import hard_sigmoid, hard_swish
from .common import EncoderBase

__all__ = ["MobileNetV2Encoder", "MobileNetV3Encoder", "mobilenet_v3_large_encoder", "mobilenet_v3_small_encoder"]


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: float
    kernel_size: int = 3
    use_se: bool = False
    use_hs: bool = False  # hard-swish instead of relu6
    divisible_hidden: bool = True  # False = round() like the vendored torch V2
    activation: Optional[str] = None  # overrides use_hs when set

    @nn.compact
    def __call__(self, x, training: bool = False):
        from ...nn.activations import get_activation_fn

        in_channels = x.shape[-1]
        if self.divisible_hidden:
            hidden = _make_divisible(in_channels * self.expand_ratio)
        else:
            hidden = int(round(in_channels * self.expand_ratio))
        if self.activation is not None:
            act = get_activation_fn(self.activation)
        else:
            act = hard_swish if self.use_hs else jax.nn.relu6
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False)(y)
            y = norm()(y)
            y = act(y)
        # symmetric (k-1)/2 padding: torch semantics; differs from XLA "SAME"
        # only at stride 2, where "SAME" pads asymmetrically
        p = (self.kernel_size - 1) // 2
        y = nn.Conv(
            hidden,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=hidden,
            use_bias=False,
        )(y)
        y = norm()(y)
        y = act(y)
        if self.use_se:
            se = jnp.mean(y, axis=(1, 2), keepdims=True)
            se_c = _make_divisible(hidden // 4)
            se = nn.Conv(se_c, (1, 1))(se)
            se = jax.nn.relu(se)
            se = nn.Conv(hidden, (1, 1))(se)
            y = y * hard_sigmoid(se)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        if self.stride == 1 and in_channels == self.out_channels:
            y = y + x
        return y


# (expand_ratio, channels, num_blocks, stride) — MobileNetV2 paper table 2
_V2_CONFIG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2Encoder(EncoderBase):
    """MobileNetV2 (arXiv:1801.04381). Feature maps at strides 2/4/8/16/32.

    Channel rounding follows the reference's vendored backbone
    (modules/backbone/mobilenet.py:18-101: ``int(c * width_mult)`` stages,
    ``round(inp * t)`` hidden dims) so ported torch weights drop in exactly;
    the pluggable ``activation`` mirrors its activation argument.
    """

    width_mult: float = 1.0
    layers: Optional[Tuple[int, ...]] = None
    activation: str = "relu6"

    def _stage_channels(self) -> Tuple[int, ...]:
        w = self.width_mult
        return (
            int(16 * w),
            int(24 * w),
            int(32 * w),
            int(96 * w),
            int(320 * w),
        )

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = self._stage_channels()
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        from ...nn.activations import get_activation_fn

        w = self.width_mult
        act = get_activation_fn(self.activation)
        x = nn.Conv(
            int(32 * w), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False
        )(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = act(x)

        outputs = []
        current_stride = 2
        for t, c, n, s in _V2_CONFIG:
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2 and current_stride in (2, 4, 8, 16):
                    outputs.append(x)  # snapshot before downsampling
                    current_stride *= 2
                x = InvertedResidual(
                    int(c * w),
                    stride=stride,
                    expand_ratio=t,
                    divisible_hidden=False,
                    activation=self.activation,
                )(x, training=training)
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


# (kernel, expanded, out, use_se, use_hs, stride) — MobileNetV3 paper tables
_V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_V3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class MobileNetV3Encoder(EncoderBase):
    """MobileNetV3 large/small (arXiv:1905.02244)."""

    small: bool = False
    layers: Optional[Tuple[int, ...]] = None

    def _config(self):
        return _V3_SMALL if self.small else _V3_LARGE

    def get_output_spec(self) -> FeatureMapsSpec:
        config = self._config()
        channels = [16]
        strides = [2]
        current_stride = 2
        last_c = 16
        # channels right before each downsample + final
        for k, e, c, se, hs, s in config:
            if s == 2:
                channels.append(last_c)
                strides.append(current_stride)
                current_stride *= 2
            last_c = c
        channels.append(last_c)
        strides.append(current_stride)
        # first snapshot duplicates the stem when the first block downsamples
        channels, strides = tuple(channels[1:]), tuple(strides[1:])
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = hard_swish(x)

        outputs = []
        for k, e, c, se, hs, s in self._config():
            if s == 2:
                outputs.append(x)
            in_ch = x.shape[-1]
            x = InvertedResidual(
                c, stride=s, expand_ratio=e / in_ch, kernel_size=k, use_se=se, use_hs=hs
            )(x, training=training)
        outputs.append(x)
        outputs = outputs[1:] if len(outputs) > 5 else outputs

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def mobilenet_v3_large_encoder(**kwargs) -> MobileNetV3Encoder:
    return MobileNetV3Encoder(small=False, **kwargs)


def mobilenet_v3_small_encoder(**kwargs) -> MobileNetV3Encoder:
    return MobileNetV3Encoder(small=True, **kwargs)
