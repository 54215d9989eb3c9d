"""SENet family encoders — SENet154, SE-ResNet 50/101/152, SE-ResNeXt 50/101
(parity target: the reference's vendored Cadene backbone
modules/backbone/senet.py:94-492 and its encoder wrappers
modules/encoders/seresnet.py:33-126).

Own flax implementation, NHWC.  Architectural quirks faithfully kept so torch
checkpoints port exactly (see zoo/porting.py senet_mapping):

* Caffe-style SE-ResNet bottleneck: stride sits on conv1 (1x1), not conv2
  (senet.py:164-184) — unlike torchvision ResNet.
* SENet154: triple-3x3 stem into 128 channels (senet.py:268-279), grouped
  (64) 3x3 with planes*2 -> planes*4 channel flow (senet.py:141-161), and
  3x3/pad-1 downsample convs in stages 2-4 (senet.py:219-220).
* The stem maxpool uses ceil_mode=True (senet.py:286-288); reproduced by
  right/bottom padding before a floor-mode pool.
"""

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = [
    "SENetEncoder",
    "senet154_encoder",
    "se_resnet50_encoder",
    "se_resnet101_encoder",
    "se_resnet152_encoder",
    "se_resnext50_encoder",
    "se_resnext101_encoder",
]


def max_pool_ceil(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """2D max pool with torch's ceil_mode=True semantics (partial trailing
    windows included)."""
    h, w = x.shape[1], x.shape[2]

    def pad_for(n: int) -> int:
        out_ceil = -(-(n - window) // stride) + 1
        return max(0, (out_ceil - 1) * stride + window - n)

    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((0, pad_for(h)), (0, pad_for(w))),
    )


class _SEGate(nn.Module):
    """GAP -> 1x1 conv (bias) -> relu -> 1x1 conv (bias) -> sigmoid
    (reference senet.py:94-110)."""

    reduction: int

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(channels // self.reduction, (1, 1), name="se_fc1")(g)
        g = jax.nn.relu(g)
        g = nn.Conv(channels, (1, 1), name="se_fc2")(g)
        return x * jax.nn.sigmoid(g)


class SENetBottleneck(nn.Module):
    """One bottleneck of the Cadene SENet family; ``kind`` selects the channel
    flow / stride placement of SEBottleneck, SEResNetBottleneck or
    SEResNeXtBottleneck (reference senet.py:141-206)."""

    kind: str  # 'senet' | 'seresnet' | 'seresnext'
    planes: int
    groups: int
    reduction: int
    stride: int = 1
    downsample_kernel: int = 0  # 0 = identity shortcut
    base_width: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        def norm(name):
            return nn.BatchNorm(use_running_average=not training, name=name)

        if self.kind == "senet":
            c1, c2 = self.planes * 2, self.planes * 4
            s1, s2, g = 1, self.stride, self.groups
        elif self.kind == "seresnet":
            c1, c2 = self.planes, self.planes
            s1, s2, g = self.stride, 1, 1  # Caffe style: stride on conv1
        elif self.kind == "seresnext":
            width = math.floor(self.planes * (self.base_width / 64)) * self.groups
            c1, c2 = width, width
            s1, s2, g = 1, self.stride, self.groups
        else:
            raise ValueError(f"Unknown SENet bottleneck kind {self.kind!r}")
        out_channels = self.planes * 4

        residual = x
        y = nn.Conv(c1, (1, 1), strides=(s1, s1), use_bias=False, name="conv1")(x)
        y = norm("bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(
            c2, (3, 3), strides=(s2, s2), padding=((1, 1), (1, 1)),
            feature_group_count=g, use_bias=False, name="conv2",
        )(y)
        y = norm("bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(out_channels, (1, 1), use_bias=False, name="conv3")(y)
        y = norm("bn3")(y)

        if self.downsample_kernel:
            k = self.downsample_kernel
            p = (k - 1) // 2
            residual = nn.Conv(
                out_channels, (k, k), strides=(self.stride, self.stride),
                padding=((p, p), (p, p)), use_bias=False, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)

        y = _SEGate(self.reduction, name="se")(y) + residual
        return jax.nn.relu(y)


class SENetEncoder(EncoderBase):
    """Feature maps at strides (2, 4, 8, 16, 32), channels
    (inplanes, 256, 512, 1024, 2048)."""

    kind: str = "seresnet"
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 1
    reduction: int = 16
    inplanes: int = 64
    input_3x3: bool = False
    downsample_kernel_size: int = 1
    base_width: int = 4
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (self.inplanes, 256, 512, 1024, 2048)
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        def norm(name):
            return nn.BatchNorm(use_running_average=not training, name=name)

        # layer0 (stem); snapshot BEFORE the maxpool so the first feature map
        # has stride 2, like the reference wrapper (seresnet.py:70-84)
        if self.input_3x3:
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, name="layer0_conv1")(x)
            x = norm("layer0_bn1")(x)
            x = jax.nn.relu(x)
            x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="layer0_conv2")(x)
            x = norm("layer0_bn2")(x)
            x = jax.nn.relu(x)
            x = nn.Conv(self.inplanes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="layer0_conv3")(x)
            x = norm("layer0_bn3")(x)
            x = jax.nn.relu(x)
        else:
            x = nn.Conv(self.inplanes, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False, name="layer0_conv1")(x)
            x = norm("layer0_bn1")(x)
            x = jax.nn.relu(x)

        outputs = [x]
        x = max_pool_ceil(x, 3, 2)

        in_channels = self.inplanes
        for stage, num_blocks in enumerate(self.stage_blocks, start=1):
            planes = 64 * (2 ** (stage - 1))
            stride = 1 if stage == 1 else 2
            dk = 1 if stage == 1 else self.downsample_kernel_size
            for i in range(num_blocks):
                needs_ds = i == 0 and (stride != 1 or in_channels != planes * 4)
                x = SENetBottleneck(
                    kind=self.kind,
                    planes=planes,
                    groups=self.groups,
                    reduction=self.reduction,
                    stride=stride if i == 0 else 1,
                    downsample_kernel=dk if needs_ds else 0,
                    base_width=self.base_width,
                    name=f"layer{stage}_{i}",
                )(x, training=training)
                in_channels = planes * 4
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def senet154_encoder(**kwargs) -> SENetEncoder:
    """SENet154 (reference senet.py:392-409): triple-3x3 stem, 64 groups,
    3x3 downsample convs."""
    return SENetEncoder(
        kind="senet", stage_blocks=(3, 8, 36, 3), groups=64, reduction=16,
        inplanes=128, input_3x3=True, downsample_kernel_size=3, **kwargs
    )


def se_resnet50_encoder(**kwargs) -> SENetEncoder:
    return SENetEncoder(kind="seresnet", stage_blocks=(3, 4, 6, 3), **kwargs)


def se_resnet101_encoder(**kwargs) -> SENetEncoder:
    return SENetEncoder(kind="seresnet", stage_blocks=(3, 4, 23, 3), **kwargs)


def se_resnet152_encoder(**kwargs) -> SENetEncoder:
    return SENetEncoder(kind="seresnet", stage_blocks=(3, 8, 36, 3), **kwargs)


def se_resnext50_encoder(**kwargs) -> SENetEncoder:
    return SENetEncoder(kind="seresnext", stage_blocks=(3, 4, 6, 3), groups=32, base_width=4, **kwargs)


def se_resnext101_encoder(**kwargs) -> SENetEncoder:
    return SENetEncoder(kind="seresnext", stage_blocks=(3, 4, 23, 3), groups=32, base_width=4, **kwargs)
