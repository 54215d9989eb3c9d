"""ResNet-family encoders (capability target: modules/encoders/resnet.py:23-82
and seresnet.py:33-126 — torchvision/SENet-backed in the reference; own
flax implementation here, NHWC, MXU-friendly).

Feature list contract: [stem(stride 2), stage1(stride 4), stage2(stride 8),
stage3(stride 16), stage4(stride 32)] like the reference encoders.

Supports:
* BasicBlock (18/34) and Bottleneck (50/101/152)
* Squeeze-and-Excitation variants (SE-ResNet / SE-ResNeXt via groups)
"""

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.scse import SpatialGate2d
from .common import EncoderBase

__all__ = [
    "ResNetEncoder",
    "resnet18_encoder",
    "resnet34_encoder",
    "resnet50_encoder",
    "resnet101_encoder",
    "resnet152_encoder",
    "seresnet50_encoder",
    "seresnet101_encoder",
    "seresnet152_encoder",
    "seresnext50_encoder",
    "seresnext101_encoder",
    "resnet26d_encoder",
    "resnet50d_encoder",
    "resnet101d_encoder",
    "resnet152d_encoder",
    "resnet200d_encoder",
    "seresnet152d_encoder",
    "swsl_resnext101_encoder",
]


class _SEModule(nn.Module):
    """Classic SE gate (GAP -> fc -> relu -> fc -> sigmoid)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(max(1, channels // self.reduction), (1, 1))(g)
        g = jax.nn.relu(g)
        g = nn.Conv(channels, (1, 1))(g)
        return x * jax.nn.sigmoid(g)


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    use_se: bool = False
    se_reduction: int = 16

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        residual = x
        y = nn.Conv(self.out_channels, (3, 3), strides=(self.stride, self.stride), padding="SAME", use_bias=False)(x)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = norm()(y)
        if self.use_se:
            y = _SEModule(self.se_reduction)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride), use_bias=False
            )(x)
            residual = norm()(residual)
        return jax.nn.relu(y + residual)


class Bottleneck(nn.Module):
    out_channels: int  # expanded channels (width * 4)
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    se_reduction: int = 16
    expansion: int = 4
    avg_down: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        width = int(self.out_channels / self.expansion * (self.base_width / 64.0)) * self.groups
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False)(x)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = nn.Conv(
            width, (3, 3), strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=self.groups, use_bias=False,
        )(y)
        y = norm()(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        if self.use_se:
            y = _SEModule(self.se_reduction)(y)
        if residual.shape != y.shape:
            shortcut_in = x
            if self.avg_down and self.stride > 1:
                # ResNet-D trick (timm resnet.py:26-228 presets): anti-aliased
                # shortcut = avg-pool then stride-1 1x1 conv
                shortcut_in = nn.avg_pool(x, (2, 2), strides=(2, 2))
            residual = nn.Conv(
                self.out_channels, (1, 1),
                strides=(1, 1) if (self.avg_down and self.stride > 1) else (self.stride, self.stride),
                use_bias=False,
            )(shortcut_in)
            residual = norm()(residual)
        return jax.nn.relu(y + residual)


class ResNetEncoder(EncoderBase):
    """Configurable ResNet/SE-ResNet/ResNeXt encoder."""

    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    bottleneck: bool = False
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    stem_channels: int = 64
    deep_stem: bool = False  # ResNet-D: three 3x3 convs instead of one 7x7
    avg_down: bool = False   # ResNet-D: avg-pool + 1x1 shortcut downsample
    layers: Optional[Tuple[int, ...]] = None  # subset of feature maps to return

    def _stage_channels(self) -> Tuple[int, ...]:
        expansion = 4 if self.bottleneck else 1
        return tuple(64 * (2**i) * expansion for i in range(4))

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (self.stem_channels,) + self._stage_channels()
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        block_cls = Bottleneck if self.bottleneck else BasicBlock
        outputs = []

        if self.deep_stem:
            # ResNet-D deep stem (timm resnet.py:26-228): 3x3/2 -> 3x3 -> 3x3
            mid = self.stem_channels // 2
            x = nn.Conv(mid, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training)(x)
            x = jax.nn.relu(x)
            x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not training)(x)
            x = jax.nn.relu(x)
            x = nn.Conv(self.stem_channels, (3, 3), padding="SAME", use_bias=False)(x)
        else:
            # stem: 7x7/2 conv + BN + relu
            x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage_index, (num_blocks, channels) in enumerate(
            zip(self.stage_blocks, self._stage_channels())
        ):
            stride = 1 if stage_index == 0 else 2
            for block_index in range(num_blocks):
                kwargs = dict(
                    out_channels=channels,
                    stride=stride if block_index == 0 else 1,
                    use_se=self.use_se,
                )
                if self.bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.base_width,
                                  avg_down=self.avg_down)
                x = block_cls(**kwargs)(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def resnet18_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(2, 2, 2, 2), bottleneck=False, **kwargs)


def resnet34_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 4, 6, 3), bottleneck=False, **kwargs)


def resnet50_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 4, 6, 3), bottleneck=True, **kwargs)


def resnet101_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 4, 23, 3), bottleneck=True, **kwargs)


def resnet152_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 8, 36, 3), bottleneck=True, **kwargs)


def seresnet50_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 4, 6, 3), bottleneck=True, use_se=True, **kwargs)


def seresnet101_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 4, 23, 3), bottleneck=True, use_se=True, **kwargs)


def seresnet152_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(stage_blocks=(3, 8, 36, 3), bottleneck=True, use_se=True, **kwargs)


def seresnext50_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(
        stage_blocks=(3, 4, 6, 3), bottleneck=True, use_se=True, groups=32, base_width=4, **kwargs
    )


def seresnext101_encoder(**kwargs) -> ResNetEncoder:
    return ResNetEncoder(
        stage_blocks=(3, 4, 23, 3), bottleneck=True, use_se=True, groups=32, base_width=4, **kwargs
    )


# -- ResNet-D deep-stem family (capability target: timm/resnet.py:139-228) --


def _resnet_d(stage_blocks, **kwargs) -> ResNetEncoder:
    return ResNetEncoder(
        stage_blocks=stage_blocks, bottleneck=True, deep_stem=True, avg_down=True, **kwargs
    )


def resnet26d_encoder(**kwargs) -> ResNetEncoder:
    return _resnet_d((2, 2, 2, 2), **kwargs)


def resnet50d_encoder(**kwargs) -> ResNetEncoder:
    return _resnet_d((3, 4, 6, 3), **kwargs)


def resnet101d_encoder(**kwargs) -> ResNetEncoder:
    return _resnet_d((3, 4, 23, 3), **kwargs)


def resnet152d_encoder(**kwargs) -> ResNetEncoder:
    return _resnet_d((3, 8, 36, 3), **kwargs)


def resnet200d_encoder(**kwargs) -> ResNetEncoder:
    return _resnet_d((3, 24, 36, 3), **kwargs)


def seresnet152d_encoder(**kwargs) -> ResNetEncoder:
    return _resnet_d((3, 8, 36, 3), use_se=True, **kwargs)


def swsl_resnext101_encoder(**kwargs) -> ResNetEncoder:
    """ResNeXt101 32x8d architecture (the SWSL preset differs only in its
    pretrained weights, timm/resnet.py:106-136)."""
    return ResNetEncoder(
        stage_blocks=(3, 4, 23, 3), bottleneck=True, groups=32, base_width=8, **kwargs
    )
