"""TResNet encoders (arXiv:2003.13630; capability target:
modules/encoders/timm/resnet.py TResNet variants — timm-backed in the
reference; own flax implementation, NHWC).

TPU-relevant tricks kept: SpaceToDepth stem (turns the expensive stride-4
stem into one dense 1x1-equivalent conv over 48 channels — exactly the kind
of input reshaping TPUs love), anti-aliased (blur-pool) downsampling, SE in
the early stages.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = ["TResNetEncoder", "tresnet_m_encoder", "tresnet_l_encoder", "tresnet_xl_encoder"]


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    return rearrange(x, "b (h s1) (w s2) c -> b h w (c s1 s2)", s1=block, s2=block)


class BlurPool(nn.Module):
    """Anti-aliased stride-2 downsampling with a fixed 3x3 binomial filter."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        filt = np.array([1.0, 2.0, 1.0])
        kernel2d = np.outer(filt, filt)
        kernel2d = kernel2d / kernel2d.sum()
        kernel = jnp.asarray(kernel2d, x.dtype)[..., None, None]  # [3,3,1,1]
        kernel = jnp.tile(kernel, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


# classic SE gate: reuse the library block instead of re-implementing
from ...nn.scse import SpatialGate2d as _SE  # noqa: E402


class TResNetBasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    use_se: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        y = x
        if self.stride == 2:
            y = BlurPool()(y)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = jax.nn.leaky_relu(norm()(y), 1e-3)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = norm()(y)
        if self.use_se:
            y = _SE(reduction=4)(y)
        residual = x
        if self.stride == 2:
            residual = BlurPool()(residual)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), use_bias=False)(residual)
            residual = norm()(residual)
        return jax.nn.leaky_relu(y + residual, 1e-3)


class TResNetBottleneck(nn.Module):
    out_channels: int
    stride: int = 1
    use_se: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        width = self.out_channels // self.expansion
        y = nn.Conv(width, (1, 1), use_bias=False)(x)
        y = jax.nn.leaky_relu(norm()(y), 1e-3)
        if self.stride == 2:
            y = BlurPool()(y)
        y = nn.Conv(width, (3, 3), padding="SAME", use_bias=False)(y)
        y = jax.nn.leaky_relu(norm()(y), 1e-3)
        if self.use_se:
            y = _SE(reduction=8)(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False)(y)
        y = norm()(y)
        residual = x
        if self.stride == 2:
            residual = BlurPool()(residual)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), use_bias=False)(residual)
            residual = norm()(residual)
        return jax.nn.leaky_relu(y + residual, 1e-3)


class TResNetEncoder(EncoderBase):
    width_factor: float = 1.0
    stage_blocks: Tuple[int, ...] = (3, 4, 11, 3)
    layers: Optional[Tuple[int, ...]] = None

    def _stage_channels(self) -> Tuple[int, ...]:
        base = int(64 * self.width_factor)
        return (base, base * 2, base * 4 * 4, base * 8 * 4)  # stages 3/4 are bottleneck (x4)

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (int(64 * self.width_factor),) + self._stage_channels()
        strides = (4, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        base = int(64 * self.width_factor)
        outputs = []
        # SpaceToDepth stem: stride 4 for free, then a dense 3x3 conv
        x = space_to_depth(x, 4)
        x = nn.Conv(base, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.leaky_relu(x, 1e-3)
        outputs.append(x)

        stage_channels = self._stage_channels()
        for stage, (num_blocks, channels) in enumerate(zip(self.stage_blocks, stage_channels)):
            bottleneck = stage >= 2
            block_cls = TResNetBottleneck if bottleneck else TResNetBasicBlock
            use_se = stage <= 2
            for i in range(num_blocks):
                x = block_cls(
                    channels,
                    stride=(2 if stage > 0 and i == 0 else 1),
                    use_se=use_se,
                )(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def tresnet_m_encoder(**kwargs):
    return TResNetEncoder(width_factor=1.0, stage_blocks=(3, 4, 11, 3), **kwargs)


def tresnet_l_encoder(**kwargs):
    return TResNetEncoder(width_factor=1.2, stage_blocks=(4, 5, 18, 3), **kwargs)


def tresnet_xl_encoder(**kwargs):
    return TResNetEncoder(width_factor=1.3, stage_blocks=(4, 5, 24, 3), **kwargs)
