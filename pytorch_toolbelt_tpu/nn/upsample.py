"""Upsample layer zoo + factory (reference: modules/upsample.py:22-246).

Every resize layer has the uniform signature ``__call__(x, output_size=None)``
with NHWC input.  Under jit, ``output_size`` must be static ints; when None,
the layer upsamples by its ``scale_factor``.
"""

from enum import Enum
from typing import Optional, Tuple, Type, Union

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from .functional import resize_bilinear, resize_nearest
from .initialization import icnr_init

__all__ = [
    "UpsampleLayerType",
    "AbstractResizeLayer",
    "NearestNeighborResizeLayer",
    "BilinearInterpolationLayer",
    "PixelShuffle",
    "PixelShuffleWithLinear",
    "BilinearAdditiveUpsample2d",
    "DeconvolutionUpsample2d",
    "ResidualDeconvolutionUpsample2d",
    "instantiate_upsample_block",
    "upsample_out_channels",
]


class UpsampleLayerType(Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    PIXEL_SHUFFLE = "pixel_shuffle"
    PIXEL_SHUFFLE_LINEAR = "pixel_shuffle_linear"
    DECONVOLUTION = "deconv"
    RESIDUAL_DECONV = "residual_deconv"


class AbstractResizeLayer(nn.Module):
    """Marker base class for resize layers (uniform forward signature)."""


def _target_size(x, output_size, scale_factor) -> Tuple[int, int]:
    if output_size is not None:
        return int(output_size[0]), int(output_size[1])
    return x.shape[1] * scale_factor, x.shape[2] * scale_factor


class NearestNeighborResizeLayer(AbstractResizeLayer):
    scale_factor: int = 2

    def __call__(self, x, output_size=None):
        return resize_nearest(x, _target_size(x, output_size, self.scale_factor))


class BilinearInterpolationLayer(AbstractResizeLayer):
    scale_factor: int = 2
    align_corners: bool = True

    def __call__(self, x, output_size=None):
        return resize_bilinear(
            x, _target_size(x, output_size, self.scale_factor), align_corners=self.align_corners
        )


class PixelShuffle(AbstractResizeLayer):
    """Depth-to-space upsampling; fixes channels with a 1x1 conv if not
    divisible (reference upsample.py:122-147; keeps its n = 2**scale quirk)."""

    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, output_size=None):
        n = 2**self.scale_factor
        in_channels = x.shape[-1]
        out_channels = in_channels // n
        rounded = out_channels * n
        if in_channels != rounded:
            x = nn.Conv(rounded, (1, 1), use_bias=False)(x)
        return rearrange(
            x, "b h w (c s1 s2) -> b (h s1) (w s2) c", s1=self.scale_factor, s2=self.scale_factor
        )


class PixelShuffleWithLinear(AbstractResizeLayer):
    """Channel-preserving pixel shuffle: conv expands channels by s^2 then
    depth-to-space; conv kernel gets ICNR init (reference upsample.py:150-170)."""

    scale_factor: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, output_size=None):
        s = self.scale_factor
        in_channels = x.shape[-1]
        x = nn.Conv(
            in_channels * s * s,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=False,
            kernel_init=icnr_init(s),
        )(x)
        return rearrange(x, "b h w (c s1 s2) -> b (h s1) (w s2) c", s1=s, s2=s)


class BilinearAdditiveUpsample2d(AbstractResizeLayer):
    """Bilinear upsample then average groups of n channels
    (arXiv:1707.05847; reference upsample.py:173-194)."""

    scale_factor: int = 2

    def __call__(self, x, output_size=None):
        n = 2**self.scale_factor
        in_channels = x.shape[-1]
        if in_channels % n != 0:
            raise ValueError(f"Number of input channels ({in_channels}) must be divisible by n ({n})")
        x = resize_bilinear(x, _target_size(x, output_size, self.scale_factor), align_corners=True)
        b, h, w, c = x.shape
        return x.reshape(b, h, w, c // n, n).mean(-1)


class DeconvolutionUpsample2d(AbstractResizeLayer):
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, output_size=None):
        if self.scale_factor != 2:
            raise NotImplementedError("Scale factor other than 2 is not implemented")
        return nn.ConvTranspose(x.shape[-1], (3, 3), strides=(2, 2), padding="SAME")(x)


class ResidualDeconvolutionUpsample2d(AbstractResizeLayer):
    """Deconv to C/4 channels + bilinear-additive residual
    (reference upsample.py:210-227)."""

    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, output_size=None):
        if self.scale_factor != 2:
            raise NotImplementedError("Scale factor other than 2 is not implemented")
        n = self.scale_factor * self.scale_factor
        residual = BilinearAdditiveUpsample2d(self.scale_factor)(x)
        out = nn.ConvTranspose(x.shape[-1] // n, (3, 3), strides=(2, 2), padding="SAME")(x)
        return out + residual


_LAYERS = {
    UpsampleLayerType.NEAREST: NearestNeighborResizeLayer,
    UpsampleLayerType.BILINEAR: BilinearInterpolationLayer,
    UpsampleLayerType.PIXEL_SHUFFLE: PixelShuffle,
    UpsampleLayerType.PIXEL_SHUFFLE_LINEAR: PixelShuffleWithLinear,
    UpsampleLayerType.DECONVOLUTION: DeconvolutionUpsample2d,
    UpsampleLayerType.RESIDUAL_DECONV: ResidualDeconvolutionUpsample2d,
}


def upsample_out_channels(
    block: Union[str, UpsampleLayerType, Type[AbstractResizeLayer]], in_channels: int, scale_factor: int
) -> int:
    """Channel count a resize layer will output for given input channels —
    the static analogue of the reference's ``layer.out_channels``."""
    if isinstance(block, str):
        block = UpsampleLayerType(block)
    if isinstance(block, UpsampleLayerType):
        block = _LAYERS[block]
    if block in (NearestNeighborResizeLayer, BilinearInterpolationLayer, DeconvolutionUpsample2d):
        return in_channels
    if block is PixelShuffle:
        return in_channels // (2**scale_factor)
    if block is PixelShuffleWithLinear:
        return in_channels
    if block is BilinearAdditiveUpsample2d:
        return in_channels // (2**scale_factor)
    if block is ResidualDeconvolutionUpsample2d:
        return in_channels // (scale_factor * scale_factor)
    raise ValueError(f"Unknown upsample block {block}")


def instantiate_upsample_block(
    block: Union[str, UpsampleLayerType, Type[AbstractResizeLayer]],
    scale_factor: int = 2,
    **kwargs,
) -> AbstractResizeLayer:
    if isinstance(block, str):
        block = UpsampleLayerType(block)
    if isinstance(block, UpsampleLayerType):
        block = _LAYERS[block]
    return block(scale_factor=scale_factor, **kwargs)
