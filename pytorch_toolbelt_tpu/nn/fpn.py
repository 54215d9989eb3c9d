"""FPN fusion blocks (reference: modules/fpn.py:14-190)."""

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .activations import ACT_RELU, ABN
from .functional import resize_2d

__all__ = ["FPNContextBlock", "FPNBottleneckBlock", "FPNFuse", "FPNFuseSum", "HFF"]


class FPNContextBlock(nn.Module):
    """Center FPN block aggregating multi-scale context via strided average
    poolings (reference fpn.py:14-77)."""

    out_channels: int
    activation: str = ACT_RELU
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_channels = x.shape[-1]
        x = nn.Conv(in_channels // 2, (1, 1))(x)

        def pool(x, k):
            return nn.avg_pool(x, (k, k), strides=(k, k))

        p2 = nn.Conv(in_channels // 8, (1, 1))(pool(x, 2))
        p4 = nn.Conv(in_channels // 8, (1, 1))(pool(x, 4))
        p8 = nn.Conv(in_channels // 8, (1, 1))(pool(x, 8))
        pg = nn.Conv(in_channels // 8, (1, 1))(jnp.mean(x, axis=(1, 2), keepdims=True))

        out_size = p2.shape[1:3]
        x = jnp.concatenate(
            [
                p2,
                resize_2d(p4, out_size, mode="nearest"),
                resize_2d(p8, out_size, mode="nearest"),
                resize_2d(pg, out_size, mode="nearest"),
            ],
            axis=-1,
        )
        x = nn.Conv(self.out_channels, (1, 1))(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = ABN(activation=self.activation)(x, training=training)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = ABN(activation=self.activation)(x, training=training)
        return x


class FPNBottleneckBlock(nn.Module):
    """conv-abn-dropout-conv-abn (reference fpn.py:80-108)."""

    out_channels: int
    activation: str = ACT_RELU
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = ABN(activation=self.activation)(x, training=training)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = ABN(activation=self.activation)(x, training=training)
        return x


class FPNFuse(nn.Module):
    """Resize all maps to the first (finest) and concat (reference fpn.py:111-125)."""

    mode: str = "bilinear"
    align_corners: bool = False

    def __call__(self, features: List[jnp.ndarray]) -> jnp.ndarray:
        dst_size = features[0].shape[1:3]
        layers = [
            resize_2d(f, dst_size, mode=self.mode, align_corners=self.align_corners) for f in features
        ]
        return jnp.concatenate(layers, axis=-1)


class FPNFuseSum(nn.Module):
    """Resize all maps to the first and sum (reference fpn.py:128-143)."""

    mode: str = "bilinear"
    align_corners: bool = False

    def __call__(self, features: List[jnp.ndarray]) -> jnp.ndarray:
        dst_size = features[0].shape[1:3]
        output = features[0]
        for f in features[1:]:
            output = output + resize_2d(f, dst_size, mode=self.mode, align_corners=self.align_corners)
        return output


class HFF(nn.Module):
    """Hierarchical feature fusion (arXiv:1811.11431; reference fpn.py:146-190):
    out = f0 + up(f1 + up(f2 + up(...)))."""

    upsample_scale: int = 2
    mode: str = "nearest"
    align_corners: Optional[bool] = None
    sizes: Optional[Sequence] = None

    def __call__(self, features: List[jnp.ndarray]) -> jnp.ndarray:
        current = features[-1]
        for i in reversed(range(len(features) - 1)):
            target_size = (
                self.sizes[i] if self.sizes is not None else features[i].shape[1:3]
            )
            up = resize_2d(current, target_size, mode=self.mode, align_corners=bool(self.align_corners))
            current = features[i] + up
        return current
