"""U-Net conv blocks (reference: modules/unet.py:10-97)."""

from typing import Optional

import flax.linen as nn

from .activations import ACT_RELU, instantiate_activation_block
from .drop_path import DropPath
from .normalization import NORM_BATCH, Normalization

__all__ = ["UnetBlock", "UnetResidualBlock"]


class UnetBlock(nn.Module):
    """Two 3x3 convs, each followed by norm + activation."""

    out_channels: int
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = Normalization(self.normalization)(x, training=training)
        x = act(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = Normalization(self.normalization)(x, training=training)
        x = act(x)
        return x


class UnetResidualBlock(nn.Module):
    """Residual variant with optional stochastic depth
    (reference unet.py:50-97)."""

    out_channels: int
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)
        in_channels = x.shape[-1]
        residual = (
            nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
            if in_channels != self.out_channels
            else x
        )
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        y = Normalization(self.normalization)(y, training=training)
        y = act(y)
        y = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = Normalization(self.normalization)(y, training=training)
        if self.drop_path_rate > 0.0:
            y = DropPath(self.drop_path_rate)(y, training=training)
        return act(y + residual)
