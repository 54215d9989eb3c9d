"""Encoder-decoder-head composition (the reference README's canonical model,
README.md:71-82) + a ready-made UNet for segmentation."""

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.activations import ACT_RELU
from ..nn.normalization import NORM_BATCH
from .decoders.unet import UNetDecoder
from .encoders.unet import UnetEncoder
from .heads.resize import ResizeHead

__all__ = ["EncoderDecoderModel", "UNetSegmentationModel"]


class EncoderDecoderModel(nn.Module):
    """Generic encoder -> decoder -> head pipeline.

    Head output size defaults to the input's spatial size (the jit-static
    analogue of reference models passing x.size() as output_size hint).
    """

    encoder: nn.Module
    decoder: nn.Module
    head: nn.Module

    def __call__(self, x: jnp.ndarray, training: bool = False):
        feature_maps = self.encoder(x, training=training)
        feature_maps = self.decoder(feature_maps, training=training)
        return self.head(feature_maps, output_size=x.shape[1:3], training=training)


class UNetSegmentationModel(nn.Module):
    """The README's canonical UNet (UnetEncoder + UNetDecoder + conv head)."""

    num_classes: int
    encoder_channels: int = 32
    num_layers: int = 4
    growth_factor: int = 2
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    dropout_rate: float = 0.0
    output_name: Optional[str] = None

    def decoder_channels(self) -> Tuple[int, ...]:
        return tuple(
            self.encoder_channels * (self.growth_factor**i) for i in range(self.num_layers - 1)
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False):
        encoder = UnetEncoder(
            out_channels=self.encoder_channels,
            num_layers=self.num_layers,
            growth_factor=self.growth_factor,
            activation=self.activation,
            normalization=self.normalization,
        )
        decoder = UNetDecoder(
            input_spec=encoder.get_output_spec(),
            out_channels=self.decoder_channels(),
            activation=self.activation,
            normalization=self.normalization,
        )
        head = ResizeHead(
            input_spec=decoder.get_output_spec(),
            num_classes=self.num_classes,
            dropout_rate=self.dropout_rate,
            output_name=self.output_name,
        )
        feature_maps = encoder(x, training=training)
        feature_maps = decoder(feature_maps, training=training)
        return head(feature_maps, output_size=x.shape[1:3], training=training)
