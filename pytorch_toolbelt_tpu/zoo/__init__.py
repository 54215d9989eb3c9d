from .encoders.common import EncoderBase, change_stem_input_channels, make_n_channel_input_kernel
from .encoders.unet import UnetEncoder
from .decoders.unet import UNetDecoder
from .heads.resize import ResizeHead
from .models import EncoderDecoderModel, UNetSegmentationModel

__all__ = [
    "EncoderBase",
    "EncoderDecoderModel",
    "ResizeHead",
    "UNetDecoder",
    "UNetSegmentationModel",
    "UnetEncoder",
    "change_stem_input_channels",
    "make_n_channel_input_kernel",
]
