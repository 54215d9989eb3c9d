from .decoders.bifpn import BiFPNBlock, BiFPNConvBlock, BiFPNDecoder
from .decoders.can import CANDecoder
from .decoders.deeplab import DeeplabV3Decoder, DeeplabV3PlusDecoder
from .decoders.fpn import FPNDecoder
from .decoders.unet import UNetDecoder
from .encoders.common import EncoderBase, change_stem_input_channels, make_n_channel_input_kernel
from .encoders.resnet import (
    ResNetEncoder,
    resnet18_encoder,
    resnet34_encoder,
    resnet50_encoder,
    resnet101_encoder,
    resnet152_encoder,
    seresnet50_encoder,
    seresnet101_encoder,
    seresnet152_encoder,
    seresnext50_encoder,
    seresnext101_encoder,
)
from .encoders.unet import UnetEncoder
from .heads.classification import (
    FullyConnectedClassificationHead,
    GeneralizedMeanPoolingClassificationHead,
    GenericPoolingClassificationHead,
    GlobalAveragePoolingClassificationHead,
    GlobalMaxAvgPoolingClassificationHead,
    GlobalMaxAvgSumPoolingClassificationHead,
    GlobalMaxPoolingClassificationHead,
)
from .heads.deep_supervision import DeepSupervisionHead
from .heads.hypercolumn import HypercolumnHead
from .heads.progressive_shuffle import ProgressiveShuffleHead
from .heads.resize import ResizeHead
from .heads.segformer import SegFormerHead
from .models import EncoderDecoderModel, UNetSegmentationModel

__all__ = [
    "BiFPNBlock",
    "BiFPNConvBlock",
    "BiFPNDecoder",
    "CANDecoder",
    "DeepSupervisionHead",
    "DeeplabV3Decoder",
    "DeeplabV3PlusDecoder",
    "EncoderBase",
    "EncoderDecoderModel",
    "FPNDecoder",
    "FullyConnectedClassificationHead",
    "GeneralizedMeanPoolingClassificationHead",
    "GenericPoolingClassificationHead",
    "GlobalAveragePoolingClassificationHead",
    "GlobalMaxAvgPoolingClassificationHead",
    "GlobalMaxAvgSumPoolingClassificationHead",
    "GlobalMaxPoolingClassificationHead",
    "HypercolumnHead",
    "ProgressiveShuffleHead",
    "ResNetEncoder",
    "ResizeHead",
    "SegFormerHead",
    "UNetDecoder",
    "UNetSegmentationModel",
    "UnetEncoder",
    "change_stem_input_channels",
    "make_n_channel_input_kernel",
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
]
