from .decoders.bifpn import BiFPNBlock, BiFPNConvBlock, BiFPNDecoder
from .decoders.can import CANDecoder
from .decoders.deeplab import DeeplabV3Decoder, DeeplabV3PlusDecoder
from .decoders.fpn import FPNDecoder
from .decoders.unet import UNetDecoder
from .encoders.common import EncoderBase, GenericEncoder, change_stem_input_channels, make_n_channel_input_kernel
from .encoders.densenet import (
    DenseNetEncoder,
    densenet121_encoder,
    densenet161_encoder,
    densenet169_encoder,
    densenet201_encoder,
)
from .encoders.efficientnet import (
    EfficientNetEncoder,
    efficientnet_b0_encoder,
    efficientnet_b1_encoder,
    efficientnet_b2_encoder,
    efficientnet_b3_encoder,
    efficientnet_b4_encoder,
    efficientnet_b5_encoder,
    efficientnet_b6_encoder,
    efficientnet_b7_encoder,
)
from .encoders.hourglass import StackedHGEncoder, StackedSupervisedHGEncoder
from .encoders.hrnet import HRNetEncoder, hrnet18_encoder, hrnet34_encoder, hrnet48_encoder
from .encoders.inception import InceptionV4Encoder, inception_v4_encoder
from .encoders.mix_transformer import (
    MixVisionTransformerEncoder,
    mit_b0_encoder,
    mit_b1_encoder,
    mit_b2_encoder,
    mit_b3_encoder,
    mit_b4_encoder,
    mit_b5_encoder,
)
from .encoders.mobilenet import (
    MobileNetV2Encoder,
    MobileNetV3Encoder,
    mobilenet_v3_large_encoder,
    mobilenet_v3_small_encoder,
)
from .encoders.squeezenet import SqueezeNetEncoder, squeezenet_encoder
from .encoders.swin import (
    SwinTransformerEncoder,
    swin_base_encoder,
    swin_large_encoder,
    swin_small_encoder,
    swin_tiny_encoder,
)
from .encoders.wide_resnet import (
    WiderResNetA2Encoder,
    WiderResNetEncoder,
    wider_resnet16_a2_encoder,
    wider_resnet20_a2_encoder,
    wider_resnet38_a2_encoder,
    wider_resnet16_encoder,
    wider_resnet20_encoder,
    wider_resnet38_encoder,
)
from .encoders.xresnet import (
    XResNetEncoder,
    se_xresnet18_encoder,
    se_xresnet34_encoder,
    se_xresnet50_encoder,
    se_xresnet101_encoder,
    se_xresnet152_encoder,
    xresnet18_encoder,
    xresnet34_encoder,
    xresnet50_encoder,
    xresnet101_encoder,
    xresnet152_encoder,
)
from .encoders.res2net import Res2NetEncoder, res2net50_encoder, res2net101_encoder, res2next50_encoder
from .encoders.dpn import DPNEncoder, dpn68_encoder, dpn92_encoder
from .encoders.efficientnet_v2 import EfficientNetV2Encoder, efficientnet_v2_m_encoder, efficientnet_v2_s_encoder
from .encoders.nfnet import NFNetEncoder, nf_regnet_b0_encoder, nfnet_f0_encoder, nfnet_f1_encoder
from .encoders.skresnet import SKResNetEncoder, skresnet18_encoder, skresnet34_encoder, skresnet50_encoder
from .encoders.maxvit import MaxViTEncoder, maxvit_small_encoder, maxvit_tiny_encoder
from .encoders.tresnet import TResNetEncoder, tresnet_l_encoder, tresnet_m_encoder, tresnet_xl_encoder
from .encoders.mixnet import MixNetEncoder, mixnet_m_encoder, mixnet_s_encoder, mixnet_xl_encoder
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
from .encoders.senet import (
    SENetEncoder,
    se_resnet50_encoder,
    se_resnet101_encoder,
    se_resnet152_encoder,
    se_resnext50_encoder,
    se_resnext101_encoder,
    senet154_encoder,
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
from .decoders.ppm import PPMDecoder
from .porting import convert_torch_tensor, port_torch_state_dict
from .models import EncoderDecoderModel, UNetSegmentationModel

__all__ = [
    "MixNetEncoder",
    "mixnet_m_encoder",
    "mixnet_s_encoder",
    "mixnet_xl_encoder",
    "WiderResNetA2Encoder",
    "wider_resnet16_a2_encoder",
    "wider_resnet20_a2_encoder",
    "wider_resnet38_a2_encoder",
    "MaxViTEncoder",
    "TResNetEncoder",
    "maxvit_small_encoder",
    "maxvit_tiny_encoder",
    "tresnet_l_encoder",
    "tresnet_m_encoder",
    "tresnet_xl_encoder",
    "GenericEncoder",
    "SKResNetEncoder",
    "skresnet18_encoder",
    "skresnet34_encoder",
    "skresnet50_encoder",
    "EfficientNetV2Encoder",
    "NFNetEncoder",
    "efficientnet_v2_m_encoder",
    "efficientnet_v2_s_encoder",
    "nf_regnet_b0_encoder",
    "nfnet_f0_encoder",
    "nfnet_f1_encoder",
    "DPNEncoder",
    "Res2NetEncoder",
    "dpn68_encoder",
    "dpn92_encoder",
    "res2net50_encoder",
    "res2net101_encoder",
    "res2next50_encoder",
    "PPMDecoder",
    "convert_torch_tensor",
    "port_torch_state_dict",
    "DenseNetEncoder",
    "EfficientNetEncoder",
    "HRNetEncoder",
    "InceptionV4Encoder",
    "MixVisionTransformerEncoder",
    "MobileNetV2Encoder",
    "MobileNetV3Encoder",
    "SqueezeNetEncoder",
    "StackedHGEncoder",
    "StackedSupervisedHGEncoder",
    "SwinTransformerEncoder",
    "WiderResNetEncoder",
    "XResNetEncoder",
    "densenet121_encoder",
    "densenet161_encoder",
    "densenet169_encoder",
    "densenet201_encoder",
    "efficientnet_b0_encoder",
    "efficientnet_b1_encoder",
    "efficientnet_b2_encoder",
    "efficientnet_b3_encoder",
    "efficientnet_b4_encoder",
    "efficientnet_b5_encoder",
    "efficientnet_b6_encoder",
    "efficientnet_b7_encoder",
    "hrnet18_encoder",
    "hrnet34_encoder",
    "hrnet48_encoder",
    "inception_v4_encoder",
    "mit_b0_encoder",
    "mit_b1_encoder",
    "mit_b2_encoder",
    "mit_b3_encoder",
    "mit_b4_encoder",
    "mit_b5_encoder",
    "mobilenet_v3_large_encoder",
    "mobilenet_v3_small_encoder",
    "se_xresnet101_encoder",
    "se_xresnet152_encoder",
    "se_xresnet18_encoder",
    "se_xresnet34_encoder",
    "se_xresnet50_encoder",
    "squeezenet_encoder",
    "swin_base_encoder",
    "swin_large_encoder",
    "swin_small_encoder",
    "swin_tiny_encoder",
    "wider_resnet16_encoder",
    "wider_resnet20_encoder",
    "wider_resnet38_encoder",
    "xresnet101_encoder",
    "xresnet152_encoder",
    "xresnet18_encoder",
    "xresnet34_encoder",
    "xresnet50_encoder",
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
