from .activations import (
    ABN,
    AGN,
    ACT_CELU,
    ACT_ELU,
    ACT_GELU,
    ACT_GLU,
    ACT_HARD_SIGMOID,
    ACT_HARD_SWISH,
    ACT_LEAKY_RELU,
    ACT_MISH,
    ACT_MISH_NAIVE,
    ACT_NONE,
    ACT_PRELU,
    ACT_RELU,
    ACT_RELU6,
    ACT_SELU,
    ACT_SIGMOID,
    ACT_SILU,
    ACT_SOFTMAX,
    ACT_SOFTPLUS,
    ACT_SWISH,
    ACT_SWISH_NAIVE,
    PReLU,
    get_activation_block,
    get_activation_fn,
    hard_sigmoid,
    hard_swish,
    instantiate_activation_block,
    mish,
    mish_naive,
    sanitize_activation_name,
    swish,
    swish_naive,
)
from .coord_conv import AddCoords, CoordConv, append_coords
from .drop_path import DropPath, drop_path
from .dropblock import DropBlock2D, DropBlock3D, DropBlockScheduled
from .dsconv import DepthwiseSeparableConv2d, DepthwiseSeparableConv2dBlock
from .fpn import FPNBottleneckBlock, FPNContextBlock, FPNFuse, FPNFuseSum, HFF
from .functional import resize_2d, resize_bilinear, resize_nearest
from .initialization import (
    bilinear_upsample_initializer,
    first_class_background_init_bias,
    icnr_init,
    zeros_kernel_init,
)
from .normalization import (
    NORM_BATCH,
    NORM_GROUP,
    NORM_INSTANCE,
    Normalization,
    instantiate_normalization_block,
)
from .ocnet import ASPObjectContextBlock, ObjectContextBlock, PyramidObjectContextBlock
from .pooling import (
    GWAP,
    GeneralizedMeanPooling2d,
    GlobalAvgPool2d,
    GlobalKMaxPool2d,
    GlobalMaxAvgPooling2d,
    GlobalMaxPool2d,
    GlobalRankPooling,
    GlobalWeightedAvgPool2d,
    MILCustomPoolingModule,
    RMSPool,
)
from .scse import (
    ChannelGate2d,
    ChannelSpatialGate2d,
    ChannelSpatialGate2dV2,
    SpatialGate2d,
    SpatialGate2dV2,
)
from .simple import Identity, conv1x1, conv3x3
from .spp import ASPP, ASPPModule, ASPPPooling, SeparableASPPModule
from .srm import SRMLayer
from .unet import UnetBlock, UnetResidualBlock
from .upsample import (
    AbstractResizeLayer,
    BilinearAdditiveUpsample2d,
    BilinearInterpolationLayer,
    DeconvolutionUpsample2d,
    NearestNeighborResizeLayer,
    PixelShuffle,
    PixelShuffleWithLinear,
    ResidualDeconvolutionUpsample2d,
    UpsampleLayerType,
    instantiate_upsample_block,
    upsample_out_channels,
)
