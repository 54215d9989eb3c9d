"""WiderResNet encoders (Mapillary inplace-ABN family; parity target:
modules/encoders/wide_resnet.py:19-165 + modules/backbone/wider_resnet.py).

Pre-activation identity-residual blocks; channels per module
(64, 128, 256, 512, 1024, 2048, 4096).

Downsampling policies, matching the reference exactly:

* base (``WiderResNet``): max-pool 3x3/2 before each of modules 2..6; all
  blocks stride 1 (wider_resnet.py:102-167).
* a2 (``WiderResNetA2``): max-pool before modules 2-3 only; modules 4-6
  downsample with a STRIDED first block (stride on conv1 + strided 1x1
  shortcut projection, wider_resnet.py:204-214); modules 6-7 carry in-block
  Dropout2d 0.3/0.5 (training only).
* a2 + ``dilation=True``: only module 4 downsamples; modules 5-7 use
  dilation 2/4/4, output stride 8 (wider_resnet.py:207-214).

Torch checkpoints port via zoo/porting.py wider_resnet_mapping (explicit
module names below mirror the torch layout).
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from .common import EncoderBase

__all__ = [
    "WiderResNetEncoder",
    "WiderResNetA2Encoder",
    "IdentityResidualBlock",
    "wider_resnet16_encoder",
    "wider_resnet20_encoder",
    "wider_resnet38_encoder",
    "wider_resnet16_a2_encoder",
    "wider_resnet20_a2_encoder",
    "wider_resnet38_a2_encoder",
]

# channel tuples per module; 3-tuple means bottleneck block
_MODULE_CHANNELS = (
    (128, 128),
    (256, 256),
    (512, 512),
    (512, 1024),
    (512, 1024, 2048),
    (1024, 2048, 4096),
)


class IdentityResidualBlock(nn.Module):
    channels: Tuple[int, ...]
    stride: int = 1
    dilation: int = 1
    dropout_rate: float = 0.0
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)

        def norm(name):
            return nn.BatchNorm(use_running_average=not training, name=name)

        s = (self.stride, self.stride)
        d = (self.dilation, self.dilation)
        p = ((self.dilation, self.dilation), (self.dilation, self.dilation))

        pre = act(norm("bn1")(x))
        need_proj = self.stride != 1 or x.shape[-1] != self.channels[-1]
        if need_proj:
            shortcut = nn.Conv(
                self.channels[-1], (1, 1), strides=s, use_bias=False, name="proj_conv"
            )(pre)
        else:
            shortcut = x

        if len(self.channels) == 2:
            y = nn.Conv(
                self.channels[0], (3, 3), strides=s, padding=p, kernel_dilation=d,
                use_bias=False, name="conv1",
            )(pre)
            y = act(norm("bn2")(y))
            if self.dropout_rate and training:
                y = nn.Dropout(self.dropout_rate, deterministic=not training)(y)
            y = nn.Conv(
                self.channels[1], (3, 3), padding=p, kernel_dilation=d,
                use_bias=False, name="conv2",
            )(y)
        else:
            y = nn.Conv(self.channels[0], (1, 1), strides=s, use_bias=False, name="conv1")(pre)
            y = act(norm("bn2")(y))
            y = nn.Conv(
                self.channels[1], (3, 3), padding=p, kernel_dilation=d,
                use_bias=False, name="conv2",
            )(y)
            y = act(norm("bn3")(y))
            if self.dropout_rate and training:
                y = nn.Dropout(self.dropout_rate, deterministic=not training)(y)
            y = nn.Conv(self.channels[2], (1, 1), use_bias=False, name="conv3")(y)
        return y + shortcut


class WiderResNetEncoder(EncoderBase):
    structure: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    activation: str = ACT_RELU
    a2: bool = False
    dilation: bool = False  # a2 only: dilate modules 5-7, output stride 8
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (64, 128, 256, 512, 1024, 2048, 4096)
        if self.a2 and self.dilation:
            strides = (1, 2, 4, 8, 8, 8, 8)
        else:
            strides = (1, 2, 4, 8, 16, 32, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, name="mod1_conv1")(x)
        outputs.append(x)

        for mod_id, (num_blocks, channels) in enumerate(zip(self.structure, _MODULE_CHANNELS)):
            pool_before = mod_id < 2 if self.a2 else mod_id < 5
            if pool_before:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            for block_id in range(num_blocks):
                stride, dil, drop = 1, 1, 0.0
                if self.a2:
                    if self.dilation:
                        dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
                        stride = 2 if block_id == 0 and mod_id == 2 else 1
                    else:
                        stride = 2 if block_id == 0 and 2 <= mod_id <= 4 else 1
                    drop = 0.3 if mod_id == 4 else (0.5 if mod_id == 5 else 0.0)
                x = IdentityResidualBlock(
                    channels, stride=stride, dilation=dil, dropout_rate=drop,
                    activation=self.activation, name=f"mod{mod_id + 2}_block{block_id + 1}",
                )(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def WiderResNetA2Encoder(**kwargs) -> WiderResNetEncoder:
    """A2-flavor factory (strided-conv downsampling in modules 4-6; see
    module docstring)."""
    return WiderResNetEncoder(a2=True, **kwargs)


def wider_resnet16_encoder(**kwargs):
    return WiderResNetEncoder(structure=(1, 1, 1, 1, 1, 1), **kwargs)


def wider_resnet20_encoder(**kwargs):
    return WiderResNetEncoder(structure=(1, 1, 1, 3, 1, 1), **kwargs)


def wider_resnet38_encoder(**kwargs):
    return WiderResNetEncoder(structure=(3, 3, 6, 3, 1, 1), **kwargs)


def wider_resnet16_a2_encoder(**kwargs):
    return WiderResNetEncoder(structure=(1, 1, 1, 1, 1, 1), a2=True, **kwargs)


def wider_resnet20_a2_encoder(**kwargs):
    return WiderResNetEncoder(structure=(1, 1, 1, 3, 1, 1), a2=True, **kwargs)


def wider_resnet38_a2_encoder(**kwargs):
    return WiderResNetEncoder(structure=(3, 3, 6, 3, 1, 1), a2=True, **kwargs)
