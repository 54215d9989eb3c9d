"""WiderResNet encoders (Mapillary inplace-ABN family; capability target:
modules/encoders/wide_resnet.py:19-165 + modules/backbone/wider_resnet.py).

Pre-activation identity-residual blocks; channels per module
(64, 128, 256, 512, 1024, 2048, 4096) at strides (1, 2, 4, 8, 16, 32, 32).

Two downsampling policies, selected by ``a2``:

* base: max-pool before each of modules 2..6 (reference WiderResNet).
* a2:   max-pool before modules 2-3, average-pool entering modules 4-6
        (the smooth-downsampling flavor of the reference's WiderResNetA2;
        the original's dilated final modules are not reproduced — strides
        match the reference encoder's advertised (…, 32, 32)).
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
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = instantiate_activation_block(self.activation)
        norm = lambda: nn.BatchNorm(use_running_average=not training)

        pre = act(norm()(x))
        need_proj = x.shape[-1] != self.channels[-1]
        shortcut = nn.Conv(self.channels[-1], (1, 1), use_bias=False)(pre) if need_proj else x

        if len(self.channels) == 2:
            y = nn.Conv(self.channels[0], (3, 3), padding="SAME", use_bias=False)(pre)
            y = act(norm()(y))
            y = nn.Conv(self.channels[1], (3, 3), padding="SAME", use_bias=False)(y)
        else:
            y = nn.Conv(self.channels[0], (1, 1), use_bias=False)(pre)
            y = act(norm()(y))
            y = nn.Conv(self.channels[1], (3, 3), padding="SAME", use_bias=False)(y)
            y = act(norm()(y))
            y = nn.Conv(self.channels[2], (1, 1), use_bias=False)(y)
        return y + shortcut


class WiderResNetEncoder(EncoderBase):
    structure: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    activation: str = ACT_RELU
    a2: bool = False
    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (64, 128, 256, 512, 1024, 2048, 4096)
        strides = (1, 2, 4, 8, 16, 32, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False)(x)
        outputs.append(x)

        for module_index, (num_blocks, channels) in enumerate(zip(self.structure, _MODULE_CHANNELS)):
            # 5 downsamples total (final stride 32); the a2 flavor smooths
            # modules 4-6 with average pooling instead of max pooling
            if module_index < 5:
                if self.a2 and module_index >= 2:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            for _ in range(num_blocks):
                x = IdentityResidualBlock(channels, activation=self.activation)(x, training=training)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def WiderResNetA2Encoder(**kwargs) -> WiderResNetEncoder:
    """A2-flavor factory (see module docstring)."""
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
