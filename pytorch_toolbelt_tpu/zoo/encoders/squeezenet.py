"""SqueezeNet 1.1 encoder (capability target: modules/encoders/squeezenet.py:11-63)."""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = ["SqueezeNetEncoder", "squeezenet_encoder"]


class Fire(nn.Module):
    squeeze: int
    expand1x1: int
    expand3x3: int

    @nn.compact
    def __call__(self, x):
        s = jax.nn.relu(nn.Conv(self.squeeze, (1, 1))(x))
        e1 = jax.nn.relu(nn.Conv(self.expand1x1, (1, 1))(s))
        e3 = jax.nn.relu(nn.Conv(self.expand3x3, (3, 3), padding="SAME")(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetEncoder(EncoderBase):
    """SqueezeNet 1.1 feature extractor: [64@2, 128@4, 256@8, 512@16]."""

    layers: Optional[Tuple[int, ...]] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (64, 128, 256, 512)
        strides = (2, 4, 8, 16)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        x = jax.nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME")(x))
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Fire(16, 64, 64)(x)
        x = Fire(16, 64, 64)(x)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Fire(32, 128, 128)(x)
        x = Fire(32, 128, 128)(x)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Fire(48, 192, 192)(x)
        x = Fire(48, 192, 192)(x)
        x = Fire(64, 256, 256)(x)
        x = Fire(64, 256, 256)(x)
        outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def squeezenet_encoder(**kwargs) -> SqueezeNetEncoder:
    return SqueezeNetEncoder(**kwargs)
