"""BiFPN decoder (arXiv:1911.09070; parity target:
modules/decoders/bifpn.py:48-193)."""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.dsconv import DepthwiseSeparableConv2d
from ...nn.functional import resize_nearest
from ...nn.normalization import NORM_BATCH, Normalization

__all__ = ["BiFPNDecoder", "BiFPNBlock", "BiFPNConvBlock"]


class BiFPNConvBlock(nn.Module):
    """conv-norm-act."""

    out_channels: int
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    separable: bool = False

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.separable:
            x = DepthwiseSeparableConv2d(self.out_channels, kernel_size=3, bias=False)(x)
        else:
            x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = Normalization(self.normalization)(x, training=training)
        return instantiate_activation_block(self.activation)(x)


class BiFPNBlock(nn.Module):
    """One BiFPN layer: top-down pathway then bottom-up pathway with learned
    softmax-normalized fusion weights (w1 [2, k], w2 [3, k])."""

    feature_size: int
    num_feature_maps: int
    epsilon: float = 1e-4
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    separable: bool = False

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        num_blocks = self.num_feature_maps - 1
        w1 = self.param("w1", nn.initializers.ones, (2, num_blocks))
        w2 = self.param("w2", nn.initializers.ones, (3, num_blocks))
        w1 = jax.nn.relu(w1)
        w1 = w1 / (jnp.sum(w1, axis=0) + self.epsilon)
        w2 = jax.nn.relu(w2)
        w2 = w2 / (jnp.sum(w2, axis=0) + self.epsilon)

        def block(x):
            return BiFPNConvBlock(
                self.feature_size, self.activation, self.normalization, self.separable
            )

        # top-down: coarse -> fine
        features = [inputs[-1]]
        inputs_reversed = inputs[:-1][::-1]
        for i, x in enumerate(inputs_reversed):
            up = resize_nearest(features[-1], x.shape[1:3])
            y = block(x)(w1[0, i] * x + w1[1, i] * up, training=training)
            features.append(y)

        # bottom-up: fine -> coarse; outputs come out fine->coarse
        outputs = [features[-1]]
        transition_reversed = features[:-1][::-1]
        for i in range(num_blocks):
            x = inputs[i + 1]
            td = transition_reversed[i]
            down = resize_nearest(outputs[-1], x.shape[1:3])
            y = block(x)(x * w2[0, i] + td * w2[1, i] + down * w2[2, i], training=training)
            outputs.append(y)
        return outputs


class BiFPNDecoder(nn.Module):
    """Input 1x1 projections + stacked BiFPN blocks. Does not synthesize
    extra p6/p7 levels — supports any number of input maps."""

    input_spec: FeatureMapsSpec
    out_channels: int = 128
    num_layers: int = 2
    activation: str = ACT_RELU
    normalization: str = NORM_BATCH
    separable: bool = False

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(
            channels=(self.out_channels,) * len(self.input_spec), strides=self.input_spec.strides
        )

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        features = [nn.Conv(self.out_channels, (1, 1))(fm) for fm in feature_maps]
        for _ in range(self.num_layers):
            features = BiFPNBlock(
                self.out_channels,
                num_feature_maps=len(self.input_spec),
                activation=self.activation,
                normalization=self.normalization,
                separable=self.separable,
            )(features, training=training)
        return features
