"""Classification heads (parity target:
modules/heads/classification_heads.py:20-206)."""

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.activations import ACT_RELU, instantiate_activation_block
from ...nn.pooling import GeneralizedMeanPooling2d

__all__ = [
    "GlobalAveragePoolingClassificationHead",
    "GlobalMaxPoolingClassificationHead",
    "GenericPoolingClassificationHead",
    "FullyConnectedClassificationHead",
    "GlobalMaxAvgPoolingClassificationHead",
    "GlobalMaxAvgSumPoolingClassificationHead",
    "GeneralizedMeanPoolingClassificationHead",
]


class _ClassificationHeadBase(nn.Module):
    input_spec: FeatureMapsSpec
    num_classes: int
    dropout_rate: float = 0.0
    feature_map_index: int = -1

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.num_classes,), strides=(-1,))


class GenericPoolingClassificationHead(_ClassificationHeadBase):
    """pool(feature_map) -> dropout -> linear. ``pool_fn`` maps NHWC -> [B, F]."""

    pool_fn: callable = None

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        x = feature_maps[self.feature_map_index]
        x = self.pool_fn(x) if self.pool_fn is not None else jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class GlobalAveragePoolingClassificationHead(_ClassificationHeadBase):
    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        x = jnp.mean(feature_maps[self.feature_map_index], axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class GlobalMaxPoolingClassificationHead(_ClassificationHeadBase):
    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        x = jnp.max(feature_maps[self.feature_map_index], axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class GeneralizedMeanPoolingClassificationHead(_ClassificationHeadBase):
    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        x = GeneralizedMeanPooling2d(l2_normalize=True, flatten=True)(
            feature_maps[self.feature_map_index]
        )
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class FullyConnectedClassificationHead(_ClassificationHeadBase):
    """Flatten everything -> dropout -> linear (LazyLinear analogue: flax
    infers input features)."""

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        x = feature_maps[self.feature_map_index]
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class GlobalMaxAvgPoolingClassificationHead(_ClassificationHeadBase):
    """Concat max+avg pooling -> BN-linear-act-dropout bottleneck MLP ->
    classifier (classification_heads.py:88-126)."""

    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        act = instantiate_activation_block(self.activation)
        fm = feature_maps[self.feature_map_index]
        num_channels = fm.shape[-1]
        x = jnp.concatenate([jnp.max(fm, axis=(1, 2)), jnp.mean(fm, axis=(1, 2))], axis=-1)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = nn.Dense(num_channels)(x)
        x = act(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = nn.Dense(num_channels)(x)
        x = act(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)


class GlobalMaxAvgSumPoolingClassificationHead(_ClassificationHeadBase):
    """Sum of max and avg pooling -> dropout -> classifier
    (classification_heads.py:179-206)."""

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        fm = feature_maps[self.feature_map_index]
        x = jnp.max(fm, axis=(1, 2)) + jnp.mean(fm, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return nn.Dense(self.num_classes)(x)
