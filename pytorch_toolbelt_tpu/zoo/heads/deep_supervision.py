"""Deep supervision head (parity target: modules/heads/deep_supervision.py:14-66)."""

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...datasets.common import name_for_stride

__all__ = ["DeepSupervisionHead"]


class DeepSupervisionHead(nn.Module):
    """1x1 conv per level; dict keys via name_for_stride when
    output_name_prefix is set, otherwise a list."""

    input_spec: FeatureMapsSpec
    num_classes: int
    output_name_prefix: Optional[str] = None

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(
            channels=(self.num_classes,) * len(self.input_spec), strides=self.input_spec.strides
        )

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size=None, training: bool = False):
        outputs = [
            nn.Conv(self.num_classes, (1, 1))(fm) for fm in feature_maps
        ]
        if self.output_name_prefix is None:
            return outputs
        return {
            name_for_stride(self.output_name_prefix, stride): out
            for out, stride in zip(outputs, self.input_spec.strides)
        }
