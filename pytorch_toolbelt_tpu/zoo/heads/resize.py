"""Resize head (reference: modules/heads/resize.py:11-82)."""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.functional import resize_2d

__all__ = ["ResizeHead"]


class ResizeHead(nn.Module):
    """Dropout + conv on the largest feature map, then resize to
    ``output_size``.  Returns {output_name: logits} if output_name is set."""

    input_spec: FeatureMapsSpec
    num_classes: int
    output_name: Optional[str] = None
    kernel_size: int = 3
    dropout_rate: float = 0.0
    interpolation_mode: str = "bilinear"
    interpolation_align_corners: bool = False

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.num_classes,), strides=(1,))

    @nn.compact
    def __call__(
        self,
        feature_maps: List[jnp.ndarray],
        output_size: Tuple[int, int],
        training: bool = False,
    ):
        x = feature_maps[self.input_spec.get_index_of_largest_feature_map()]
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = nn.Conv(
            self.num_classes,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=True,
        )(x)
        output = resize_2d(
            x, output_size, mode=self.interpolation_mode, align_corners=self.interpolation_align_corners
        )
        if self.output_name is not None:
            return {self.output_name: output}
        return output
