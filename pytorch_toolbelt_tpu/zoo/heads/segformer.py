"""SegFormer MLP head (arXiv:2105.15203; parity target:
modules/heads/segformer_head.py:14-123)."""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...datasets.common import name_for_stride
from ...nn.activations import ACT_GELU, instantiate_activation_block
from ...nn.functional import resize_bilinear

__all__ = ["SegFormerHead"]


class SegFormerHead(nn.Module):
    """Per-level linear projection -> resize to finest -> fuse conv ->
    final; optional per-stride supervision outputs."""

    input_spec: FeatureMapsSpec
    num_classes: int
    embedding_dim: int = 256
    with_supervision: bool = False
    output_name: Optional[str] = None
    dropout_rate: float = 0.0
    activation: str = ACT_GELU

    def get_output_spec(self) -> FeatureMapsSpec:
        return FeatureMapsSpec(channels=(self.num_classes,), strides=(1,))

    @nn.compact
    def __call__(self, feature_maps: List[jnp.ndarray], output_size: Tuple[int, int], training: bool = False):
        if len(feature_maps) != 4:
            raise ValueError("SegFormerHead expects exactly 4 feature maps")
        c1, c2, c3, c4 = feature_maps

        c1 = nn.Conv(self.embedding_dim, (1, 1))(c1)
        c2 = nn.Conv(self.embedding_dim, (1, 1))(c2)
        c3 = nn.Conv(self.embedding_dim, (1, 1))(c3)
        c4 = nn.Conv(self.embedding_dim, (1, 1))(c4)

        target = c1.shape[1:3]
        fused = jnp.concatenate(
            [
                resize_bilinear(c4, target, align_corners=False),
                resize_bilinear(c3, target, align_corners=False),
                resize_bilinear(c2, target, align_corners=False),
                c1,
            ],
            axis=-1,
        )
        fused = nn.Conv(self.embedding_dim, (1, 1), use_bias=False)(fused)
        fused = nn.BatchNorm(use_running_average=not training)(fused)
        fused = instantiate_activation_block(self.activation)(fused)

        x = nn.Dropout(self.dropout_rate, deterministic=not training)(fused)
        x = nn.Conv(self.num_classes, (1, 1))(x)
        x = resize_bilinear(x, output_size, align_corners=False)

        outputs = {self.output_name: x} if self.output_name is not None else x

        if self.with_supervision:
            sup = [nn.Conv(self.num_classes, (1, 1))(c) for c in (c1, c2, c3, c4)]
            strides = (4, 8, 16, 32)
            if self.output_name is not None:
                for s, out in zip(strides, sup):
                    outputs[name_for_stride(self.output_name, s)] = out
            else:
                outputs = (outputs,) + tuple(sup)
        return outputs
