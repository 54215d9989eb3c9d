"""MixVisionTransformer (SegFormer MiT-B0..B5) encoders (arXiv:2105.15203;
capability target: modules/encoders/mix_transformer.py:51-606 — NVlabs port
in the reference; own flax implementation, NHWC).

TPU notes: attention runs as batched [B, N, C] matmuls; the spatial-reduction
(sr_ratio) shrinks K/V token counts via a strided conv, bounding attention
cost — the reference's answer to long spatial sequences (SURVEY.md §5).
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.drop_path import DropPath
from .common import EncoderBase

__all__ = [
    "MixVisionTransformerEncoder",
    "mit_b0_encoder",
    "mit_b1_encoder",
    "mit_b2_encoder",
    "mit_b3_encoder",
    "mit_b4_encoder",
    "mit_b5_encoder",
]


class OverlapPatchEmbed(nn.Module):
    """Strided conv patch embedding with overlap."""

    embed_dim: int
    patch_size: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding="SAME",
        )(x)
        b, h, w, c = x.shape
        x = nn.LayerNorm()(x)
        return x  # keep NHWC; blocks reshape internally


class EfficientSelfAttention(nn.Module):
    """Multi-head attention with spatial-reduction of keys/values."""

    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        head_dim = c // self.num_heads

        q = nn.Dense(c)(x).reshape(b, h * w, self.num_heads, head_dim)

        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio), strides=(self.sr_ratio, self.sr_ratio))(x)
            kv_in = nn.LayerNorm()(kv_in)
        else:
            kv_in = x
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        k = nn.Dense(c)(kv_in).reshape(b, n_kv, self.num_heads, head_dim)
        v = nn.Dense(c)(kv_in).reshape(b, n_kv, self.num_heads, head_dim)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        return nn.Dense(c)(out)


class MixFFN(nn.Module):
    """MLP with a 3x3 depthwise conv between the two projections."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Dense(self.hidden_dim)(x)
        y = nn.Conv(
            self.hidden_dim, (3, 3), padding="SAME", feature_group_count=self.hidden_dim
        )(y)
        y = jax.nn.gelu(y)
        return nn.Dense(c)(y)


class MiTBlock(nn.Module):
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        dp = DropPath(self.drop_path_rate)
        y = EfficientSelfAttention(self.num_heads, self.sr_ratio)(nn.LayerNorm()(x))
        x = x + dp(y, training=training)
        y = MixFFN(x.shape[-1] * self.mlp_ratio)(nn.LayerNorm()(x))
        x = x + dp(y, training=training)
        return x


class MixVisionTransformerEncoder(EncoderBase):
    embed_dims: Tuple[int, ...] = (32, 64, 160, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    drop_path_rate: float = 0.0
    layers: Optional[Tuple[int, ...]] = None
    # per-block rematerialization (reference Swin's use_checkpoint analogue)
    use_remat: bool = False

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = self.embed_dims
        strides = (4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        total_blocks = sum(self.depths)
        block_index = 0
        block_cls = nn.remat(MiTBlock, static_argnums=(2,)) if self.use_remat else MiTBlock
        for stage in range(4):
            patch, stride = (7, 4) if stage == 0 else (3, 2)
            x = OverlapPatchEmbed(self.embed_dims[stage], patch, stride)(x)
            for _ in range(self.depths[stage]):
                dpr = self.drop_path_rate * block_index / max(1, total_blocks - 1)
                x = block_cls(
                    self.num_heads[stage],
                    self.sr_ratios[stage],
                    self.mlp_ratios[stage],
                    drop_path_rate=dpr,
                    # explicit name keeps the param tree remat-invariant
                    name=f"MiTBlock_{block_index}",
                )(x, training)
                block_index += 1
            x = nn.LayerNorm()(x)
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def mit_b0_encoder(**kwargs):
    return MixVisionTransformerEncoder(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2), **kwargs)


def mit_b1_encoder(**kwargs):
    return MixVisionTransformerEncoder(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2), **kwargs)


def mit_b2_encoder(**kwargs):
    return MixVisionTransformerEncoder(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3), **kwargs)


def mit_b3_encoder(**kwargs):
    return MixVisionTransformerEncoder(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3), **kwargs)


def mit_b4_encoder(**kwargs):
    return MixVisionTransformerEncoder(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3), **kwargs)


def mit_b5_encoder(**kwargs):
    return MixVisionTransformerEncoder(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3), **kwargs)
