"""MaxViT encoders (arXiv:2204.01697; capability target:
modules/encoders/timm/maxvit.py:4 — timm-backed in the reference; own flax
implementation, NHWC).

Each stage block = MBConv (local conv mixing) + block attention (within
PxP windows) + grid attention (across a PxP dilated grid). Both attention
forms are plain batched matmuls after einops reshapes — MXU-shaped.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase
from .efficientnet import MBConv

__all__ = [
    "MaxViTEncoder",
    "maxvit_tiny_encoder",
    "maxvit_small_encoder",
    "maxvit_base_encoder",
    "maxvit_large_encoder",
    "maxvit_xlarge_encoder",
]


class _Attention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x):  # [B', N, C]
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c)(x).reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        return nn.Dense(c)(out)


class _TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):  # [B', N, C]
        c = x.shape[-1]
        x = x + _Attention(self.num_heads)(nn.LayerNorm()(x))
        y = nn.LayerNorm()(x)
        y = nn.Dense(c * self.mlp_ratio)(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(c)(y)
        return x + y


class MaxViTBlock(nn.Module):
    out_channels: int
    num_heads: int
    stride: int = 1
    partition: int = 8

    @nn.compact
    def __call__(self, x, training: bool = False):
        p = self.partition

        # MBConv with a paper-faithful downsampled shortcut on stride-2
        # (EfficientNet's MBConv drops the skip when stride != 1)
        y = MBConv(self.out_channels, stride=self.stride, expand_ratio=4, kernel_size=3)(
            x, training=training
        )
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            shortcut = x
            if self.stride != 1:
                shortcut = nn.avg_pool(shortcut, (self.stride,) * 2, strides=(self.stride,) * 2)
            shortcut = nn.Conv(self.out_channels, (1, 1))(shortcut)
            x = y + shortcut
        else:
            x = y

        b, h, w, c = x.shape
        # pad spatial dims to partition multiples (crop back after attention)
        pad_h = (-h) % p
        pad_w = (-w) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        # block attention: PxP windows as batch
        windows = rearrange(x, "b (nh p1) (nw p2) c -> (b nh nw) (p1 p2) c", p1=p, p2=p)
        windows = _TransformerBlock(self.num_heads)(windows)
        x = rearrange(windows, "(b nh nw) (p1 p2) c -> b (nh p1) (nw p2) c",
                      nh=hp // p, nw=wp // p, p1=p, p2=p)

        # grid attention: dilated PxP grid as batch (tokens stride h/p apart)
        grid = rearrange(x, "b (p1 nh) (p2 nw) c -> (b nh nw) (p1 p2) c", p1=p, p2=p)
        grid = _TransformerBlock(self.num_heads)(grid)
        x = rearrange(grid, "(b nh nw) (p1 p2) c -> b (p1 nh) (p2 nw) c",
                      nh=hp // p, nw=wp // p, p1=p, p2=p)

        if pad_h or pad_w:
            x = x[:, :h, :w]
        return x


class MaxViTEncoder(EncoderBase):
    stem_channels: int = 64
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 5, 2)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    partition: int = 8
    layers: Optional[Tuple[int, ...]] = None
    # per-block rematerialization (reference Swin's use_checkpoint analogue)
    use_remat: bool = False

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (self.stem_channels,) + self.stage_channels
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.stem_channels, (3, 3), padding="SAME")(x)
        outputs.append(x)

        block_cls = nn.remat(MaxViTBlock, static_argnums=(2,)) if self.use_remat else MaxViTBlock
        block_index = 0
        for stage, (channels, blocks, heads) in enumerate(
            zip(self.stage_channels, self.stage_blocks, self.num_heads)
        ):
            for i in range(blocks):
                x = block_cls(
                    channels,
                    num_heads=heads,
                    stride=(2 if i == 0 else 1),
                    partition=self.partition,
                    # explicit name keeps the param tree remat-invariant
                    name=f"MaxViTBlock_{block_index}",
                )(x, training)
                block_index += 1
            outputs.append(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def maxvit_tiny_encoder(**kwargs):
    return MaxViTEncoder(**{**dict(stage_channels=(64, 128, 256, 512), stage_blocks=(2, 2, 5, 2)), **kwargs})


def maxvit_small_encoder(**kwargs):
    return MaxViTEncoder(**{**dict(stage_channels=(96, 192, 384, 768), stage_blocks=(2, 2, 5, 2)), **kwargs})


def maxvit_base_encoder(**kwargs):
    """MaxViT-B (arXiv:2204.01697 table 1; capability target timm/maxvit.py:4)."""
    return MaxViTEncoder(**{**dict(
        stem_channels=64, stage_channels=(96, 192, 384, 768), stage_blocks=(2, 6, 14, 2),
        num_heads=(3, 6, 12, 24)
    ), **kwargs})


def maxvit_large_encoder(**kwargs):
    return MaxViTEncoder(**{**dict(
        stem_channels=128, stage_channels=(128, 256, 512, 1024), stage_blocks=(2, 6, 14, 2),
        num_heads=(4, 8, 16, 32)
    ), **kwargs})


def maxvit_xlarge_encoder(**kwargs):
    return MaxViTEncoder(**{**dict(
        stem_channels=192, stage_channels=(192, 384, 768, 1536), stage_blocks=(2, 6, 14, 2),
        num_heads=(6, 12, 24, 48)
    ), **kwargs})
