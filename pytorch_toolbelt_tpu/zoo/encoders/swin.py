"""Swin Transformer encoders (arXiv:2103.14030; capability target:
modules/encoders/swin.py:76-852 — MSRA port in the reference; own flax
implementation, NHWC).

TPU notes: windows become the batch dimension of plain batched attention
(MXU-shaped matmuls); the shifted-window attention mask is a static
per-shape constant computed with numpy at trace time (SURVEY.md hard
part (f)).  Spatial dims are padded to window multiples inside each block.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ...core.interfaces import FeatureMapsSpec
from ...nn.drop_path import DropPath
from .common import EncoderBase

__all__ = [
    "SwinTransformerEncoder",
    "swin_tiny_encoder",
    "swin_small_encoder",
    "swin_base_encoder",
    "swin_large_encoder",
]


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # [2, ws, ws]
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]  # [2, N, N]
    relative = relative.transpose(1, 2, 0)
    relative[:, :, 0] += ws - 1
    relative[:, :, 1] += ws - 1
    relative[:, :, 0] *= 2 * ws - 1
    return relative.sum(-1)  # [N, N]


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """[num_windows, N, N] additive mask for shifted-window attention."""
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for h_slice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w_slice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h_slice, w_slice] = cnt
            cnt += 1
    windows = img_mask.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):  # x: [B*nw, N, C]
        bnw, n, c = x.shape
        head_dim = c // self.num_heads
        ws = self.window_size

        qkv = nn.Dense(c * 3, use_bias=True)(x).reshape(bnw, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim**-0.5)

        bias_table = self.param(
            "relative_position_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        rel_index = jnp.asarray(_relative_position_index(ws))
        bias = bias_table[rel_index.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c)(out)


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        ws = self.window_size
        shift = ws // 2 if (self.shift and min(h, w) > ws) else 0

        shortcut = x
        y = nn.LayerNorm()(x)

        pad_h = (-h) % ws
        pad_w = (-w) % ws
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None

        windows = rearrange(y, "b (nh ws1) (nw ws2) c -> (b nh nw) (ws1 ws2) c", ws1=ws, ws2=ws)
        windows = WindowAttention(self.num_heads, ws)(windows, mask=mask)
        y = rearrange(
            windows, "(b nh nw) (ws1 ws2) c -> b (nh ws1) (nw ws2) c",
            nh=hp // ws, nw=wp // ws, ws1=ws, ws2=ws,
        )

        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]

        dp = DropPath(self.drop_path_rate)
        x = shortcut + dp(y, training=training)

        y = nn.LayerNorm()(x)
        y = nn.Dense(int(c * self.mlp_ratio))(y)
        y = jax.nn.gelu(y)
        y = nn.Dense(c)(y)
        return x + dp(y, training=training)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat -> LayerNorm -> linear halving (dim doubles)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = rearrange(x, "b (h p1) (w p2) c -> b h w (p1 p2 c)", p1=2, p2=2)
        x = nn.LayerNorm()(x)
        return nn.Dense(2 * c, use_bias=False)(x)


class SwinTransformerEncoder(EncoderBase):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    layers: Optional[Tuple[int, ...]] = None
    # Rematerialize each block on the backward pass (the reference Swin's
    # use_checkpoint, swin.py:324-438): activation memory drops from
    # O(depth) to O(1) blocks per stage at the cost of one extra forward.
    use_remat: bool = False

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = tuple(self.embed_dim * (2**i) for i in range(len(self.depths)))
        strides = tuple(4 * (2**i) for i in range(len(self.depths)))
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        # patch embed: 4x4 non-overlapping conv + LN
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4))(x)
        x = nn.LayerNorm()(x)

        total_blocks = sum(self.depths)
        block_index = 0
        outputs = []
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if self.use_remat else SwinBlock
        for stage, depth in enumerate(self.depths):
            for i in range(depth):
                dpr = self.drop_path_rate * block_index / max(1, total_blocks - 1)
                x = block_cls(
                    num_heads=self.num_heads[stage],
                    window_size=self.window_size,
                    shift=(i % 2 == 1),
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=dpr,
                    # explicit name: keeps the param tree identical whether or
                    # not the block is remat-wrapped (flax would otherwise
                    # auto-name it CheckpointSwinBlock_i)
                    name=f"SwinBlock_{block_index}",
                )(x, training)
                block_index += 1
            outputs.append(nn.LayerNorm()(x))
            if stage != len(self.depths) - 1:
                x = PatchMerging()(x)

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def swin_tiny_encoder(**kwargs):
    return SwinTransformerEncoder(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24), **kwargs)


def swin_small_encoder(**kwargs):
    return SwinTransformerEncoder(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24), **kwargs)


def swin_base_encoder(**kwargs):
    return SwinTransformerEncoder(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), **kwargs)


def swin_large_encoder(**kwargs):
    return SwinTransformerEncoder(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48), **kwargs)
