"""OCNet object-context self-attention blocks (reference: modules/ocnet.py:11-368).

TPU-native restatement: attention runs as batched [B, HW, C] matmuls
(MXU-shaped) instead of permute-heavy NCHW views.  The reference shares the
key and query transforms (ocnet.py f_query = f_key) — preserved here.
The pyramid variant partitions the map into scale x scale tiles via reshape,
which requires spatial dims divisible by the scale (static shapes under jit).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from .activations import ACT_RELU, ABN
from .functional import resize_bilinear

__all__ = ["ObjectContextBlock", "ASPObjectContextBlock", "PyramidObjectContextBlock"]


def _attend(query, key, value, key_channels):
    """softmax(QK^T / sqrt(d)) V over flattened spatial tokens."""
    sim = jnp.einsum("bqc,bkc->bqk", query, key, preferred_element_type=jnp.float32)
    sim = sim * (key_channels**-0.5)
    sim = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", sim, value, preferred_element_type=jnp.float32).astype(value.dtype)


class SelfAttentionBlock2D(nn.Module):
    """Non-local block with optional spatial down-scaling (ocnet.py:11-76)."""

    key_channels: int
    value_channels: int
    out_channels: Optional[int] = None
    scale: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        out_channels = self.out_channels or c
        if self.scale > 1:
            x_small = nn.max_pool(x, (self.scale, self.scale), strides=(self.scale, self.scale))
        else:
            x_small = x

        # shared key/query transform (reference ocnet.py: f_query = f_key)
        kq = nn.Conv(self.key_channels, (1, 1))(x_small)
        kq = ABN()(kq, training=training)
        value = nn.Conv(self.value_channels, (1, 1))(x_small)

        hs, ws = x_small.shape[1:3]
        kq_flat = kq.reshape(b, hs * ws, self.key_channels)
        v_flat = value.reshape(b, hs * ws, self.value_channels)

        context = _attend(kq_flat, kq_flat, v_flat, self.key_channels)
        context = context.reshape(b, hs, ws, self.value_channels)
        context = nn.Conv(out_channels, (1, 1))(context)
        if self.scale > 1:
            context = resize_bilinear(context, (h, w), align_corners=False)
        return context


class ObjectContextBlock(nn.Module):
    """Sum of self-attention stages + 1x1 conv-ABN (ocnet.py:117-148)."""

    out_channels: int
    key_channels: int
    value_channels: int
    dropout: float = 0.05
    sizes: Tuple[int, ...] = (1,)

    @nn.compact
    def __call__(self, x, training: bool = False):
        context = None
        for size in self.sizes:
            prior = SelfAttentionBlock2D(
                self.key_channels, self.value_channels, self.out_channels, scale=size
            )(x, training=training)
            context = prior if context is None else context + prior
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False)(context)
        return ABN()(out, training=training)


class ASPObjectContextBlock(nn.Module):
    """ASP-OC: object context branch + dilated conv branches, fused
    (ocnet.py:151-221)."""

    out_features: int = 256
    dilations: Tuple[int, int, int] = (12, 24, 36)
    dropout: float = 0.1
    activation: str = ACT_RELU

    @nn.compact
    def __call__(self, x, training: bool = False):
        def conv_abn(y, k, dilation):
            y = nn.Conv(
                self.out_features,
                (k, k),
                kernel_dilation=(dilation, dilation),
                padding="SAME",
                use_bias=False,
            )(y)
            return ABN(activation=self.activation)(y, training=training)

        feat1 = conv_abn(x, 3, 1)
        feat1 = ObjectContextBlock(
            out_channels=self.out_features,
            key_channels=self.out_features // 2,
            value_channels=self.out_features,
            dropout=self.dropout,
            sizes=(2,),
        )(feat1, training=training)
        feat2 = conv_abn(x, 1, 1)
        feat3 = conv_abn(x, 3, self.dilations[0])
        feat4 = conv_abn(x, 3, self.dilations[1])
        feat5 = conv_abn(x, 3, self.dilations[2])

        out = jnp.concatenate([feat1, feat2, feat3, feat4, feat5], axis=-1)
        out = nn.Conv(self.out_features * 2, (1, 1), use_bias=False)(out)
        out = ABN(activation=self.activation)(out, training=training)
        return nn.Dropout(self.dropout, deterministic=not training)(out)


class PyramidSelfAttentionBlock2D(nn.Module):
    """Block-local attention over a scale x scale partition (ocnet.py:221-324).
    Spatial dims must be divisible by ``scale``."""

    key_channels: int
    value_channels: int
    out_channels: Optional[int] = None
    scale: int = 1

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        out_channels = self.out_channels or c
        s = self.scale
        if h % s or w % s:
            raise ValueError(f"Spatial dims ({h}x{w}) must be divisible by pyramid scale {s}")

        kq = nn.Conv(self.key_channels, (1, 1), use_bias=False)(x)
        kq = ABN()(kq, training=training)
        value = nn.Conv(self.value_channels, (1, 1))(x)

        # partition into s*s local blocks -> batched local attention
        kq_loc = rearrange(kq, "b (sh hh) (sw ww) c -> (b sh sw) (hh ww) c", sh=s, sw=s)
        v_loc = rearrange(value, "b (sh hh) (sw ww) c -> (b sh sw) (hh ww) c", sh=s, sw=s)
        context = _attend(kq_loc, kq_loc, v_loc, self.key_channels)
        context = rearrange(
            context,
            "(b sh sw) (hh ww) c -> b (sh hh) (sw ww) c",
            sh=s, sw=s, hh=h // s, ww=w // s,
        )
        return nn.Conv(out_channels, (1, 1))(context)


class PyramidObjectContextBlock(nn.Module):
    """Pyramid OC: local attention at multiple partition scales + upscaled
    input features, fused (ocnet.py:331-368)."""

    out_channels: int
    dropout: float = 0.05
    sizes: Tuple[int, ...] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_channels = x.shape[-1]
        group = len(self.sizes)
        up_dr = nn.Conv(in_channels * group, (1, 1), use_bias=False)(x)
        up_dr = ABN()(up_dr, training=training)
        context = [up_dr]
        for size in self.sizes:
            context.append(
                PyramidSelfAttentionBlock2D(
                    key_channels=in_channels // 2,
                    value_channels=in_channels,
                    out_channels=in_channels,
                    scale=size,
                )(x, training=training)
            )
        out = jnp.concatenate(context, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False)(out)
        out = ABN()(out, training=training)
        return nn.Dropout(self.dropout, deterministic=not training)(out)
