"""Global pooling zoo (reference: modules/pooling.py:26-219).

All modules take NHWC and return [B, 1, 1, C] (or [B, C] with flatten=True),
mirroring the reference's NCHW -> [B, C, 1, 1] convention.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "GWAP",
    "GlobalAvgPool2d",
    "GlobalKMaxPool2d",
    "GlobalMaxPool2d",
    "GlobalRankPooling",
    "GeneralizedMeanPooling2d",
    "GlobalWeightedAvgPool2d",
    "MILCustomPoolingModule",
    "RMSPool",
    "GlobalMaxAvgPooling2d",
]


def _maybe_flatten(x, flatten):
    return x[:, 0, 0, :] if flatten else x


class GlobalAvgPool2d(nn.Module):
    flatten: bool = False

    def __call__(self, x):
        return _maybe_flatten(jnp.mean(x, axis=(1, 2), keepdims=True), self.flatten)


class GlobalMaxPool2d(nn.Module):
    flatten: bool = False

    def __call__(self, x):
        return _maybe_flatten(jnp.max(x, axis=(1, 2), keepdims=True), self.flatten)


class GlobalKMaxPool2d(nn.Module):
    """Mean of weighted top-k activations per channel (arXiv:1911.07344)."""

    k: int = 4
    trainable: bool = True
    flatten: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c).transpose(0, 2, 1)  # [B, C, HW]
        kmax = jax.lax.top_k(flat, self.k)[0]  # [B, C, k]
        if self.trainable:
            weights = self.param("weights", nn.initializers.ones, (1, 1, self.k))
        else:
            weights = jnp.ones((1, 1, self.k), x.dtype)
        kmax = (kmax * weights).mean(axis=2)  # [B, C]
        return kmax if self.flatten else kmax[:, None, None, :]


class GlobalWeightedAvgPool2d(nn.Module):
    """GWAP: conv-predicted fscore map, normalized, as spatial weights
    (reference pooling.py:86-114)."""

    flatten: bool = False

    @nn.compact
    def __call__(self, x):
        m = nn.Conv(1, (1, 1), use_bias=True)(x)
        m = jnp.exp(jax.nn.sigmoid(m))
        m = m / jnp.sum(m, axis=(1, 2), keepdims=True)
        out = jnp.sum(x * m, axis=(1, 2), keepdims=True)
        return _maybe_flatten(out, self.flatten)


GWAP = GlobalWeightedAvgPool2d


class RMSPool(nn.Module):
    """Root-mean-square (std) pooling (reference pooling.py:117-129)."""

    def __call__(self, x):
        x_mean = jnp.mean(x, axis=(1, 2))
        var = jnp.mean(jnp.square(x - x_mean[:, None, None, :]), axis=(1, 2), keepdims=True)
        return jnp.sqrt(var)


class MILCustomPoolingModule(nn.Module):
    """Multiple-instance-learning pooling: sigmoid weight branch gating a
    classifier branch (reference pooling.py:132-148)."""

    out_channels: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        in_channels = x.shape[-1]
        w = nn.BatchNorm(use_running_average=not training)(x)
        w = nn.Conv(in_channels // self.reduction, (1, 1))(w)
        w = jax.nn.relu(w)
        w = nn.Conv(self.out_channels, (1, 1))(w)
        w = jax.nn.sigmoid(w)
        logits = nn.Conv(self.out_channels, (1, 1))(x)
        return jnp.sum(w * logits, axis=(1, 2)) / (jnp.sum(w, axis=(1, 2)) + 1e-6)


class GlobalRankPooling(nn.Module):
    """Learnable weighting over rank-sorted activations (arXiv:1704.02112;
    reference pooling.py:151-174)."""

    spatial_size: int
    flatten: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        assert h * w == self.spatial_size, f"Expected spatial size {self.spatial_size}, got {h}x{w}"
        flat = x.reshape(b, h * w, c).transpose(0, 2, 1)  # [B, C, HW]
        x_sorted = jax.lax.top_k(flat, self.spatial_size)[0]  # descending
        weights = self.param("weights", nn.initializers.lecun_normal(), (c, self.spatial_size))
        out = jnp.sum(x_sorted * weights[None], axis=-1)  # [B, C]
        return out if self.flatten else out[:, None, None, :]


class GeneralizedMeanPooling2d(nn.Module):
    """GeM pooling with softplus-parameterized exponent
    (arXiv:1902.05509; reference pooling.py:177-203)."""

    p: float = 3.0
    eps: float = 1e-6
    flatten: bool = False
    l2_normalize: bool = False

    @nn.compact
    def __call__(self, x):
        p0 = self.p
        p_param = self.param("p", lambda key: jnp.ones((1,)) * p0)
        p = jax.nn.softplus(p_param) + 1.0
        out = jnp.power(
            jnp.mean(jnp.power(jnp.maximum(x, self.eps), p), axis=(1, 2), keepdims=True), 1.0 / p
        )
        if self.l2_normalize:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return _maybe_flatten(out, self.flatten)


class GlobalMaxAvgPooling2d(nn.Module):
    """Concat of global max and global average pooling -> [B, 2C]
    (reference pooling.py:206-219)."""

    flatten: bool = True

    def __call__(self, x):
        x_max = jnp.max(x, axis=(1, 2))
        x_avg = jnp.mean(x, axis=(1, 2))
        return jnp.concatenate([x_max, x_avg], axis=-1)
