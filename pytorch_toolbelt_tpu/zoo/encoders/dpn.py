"""Dual Path Network encoders (arXiv:1707.01629; capability target:
modules/encoders/timm/dpn.py:14-125 — timm-backed in the reference;
own flax implementation, NHWC).

Each block carries a residual path (summed) and a dense path (concatenated),
combining ResNet feature re-use with DenseNet feature exploration.
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from .common import EncoderBase

__all__ = [
    "DPNEncoder",
    "dpn68_encoder",
    "dpn68b_encoder",
    "dpn92_encoder",
    "dpn107_encoder",
    "dpn131_encoder",
]


class DualPathBlock(nn.Module):
    num_1x1_a: int
    num_3x3_b: int
    num_1x1_c: int  # residual-path width
    inc: int        # dense-path increment
    groups: int = 32
    stride: int = 1
    is_first: bool = False
    b_style: bool = False  # DPN-B: separate res/dense output projections

    @nn.compact
    def __call__(self, x, training: bool = False):
        """x = (res, dense) tuple or a single tensor for the first block."""
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        if isinstance(x, tuple):
            inp = jnp.concatenate(x, axis=-1)
        else:
            inp = x

        y = jax.nn.relu(norm()(inp))
        y = nn.Conv(self.num_1x1_a, (1, 1), use_bias=False)(y)
        y = jax.nn.relu(norm()(y))
        y = nn.Conv(
            self.num_3x3_b, (3, 3), strides=(self.stride,) * 2, padding="SAME",
            feature_group_count=self.groups, use_bias=False,
        )(y)
        y = jax.nn.relu(norm()(y))
        if self.b_style:
            # DPN-B (dpn68b/107/131 flavor): independent 1x1 projections for
            # the residual and dense paths instead of slicing one conv
            out_res = nn.Conv(self.num_1x1_c, (1, 1), use_bias=False)(y)
            out_dense = nn.Conv(self.inc, (1, 1), use_bias=False)(y)
        else:
            out = nn.Conv(self.num_1x1_c + self.inc, (1, 1), use_bias=False)(y)
            out_res = out[..., : self.num_1x1_c]
            out_dense = out[..., self.num_1x1_c :]

        if self.is_first or self.stride > 1 or (
            isinstance(x, tuple) and x[0].shape[-1] != self.num_1x1_c
        ) or not isinstance(x, tuple):
            proj = jax.nn.relu(norm()(inp))
            proj = nn.Conv(
                self.num_1x1_c + 2 * self.inc, (1, 1), strides=(self.stride,) * 2, use_bias=False
            )(proj)
            res_in = proj[..., : self.num_1x1_c]
            dense_in = proj[..., self.num_1x1_c :]
        else:
            res_in, dense_in = x

        res = res_in + out_res
        dense = jnp.concatenate([dense_in, out_dense], axis=-1)
        return res, dense


class DPNEncoder(EncoderBase):
    stage_blocks: Tuple[int, ...] = (3, 4, 12, 3)
    base_width: Tuple[int, ...] = (96, 192, 384, 768)
    res_width: Tuple[int, ...] = (256, 512, 1024, 2048)
    inc: Tuple[int, ...] = (16, 32, 24, 128)
    groups: int = 32
    stem_channels: int = 64
    small_stem: bool = False  # dpn68-style 3x3 stem instead of 7x7
    b_style: bool = False
    layers: Optional[Tuple[int, ...]] = None

    def _stage_channels(self) -> Tuple[int, ...]:
        out = []
        for blocks, rw, inc in zip(self.stage_blocks, self.res_width, self.inc):
            out.append(rw + (blocks + 2) * inc)
        return tuple(out)

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = (self.stem_channels,) + self._stage_channels()
        strides = (2, 4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        outputs = []
        if self.small_stem:
            x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        else:
            x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training)(x)
        x = jax.nn.relu(x)
        outputs.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        state = x
        for stage, (blocks, bw, rw, inc) in enumerate(
            zip(self.stage_blocks, self.base_width, self.res_width, self.inc)
        ):
            for i in range(blocks):
                state = DualPathBlock(
                    num_1x1_a=bw,
                    num_3x3_b=bw,
                    num_1x1_c=rw,
                    inc=inc,
                    groups=self.groups,
                    stride=(2 if stage > 0 and i == 0 else 1),
                    is_first=(i == 0),
                    b_style=self.b_style,
                )(state, training=training)
            outputs.append(jnp.concatenate(state, axis=-1))

        if self.layers is not None:
            outputs = [outputs[i] for i in self.layers]
        return outputs


def dpn68_encoder(**kwargs):
    return DPNEncoder(**{**dict(
        stage_blocks=(3, 4, 12, 3),
        base_width=(64, 128, 256, 512),
        res_width=(64, 128, 256, 512),
        inc=(16, 32, 32, 64),
        groups=32,
        stem_channels=10,
        small_stem=True,
    ), **kwargs})


def dpn68b_encoder(**kwargs):
    """dpn68 with B-style blocks (capability target: timm/dpn.py:37-59)."""
    return dpn68_encoder(**{**dict(b_style=True), **kwargs})


def dpn92_encoder(**kwargs):
    return DPNEncoder(**{**dict(
        stage_blocks=(3, 4, 20, 3),
        base_width=(96, 192, 384, 768),
        res_width=(256, 512, 1024, 2048),
        inc=(16, 32, 24, 128),
        groups=32,
        stem_channels=64,
    ), **kwargs})


def dpn107_encoder(**kwargs):
    """Capability target: timm/dpn.py:83-105."""
    return DPNEncoder(**{**dict(
        stage_blocks=(4, 8, 20, 3),
        base_width=(200, 400, 800, 1600),
        res_width=(256, 512, 1024, 2048),
        inc=(20, 64, 64, 128),
        groups=50,
        stem_channels=128,
        b_style=True,
    ), **kwargs})


def dpn131_encoder(**kwargs):
    """Capability target: timm/dpn.py:106-125."""
    return DPNEncoder(**{**dict(
        stage_blocks=(4, 8, 28, 3),
        base_width=(160, 320, 640, 1280),
        res_width=(256, 512, 1024, 2048),
        inc=(16, 32, 32, 128),
        groups=40,
        stem_channels=128,
    ), **kwargs})
