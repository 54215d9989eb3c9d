"""HRNet V2 encoders (arXiv:1904.04514; capability target:
modules/encoders/hrnet.py:21-434 — own flax implementation, NHWC).

Maintains parallel multi-resolution branches with repeated cross-resolution
fusion; returns the branch pyramid [w@4, 2w@8, 4w@16, 8w@32].
"""

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.interfaces import FeatureMapsSpec
from ...nn.functional import resize_nearest
from .common import EncoderBase
from .resnet import BasicBlock, Bottleneck

__all__ = [
    "HRNetEncoder",
    "hrnet18_encoder",
    "hrnet32_encoder",
    "hrnet34_encoder",
    "hrnet48_encoder",
    "hrnet_w18_small_v2_encoder",
]


class _FuseLayer(nn.Module):
    """Exchange information across resolutions: upsample coarser branches
    (1x1 conv + nearest resize), downsample finer ones (strided 3x3 convs)."""

    out_channels_per_branch: Tuple[int, ...]

    @nn.compact
    def __call__(self, branches: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        norm = lambda: nn.BatchNorm(use_running_average=not training)
        num = len(branches)
        outputs = []
        for i in range(num):
            acc = None
            for j in range(num):
                y = branches[j]
                if j > i:  # coarser -> upsample
                    y = nn.Conv(self.out_channels_per_branch[i], (1, 1), use_bias=False)(y)
                    y = norm()(y)
                    y = resize_nearest(y, branches[i].shape[1:3])
                elif j < i:  # finer -> strided downsample chain
                    for step in range(i - j):
                        last = step == i - j - 1
                        ch = self.out_channels_per_branch[i] if last else y.shape[-1]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(y)
                        y = norm()(y)
                        if not last:
                            y = jax.nn.relu(y)
                acc = y if acc is None else acc + y
            outputs.append(jax.nn.relu(acc))
        return outputs


class _HRModule(nn.Module):
    """num_branches x [4 BasicBlocks] followed by a fuse layer."""

    branch_channels: Tuple[int, ...]
    num_blocks: int = 4

    @nn.compact
    def __call__(self, branches: List[jnp.ndarray], training: bool = False) -> List[jnp.ndarray]:
        processed = []
        for x, ch in zip(branches, self.branch_channels):
            for _ in range(self.num_blocks):
                x = BasicBlock(out_channels=ch)(x, training=training)
            processed.append(x)
        return _FuseLayer(self.branch_channels)(processed, training=training)


class HRNetEncoder(EncoderBase):
    width: int = 18
    stage_modules: Tuple[int, ...] = (1, 4, 3)  # modules in stages 2, 3, 4
    blocks_per_module: int = 4  # BasicBlocks per branch per module (2 in "small" variants)
    stage1_blocks: int = 4  # Bottlenecks in stage 1 (2 in "small" variants)
    layers: Optional[Tuple[int, ...]] = None

    def _branch_channels(self, num_branches: int) -> Tuple[int, ...]:
        return tuple(self.width * (2**i) for i in range(num_branches))

    def get_output_spec(self) -> FeatureMapsSpec:
        channels = self._branch_channels(4)
        strides = (4, 8, 16, 32)
        if self.layers is not None:
            channels = tuple(channels[i] for i in self.layers)
            strides = tuple(strides[i] for i in self.layers)
        return FeatureMapsSpec(channels, strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> List[jnp.ndarray]:
        norm = lambda: nn.BatchNorm(use_running_average=not training)

        # stem: two stride-2 convs -> stride 4
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = norm()(x)
        x = jax.nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = norm()(x)
        x = jax.nn.relu(x)

        # stage 1: bottleneck blocks at 256 channels
        for _ in range(self.stage1_blocks):
            x = Bottleneck(out_channels=256)(x, training=training)

        # transitions + multi-resolution stages
        branches = [x]
        for stage_index, num_modules in enumerate(self.stage_modules):
            num_branches = stage_index + 2
            channels = self._branch_channels(num_branches)
            new_branches = []
            for i, ch in enumerate(channels):
                if i < len(branches):
                    src = branches[i]
                    if src.shape[-1] != ch:
                        src = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False)(src)
                        src = norm()(src)
                        src = jax.nn.relu(src)
                    new_branches.append(src)
                else:
                    src = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(branches[-1])
                    src = norm()(src)
                    new_branches.append(jax.nn.relu(src))
            branches = new_branches
            for _ in range(num_modules):
                branches = _HRModule(channels, num_blocks=self.blocks_per_module)(
                    branches, training=training
                )

        if self.layers is not None:
            branches = [branches[i] for i in self.layers]
        return branches


def hrnet18_encoder(**kwargs):
    return HRNetEncoder(width=18, **kwargs)


def hrnet34_encoder(**kwargs):
    return HRNetEncoder(width=34, **kwargs)


def hrnet32_encoder(**kwargs):
    """HRNet-W32 (capability target: encoders/timm/hrnet.py:44-57 — timm
    hrnet_w32: standard stage config at branch width 32)."""
    return HRNetEncoder(width=32, **kwargs)


def hrnet48_encoder(**kwargs):
    return HRNetEncoder(width=48, **kwargs)


def hrnet_w18_small_v2_encoder(**kwargs):
    """HRNet-W18 small v2 (capability target: encoders/timm/hrnet.py:44-52):
    2 stage-1 bottlenecks, (1, 3, 2) stage modules, 2 blocks per branch."""
    return HRNetEncoder(
        width=18, stage_modules=(1, 3, 2), blocks_per_module=2, stage1_blocks=2, **kwargs
    )
