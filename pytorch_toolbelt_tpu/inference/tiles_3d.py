"""Tiled inference for 3D volumes (parity target:
pytorch_toolbelt/inference/tiles_3d.py:10-211).

NOTE: the reference's ``VolumeSlicer.merge`` is dead 2D leftover code
(tiles_3d.py:130-155 references nonexistent attributes); here merge is
implemented properly, and the device-side ``VolumeMerger`` mirrors
TileMerger with DHWC volumes.
"""

import math
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from functools import partial

__all__ = ["VolumeSlicer", "VolumeMerger", "compute_pyramid_patch_weight_loss_3d", "tiled_apply_3d"]


def compute_pyramid_patch_weight_loss_3d(depth: int, height: int, width: int) -> np.ndarray:
    """3D center-weighted window: separable product of per-axis pyramid
    profiles (the 3D analogue of tiles.py:16-50)."""

    def axis_profile(n):
        c = n * 0.5
        dc = np.abs(np.arange(n) + 0.5 - c)
        de = np.minimum(np.arange(n) + 0.5, n - np.arange(n) - 0.5)
        return de / np.maximum(dc + de, 1e-6)

    w = (
        axis_profile(depth)[:, None, None]
        * axis_profile(height)[None, :, None]
        * axis_profile(width)[None, None, :]
    )
    alpha = (depth * height * width) / np.sum(w)
    return (alpha * w).astype(np.float32)


class VolumeSlicer:
    """Slice a DHW(C) volume into overlapping 3D tiles."""

    def __init__(self, volume_shape, voxel_size, voxel_step=0, weight="mean"):
        self.volume_depth = int(volume_shape[0])
        self.volume_height = int(volume_shape[1])
        self.volume_width = int(volume_shape[2])

        def _triple(v):
            if isinstance(v, (np.ndarray, tuple, list)):
                if len(v) != 3:
                    raise ValueError(f"Size must have exactly 3 elements. Got: {v}")
                return int(v[0]), int(v[1]), int(v[2])
            return int(v), int(v), int(v)

        self.voxel_size = _triple(voxel_size)
        self.voxel_step = _triple(voxel_step)

        weights = {"mean": self._mean, "pyramid": self._pyramid}
        self.weight = weight if isinstance(weight, np.ndarray) else weights[weight](self.voxel_size)

        for step, size in zip(self.voxel_step, self.voxel_size):
            if step < 1 or step > size:
                raise ValueError()

        overlap = tuple(size - step for size, step in zip(self.voxel_size, self.voxel_step))
        shape = (self.volume_depth, self.volume_height, self.volume_width)

        margins = []
        for dim, ov, step in zip(shape, overlap, self.voxel_step):
            n = max(1, math.ceil((dim - ov) / step))
            extra = step * n - (dim - ov)
            before = extra // 2
            margins.append((before, extra - before))
        (self.margin_front, self.margin_back), (self.margin_top, self.margin_bottom), (
            self.margin_left,
            self.margin_right,
        ) = margins

        crops = []
        tgt = self.target_shape
        for z in range(0, tgt[0] - self.voxel_size[0] + 1, self.voxel_step[0]):
            for y in range(0, tgt[1] - self.voxel_size[1] + 1, self.voxel_step[1]):
                for x in range(0, tgt[2] - self.voxel_size[2] + 1, self.voxel_step[2]):
                    crops.append((z, y, x) + self.voxel_size)
        self.crops = np.array(crops)

    @property
    def target_shape(self) -> Tuple[int, int, int]:
        return (
            self.volume_depth + self.margin_front + self.margin_back,
            self.volume_height + self.margin_top + self.margin_bottom,
            self.volume_width + self.margin_left + self.margin_right,
        )

    def _pad_volume(self, volume: np.ndarray, value=0) -> np.ndarray:
        pad = [
            (self.margin_front, self.margin_back),
            (self.margin_top, self.margin_bottom),
            (self.margin_left, self.margin_right),
        ]
        if volume.ndim == 4:
            pad.append((0, 0))
        return np.pad(volume, pad, mode="constant", constant_values=value)

    def split(self, volume: np.ndarray, value=0) -> List[np.ndarray]:
        assert volume.shape[:3] == (self.volume_depth, self.volume_height, self.volume_width)
        orig_ndim = volume.ndim
        volume = self._pad_volume(volume, value)
        if volume.ndim != orig_ndim:
            volume = np.expand_dims(volume, axis=-1)
        tiles = []
        for z, y, x, d, h, w in self.crops:
            tiles.append(volume[z : z + d, y : y + h, x : x + w])
        return tiles

    def iter_split(self, volume: np.ndarray, value=0):
        for tile, crop in zip(self.split(volume, value), self.crops):
            yield tile, crop

    def merge(self, tiles: List[np.ndarray], dtype=np.float32) -> np.ndarray:
        """Host-side weighted overlap-add (the reference's is broken;
        this is the working equivalent)."""
        if len(tiles) != len(self.crops):
            raise ValueError
        channels = 1 if tiles[0].ndim == 3 else tiles[0].shape[3]
        target_shape = self.target_shape + (channels,)
        volume = np.zeros(target_shape, dtype=np.float64)
        norm = np.zeros(target_shape, dtype=np.float64)
        w = np.repeat(self.weight[..., None], channels, axis=-1)
        for tile, (z, y, x, d, h, wd) in zip(tiles, self.crops):
            tile = tile if tile.ndim == 4 else tile[..., None]
            volume[z : z + d, y : y + h, x : x + wd] += tile * w
            norm[z : z + d, y : y + h, x : x + wd] += w
        norm = np.clip(norm, np.finfo(norm.dtype).eps, None)
        return self.crop_to_original_size((volume / norm).astype(dtype))

    def crop_to_original_size(self, volume: np.ndarray) -> np.ndarray:
        return volume[
            self.margin_front : self.margin_front + self.volume_depth,
            self.margin_top : self.margin_top + self.volume_height,
            self.margin_left : self.margin_left + self.volume_width,
        ]

    def _mean(self, voxel_size) -> np.ndarray:
        return np.ones(voxel_size, dtype=np.float32)

    def _pyramid(self, voxel_size) -> np.ndarray:
        return compute_pyramid_patch_weight_loss_3d(*voxel_size)


@partial(jax.jit, donate_argnums=(0, 1))
def _accumulate_scan_3d(volume, norm_mask, tiles, coords_zyx, weight):
    td, th, tw = tiles.shape[1:4]
    c = volume.shape[-1]

    def body(carry, inp):
        volume, norm_mask = carry
        tile, zyx = inp
        z, y, x = zyx[0], zyx[1], zyx[2]
        region = lax.dynamic_slice(volume, (z, y, x, 0), (td, th, tw, c))
        volume = lax.dynamic_update_slice(volume, region + tile * weight, (z, y, x, 0))
        nregion = lax.dynamic_slice(norm_mask, (z, y, x, 0), (td, th, tw, 1))
        norm_mask = lax.dynamic_update_slice(norm_mask, nregion + weight, (z, y, x, 0))
        return (volume, norm_mask), None

    (volume, norm_mask), _ = lax.scan(body, (volume, norm_mask), (tiles, coords_zyx))
    return volume, norm_mask


class VolumeMerger:
    """Device-resident 3D accumulator (reference tiles_3d.py:168-211).
    Volumes are DHWC."""

    def __init__(self, volume_shape, channels: int, weight: np.ndarray, dtype=jnp.float32):
        self.shape = tuple(int(s) for s in volume_shape)
        self.channels = int(channels)
        self.weight = jnp.asarray(weight, dtype=dtype)[..., None]
        self.volume = jnp.zeros(self.shape + (channels,), dtype=dtype)
        self.norm_mask = jnp.zeros(self.shape + (1,), dtype=dtype)

    def accumulate_single(self, tile: jnp.ndarray, coords) -> None:
        self.integrate_batch(tile[None], np.asarray(coords)[None])

    def integrate_batch(self, batch: jnp.ndarray, crop_coords) -> None:
        if len(batch) != len(crop_coords):
            raise ValueError("Number of tiles in batch does not correspond to number of coordinates")
        batch = jnp.asarray(batch, dtype=self.volume.dtype)
        coords = np.asarray(crop_coords)
        coords_zyx = jnp.asarray(coords[:, :3], dtype=jnp.int32)
        self.volume, self.norm_mask = _accumulate_scan_3d(
            self.volume, self.norm_mask, batch, coords_zyx, self.weight
        )

    def merge(self) -> jnp.ndarray:
        return self.volume / self.norm_mask

    def merge_(self) -> jnp.ndarray:
        self.volume = self.volume / self.norm_mask
        return self.volume


def tiled_apply_3d(
    model_fn,
    volume: jnp.ndarray,
    voxel_size,
    voxel_step,
    weight: str = "pyramid",
    batch_size: int = 2,
    accumulator_dtype=jnp.float32,
) -> jnp.ndarray:
    """3D analogue of inference.tiles.tiled_apply: run ``model_fn`` over
    overlapping DHWC sub-volumes entirely on device and return the merged
    full-resolution prediction.

    Args:
        model_fn: [B, d, h, w, C] -> [B, d, h, w, K], shape-preserving.
        volume: [D, H, W, C] array.

    Returns:
        [D, H, W, K] merged prediction.
    """
    d, h, w = (int(s) for s in volume.shape[:3])
    slicer = VolumeSlicer((d, h, w), voxel_size, voxel_step, weight=weight)
    td, th, tw = slicer.voxel_size
    coords = slicer.crops
    n_tiles = len(coords)

    n_pad = (-n_tiles) % batch_size
    coords_zyx = np.zeros((n_tiles + n_pad, 3), dtype=np.int32)
    coords_zyx[:n_tiles] = coords[:, :3]
    valid = np.zeros((n_tiles + n_pad,), dtype=np.float32)
    valid[:n_tiles] = 1.0
    num_batches = (n_tiles + n_pad) // batch_size

    weight_np = slicer.weight.astype(np.float32)
    norm = np.zeros(slicer.target_shape, dtype=np.float64)
    for z, y, x, _, _, _ in coords:
        norm[z : z + td, y : y + th, x : x + tw] += weight_np
    norm = np.clip(norm, np.finfo(np.float64).eps, None).astype(np.float32)

    probe = jax.eval_shape(
        model_fn, jax.ShapeDtypeStruct((batch_size, td, th, tw, volume.shape[-1]), volume.dtype)
    )
    out_channels = probe.shape[-1]

    coords_dev = jnp.asarray(coords_zyx.reshape(num_batches, batch_size, 3))
    valid_dev = jnp.asarray(valid.reshape(num_batches, batch_size))
    weight_dev = jnp.asarray(weight_np)[..., None]
    inv_norm = jnp.asarray(1.0 / norm)[..., None]

    pad_spec = [
        (slicer.margin_front, slicer.margin_back),
        (slicer.margin_top, slicer.margin_bottom),
        (slicer.margin_left, slicer.margin_right),
        (0, 0),
    ]
    tgt = slicer.target_shape

    @jax.jit
    def run(volume, coords_dev, valid_dev, weight_dev, inv_norm):
        padded = jnp.pad(volume, pad_spec)
        canvas = jnp.zeros(tgt + (out_channels,), dtype=accumulator_dtype)

        def step(canvas, inp):
            batch_coords, batch_valid = inp
            tiles = jax.vmap(
                lambda zyx: lax.dynamic_slice(
                    padded, (zyx[0], zyx[1], zyx[2], 0), (td, th, tw, padded.shape[-1])
                )
            )(batch_coords)
            preds = model_fn(tiles).astype(accumulator_dtype)

            def inner(i, canvas):
                z, y, x = batch_coords[i, 0], batch_coords[i, 1], batch_coords[i, 2]
                region = lax.dynamic_slice(canvas, (z, y, x, 0), (td, th, tw, out_channels))
                update = region + preds[i] * weight_dev * batch_valid[i]
                return lax.dynamic_update_slice(canvas, update, (z, y, x, 0))

            return lax.fori_loop(0, batch_size, inner, canvas), None

        canvas, _ = lax.scan(step, canvas, (coords_dev, valid_dev))
        return canvas * inv_norm

    merged = run(jnp.asarray(volume), coords_dev, valid_dev, weight_dev, inv_norm)
    return merged[
        slicer.margin_front : slicer.margin_front + d,
        slicer.margin_top : slicer.margin_top + h,
        slicer.margin_left : slicer.margin_left + w,
    ]
