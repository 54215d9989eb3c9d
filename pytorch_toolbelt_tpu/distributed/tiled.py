"""Mesh-sharded tiled inference — the flagship huge-image pipeline
(BASELINE.json config 5: 10000x10000 orthophoto, tiles sharded across a
v5e-4 mesh, per-tile TTA, all-reduce weighted merge).

Design (SURVEY.md §5 "long-context" restatement): the tile grid is the
parallel axis.  Each device slices ITS tiles from the (replicated) padded
image, runs the model, and overlap-adds into a LOCAL canvas; one psum over
the 'data' axis merges the partial canvases across ICI; the static 1/norm
constant finishes the blend.  Implemented with shard_map so the per-device
program is the single-chip tiled_apply loop.
"""

from functools import partial
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # canonical location since jax 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..inference.tiles import ImageSlicer

__all__ = ["tiled_apply_sharded"]


def tiled_apply_sharded(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    mesh: Mesh,
    tile_size: Union[int, Tuple[int, int]],
    tile_step: Union[int, Tuple[int, int]],
    weight: str = "pyramid",
    batch_size: int = 4,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Distribute tiles of a huge image over the mesh's ``axis_name`` axis.

    Args:
        model_fn: [B, th, tw, C] -> [B, th, tw, K], shape-preserving spatially.
        image: [H, W, C] (host or device); broadcast to every device.
        mesh: jax.sharding.Mesh whose ``axis_name`` axis carries the tiles.

    Returns:
        [H, W, K] merged prediction (replicated).
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    num_devices = int(mesh.shape[axis_name])

    slicer = ImageSlicer((h, w), tile_size, tile_step, weight=weight)
    th, tw = slicer.tile_size
    coords = slicer.crops
    n_tiles = len(coords)

    # pad tile count to devices * batch multiple; padding tiles get weight 0
    per_device = -(-n_tiles // num_devices)
    per_device = -(-per_device // batch_size) * batch_size
    total = per_device * num_devices

    coords_yx = np.zeros((total, 2), dtype=np.int32)
    coords_yx[:n_tiles, 0] = coords[:, 1]
    coords_yx[:n_tiles, 1] = coords[:, 0]
    valid = np.zeros((total,), dtype=np.float32)
    valid[:n_tiles] = 1.0

    # round-robin over devices so every device touches a similar canvas area
    order = np.arange(total).reshape(-1, num_devices).T.reshape(-1)
    coords_yx = coords_yx[order]
    valid = valid[order]

    num_batches = per_device // batch_size
    coords_dev = coords_yx.reshape(num_devices, num_batches, batch_size, 2)
    valid_dev = valid.reshape(num_devices, num_batches, batch_size)

    weight_np = slicer.weight.astype(np.float32)
    norm = np.zeros(slicer.target_shape, dtype=np.float64)
    for x, y, _, _ in coords:
        norm[y : y + th, x : x + tw] += weight_np
    norm = np.clip(norm, np.finfo(np.float64).eps, None).astype(np.float32)

    tgt_h, tgt_w = slicer.target_shape
    pad_spec = [
        (slicer.margin_top, slicer.margin_bottom),
        (slicer.margin_left, slicer.margin_right),
        (0, 0),
    ]

    probe = jax.eval_shape(
        model_fn, jax.ShapeDtypeStruct((batch_size, th, tw, image.shape[-1]), jnp.float32)
    )
    out_channels = probe.shape[-1]

    weight_const = jnp.asarray(weight_np)[..., None]
    inv_norm_const = jnp.asarray(1.0 / norm)[..., None]

    def per_device_fn(padded, my_coords, my_valid):
        # shard_map gives the per-device shard with a leading axis of size 1
        my_coords = my_coords[0]
        my_valid = my_valid[0]
        canvas = jnp.zeros((tgt_h, tgt_w, out_channels), jnp.float32)
        # the canvas accumulates device-varying updates; mark it varying over
        # the tile axis so the scan carry types agree
        if hasattr(lax, "pcast"):  # canonical spelling since jax 0.8
            canvas = lax.pcast(canvas, (axis_name,), to="varying")
        else:  # pragma: no cover
            canvas = lax.pvary(canvas, (axis_name,))

        def step(canvas, inp):
            batch_coords, batch_valid = inp
            tiles = jax.vmap(
                lambda yx: lax.dynamic_slice(padded, (yx[0], yx[1], 0), (th, tw, padded.shape[-1]))
            )(batch_coords)
            preds = model_fn(tiles).astype(jnp.float32)

            def inner(i, canvas):
                y, x = batch_coords[i, 0], batch_coords[i, 1]
                region = lax.dynamic_slice(canvas, (y, x, 0), (th, tw, out_channels))
                update = region + preds[i] * weight_const * batch_valid[i]
                return lax.dynamic_update_slice(canvas, update, (y, x, 0))

            return lax.fori_loop(0, batch_size, inner, canvas), None

        canvas, _ = lax.scan(step, canvas, (my_coords, my_valid))
        # merge partial canvases across the tile axis (rides ICI)
        canvas = lax.psum(canvas, axis_name)
        return canvas * inv_norm_const

    sharded = shard_map(
        per_device_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
    )

    @jax.jit
    def run(image, coords, valid):
        padded = jnp.pad(image, pad_spec)
        return sharded(padded, coords, valid)

    with mesh:
        merged = run(
            jnp.asarray(image),
            jax.device_put(jnp.asarray(coords_dev), NamedSharding(mesh, P(axis_name))),
            jax.device_put(jnp.asarray(valid_dev), NamedSharding(mesh, P(axis_name))),
        )
    return merged[
        slicer.margin_top : slicer.margin_top + h,
        slicer.margin_left : slicer.margin_left + w,
    ]
