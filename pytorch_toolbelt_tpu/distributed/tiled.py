"""Mesh-sharded tiled inference — the flagship huge-image pipeline
(BASELINE.json config 5: 10000x10000 orthophoto, tiles sharded across a
v5e-4 mesh, per-tile TTA, weighted merge).

Design (SURVEY.md §5 "long-context" restatement): the tile grid is the
parallel axis, and since round 3 the OUTPUT CANVAS is the sharded object
(``canvas='strips'``, the default): the canvas rows are split into one
contiguous strip per device, each device runs exactly the tiles that
intersect its strip (tiles straddling a strip boundary are recomputed by
both owners — at production scale that is one tile-row in ~strip_h/step
rows of duplicated model work) and overlap-adds into a LOCAL strip canvas
with a tile-height halo.  The merge needs NO collective at all: per-device
accumulator memory is O(H*W*K / n_devices + halo) and the result comes
back row-sharded over the mesh.  The input image is likewise delivered as
per-device row strips (strip + halo), so nothing full-resolution is ever
replicated.

Since round 5 the per-device tile schedule uses the SAME balanced
exact-batch plan as the single-chip runner (``inference/tiles.py
_stack_batches``): per device and tile group, ``ceil(N_d / ceil(N_d/B))``
-sized main batches plus one exact remainder batch — **no zero-valid
padding slot ever executes the model on any device** (round 4 padded every
per-device group to ``ceil(max_tiles/B)*B`` and ran the model on the dead
slots, up to ~45% waste at the bench geometry).  Because per-device batch
shapes can differ (edge strips intersect fewer tile rows), each device
runs its own dispatch of a shared jitted runner instead of one shard_map
SPMD program: JAX's async dispatch runs the per-device programs
concurrently, the runner's jit cache shares traces across devices whose
batch plans coincide (interior strips all coincide), and the XLA
persistent compile cache dedupes the backend compile.  Per-device
dispatch requires all mesh devices to be addressable from this process
(true for a single-host v5e slice and the virtual CPU mesh; a multi-host
mesh would need one process per host, as all JAX programs here do).

``canvas='replicated'`` keeps the round-2 scheme — every device owns a
full-resolution accumulator, tiles are round-robined for load balance
(exact balanced batches per device, same plan as above), and one
full-canvas ``psum`` over ICI merges the partials.  It avoids the
boundary-tile recompute and is fine for small canvases, but its per-device
memory is O(H*W*K) (e.g. 7.6 GB for a 10000^2 19-class canvas) which does
not fit beside a real model on a 16 GB v5e chip — hence the strip default.

d4 test-time augmentation composes with both canvases via ``d4_tta``:

* ``d4_tta='full'`` — every tile runs all 8 d4 views (the reference's
  d4_image2mask-in-a-tile-loop, pytorch_toolbelt/inference/tta.py:385-467,
  distributed over the mesh).
* ``d4_tta='distributed'`` — the round-3 parity-class algorithm
  (``inference/tiles.tiled_apply_d4_tta``) composed with the sharded
  canvas: the d4 view-pair assignment is a pure function of GLOBAL tile
  grid parity, so each device simply runs, for each of the 4 parity
  classes, the class's view pair on the tiles of that class intersecting
  its strip.  Every interior pixel still averages all 8 d4 views at 1/4
  the model compute; the per-device program accumulates tiles in the same
  group order and per-group coordinate order as the single-chip grouped
  runner, so the output bit-matches the single-chip
  ``mode='distributed'`` result (tests/test_distributed.py).
"""

from functools import lru_cache
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

from ..inference.tiles import ImageSlicer, _stack_batches

__all__ = ["tiled_apply_sharded", "clear_sharded_cache", "read_sharded_window"]


def read_sharded_window(array, row0: int, row1: int, col0: int, col1: int):
    """Read a host-side window of a row-sharded array WITHOUT a global
    slice.  ``array[r0:r1, c0:c1]`` on a sharded array makes GSPMD gather
    the FULL array onto every device (measured +29-33 GB on the 10k
    config-5 canvas); this helper instead slices each addressable shard
    locally and concatenates on the host — the distributed-native way to
    inspect windows of a huge sharded canvas.

    Returns a numpy array of shape [row1-row0, col1-col0, ...]."""
    import numpy as _np

    pieces = []
    seen_ranges = set()  # replicated-axis meshes expose each row block once per replica
    shards = sorted(array.addressable_shards, key=lambda s: s.index[0].start or 0)
    for s in shards:
        rs = s.index[0]
        lo = rs.start or 0
        hi = rs.stop if rs.stop is not None else array.shape[0]
        if (lo, hi) in seen_ranges:
            continue
        seen_ranges.add((lo, hi))
        a, b = max(row0, lo), min(row1, hi)
        if a < b:
            pieces.append(_np.asarray(s.data[a - lo : b - lo, col0:col1]))
    if not pieces:
        raise ValueError(f"rows [{row0}, {row1}) not addressable from this host")
    out = _np.concatenate(pieces, axis=0)
    if out.shape[0] != row1 - row0:
        raise ValueError(
            f"window rows [{row0}, {row1}) only partially addressable from this "
            f"host (got {out.shape[0]} rows)"
        )
    return out


def _resolve_d4(model_fn, d4_tta, tile_size, tile_step):
    """Map the ``d4_tta`` option to (model_fns tuple, partition name).

    The callables come from the same lru-cached factories the single-chip
    path uses, so the compiled runners are shared across repeated calls.
    """
    if d4_tta is None:
        return (model_fn,), "none"
    from ..inference.tiles import _full_d4_fn, _sparse_d4_fns

    if d4_tta == "full":
        return (_full_d4_fn(model_fn),), "none"
    if d4_tta != "distributed":
        raise ValueError(f"Unknown d4_tta mode {d4_tta!r}; use None, 'full' or 'distributed'")
    ts = (tile_size, tile_size) if isinstance(tile_size, int) else tuple(tile_size)
    st = (tile_step, tile_step) if isinstance(tile_step, int) else tuple(tile_step)
    if ts[0] != 2 * st[0] or ts[1] != 2 * st[1]:
        raise ValueError(
            "d4_tta='distributed' needs tile_step == tile_size/2 (4-fold overlap) "
            f"so the parity classes tile the d4 group; got size={ts} step={st}"
        )
    return _sparse_d4_fns(model_fn), "parity2x2"


def _group_masks(coords_yx: np.ndarray, tile_step, partition: str):
    """Boolean membership masks, one per tile group, from GLOBAL tile coords.

    'parity2x2' keys on ((row // step_h) % 2, (col // step_w) % 2) — the
    same assignment as the single-chip ``_get_tiled_plan`` partition, so a
    tile runs the same d4 view pair no matter which device owns it.
    """
    if partition == "none":
        return [np.ones(len(coords_yx), dtype=bool)]
    step_h, step_w = tile_step
    parity = (coords_yx[:, 0] // step_h) % 2 * 2 + (coords_yx[:, 1] // step_w) % 2
    return [parity == g for g in range(4)]


def _axis_device_grid(mesh: Mesh, axis_name: str) -> np.ndarray:
    """Mesh devices as an [n, n_replicas] object array: row d holds every
    device whose coordinate along ``axis_name`` is d (column 0 computes the
    shard; the rest are replicas of any mesh axes not named in the
    PartitionSpec, which receive copies)."""
    k = tuple(mesh.axis_names).index(axis_name)
    return np.moveaxis(mesh.devices, k, 0).reshape(mesh.shape[axis_name], -1)


def tiled_apply_sharded(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,
    mesh: Mesh,
    tile_size: Union[int, Tuple[int, int]],
    tile_step: Union[int, Tuple[int, int]],
    weight: str = "pyramid",
    batch_size: int = 4,
    axis_name: str = "data",
    canvas: str = "strips",
    d4_tta: Optional[str] = None,
) -> jnp.ndarray:
    """Distribute tiles of a huge image over the mesh's ``axis_name`` axis.

    Args:
        model_fn: [B, th, tw, C] -> [B, th, tw, K], shape-preserving spatially.
            Must be a STABLE callable (the compiled per-device program is
            cached on its identity, like jax.jit).
        image: [H, W, C] (host or device).
        mesh: jax.sharding.Mesh whose ``axis_name`` axis carries the tiles.
        batch_size: tile batch-size CAP; each device runs balanced exact
            batches of ``ceil(N_d / ceil(N_d/batch_size))`` tiles plus one
            exact remainder (no padding slots — see module docstring).
        canvas: 'strips' (default) — canvas rows sharded over the mesh, no
            collectives, O(H*W*K/n) per-device memory; 'replicated' — every
            device accumulates a full canvas, merged with one psum.
        d4_tta: None (plain), 'full' (all 8 d4 views per tile), or
            'distributed' (parity-class view pairs — requires
            step == size/2; see module docstring).

    Returns:
        [H, W, K] merged prediction ('strips': row-sharded over the mesh;
        'replicated': replicated).
    """
    model_fns, partition = _resolve_d4(model_fn, d4_tta, tile_size, tile_step)
    if canvas == "replicated":
        return _tiled_apply_replicated(
            model_fns, partition, image, mesh, tile_size, tile_step, weight, batch_size, axis_name
        )
    if canvas != "strips":
        raise ValueError(f"Unknown canvas mode {canvas!r}; use 'strips' or 'replicated'")

    h, w = int(image.shape[0]), int(image.shape[1])
    c = int(image.shape[-1])
    ts = (tile_size, tile_size) if isinstance(tile_size, int) else tuple(tile_size)
    st = (tile_step, tile_step) if isinstance(tile_step, int) else tuple(tile_step)
    weight_key = weight if isinstance(weight, str) else None
    cache_key = (
        model_fns, mesh, axis_name, h, w, c, ts, st, weight_key, batch_size, partition
    )
    entry = _STRIPS_CACHE.get(cache_key) if weight_key is not None else None
    if entry is None:
        entry = _build_strips_program(
            model_fns, partition, mesh, axis_name, h, w, c, tile_size, tile_step,
            weight, batch_size,
        )
        if weight_key is not None:
            if len(_STRIPS_CACHE) >= 8:  # bound the pinned coords/inv-norm memory
                _STRIPS_CACHE.pop(next(iter(_STRIPS_CACHE)))
            _STRIPS_CACHE[cache_key] = entry
    slicer, strip_h, runner, per_dev_args, dev_grid, out_channels = entry
    th = slicer.tile_size[0]
    n = int(mesh.shape[axis_name])

    # input image as per-device row strips with a tile-height halo on both
    # sides, so nothing full-resolution is ever replicated.  Padded frame:
    # row p = target-frame row y + th; the bottom pad covers the last
    # device's halo past the target rows.
    extra_bottom = max(0, slicer.margin_top + n * strip_h - (slicer.target_shape[0] - th))
    padded_np = np.pad(
        np.asarray(image, dtype=np.float32),
        [
            (slicer.margin_top + th, slicer.margin_bottom + th + extra_bottom),
            (slicer.margin_left, slicer.margin_right),
            (0, 0),
        ],
    )
    # one async dispatch per strip owner; the jitted runner retraces only per
    # distinct batch-plan shape tuple, and devices with the same plan share
    # the trace (the backend executable is per-device, deduped by the XLA
    # persistent compile cache)
    outs = []
    for d in range(n):
        lo = slicer.margin_top + d * strip_h  # target-frame window start
        strip_np = padded_np[lo : lo + strip_h + 2 * th]
        strip = jax.device_put(strip_np, dev_grid[d, 0])
        mains, rems, weight_dev, inv_norm_crop = per_dev_args[d]
        outs.append(runner(strip, mains, rems, weight_dev, inv_norm_crop))
    arrays = []
    for d in range(n):
        arrays.append(outs[d])
        for replica in dev_grid[d, 1:]:
            arrays.append(jax.device_put(outs[d], replica))
    # shards are final-output windows of strip_h rows each: when n divides h
    # (every at-scale config) the assembly IS the result — no global slicing
    merged = jax.make_array_from_single_device_arrays(
        (n * strip_h, w, out_channels), NamedSharding(mesh, P(axis_name)), arrays
    )
    if n * strip_h == h:
        return merged
    # uneven tail only (small images): this global trim does reshard — at
    # scale keep h divisible by the mesh axis
    return merged[:h]


_STRIPS_CACHE = {}


def clear_sharded_cache() -> None:
    """Drop the cached strips programs (each pins per-device coords, the
    inverse-norm strips and compiled executables referencing the model
    closure's parameters) and the per-device runner/merge caches."""
    _STRIPS_CACHE.clear()
    _build_strip_runner.cache_clear()
    _build_canvas_runner.cache_clear()
    _psum_merge_program.cache_clear()


def _build_strips_program(
    model_fns, partition, mesh, axis_name, h, w, c, tile_size, tile_step, weight, batch_size
):
    """Build (slicer, strip_h, runners, per-device args, device grid, K) for
    a strips-canvas configuration.  Per-device constants (balanced batch
    coords, weight window, inverse-norm strip) are committed to their
    devices once and reused across calls.

    Round-5 geometry: strips are aligned to the FINAL output rows
    (``strip_h = ceil(h / n)``) and each per-device program crops its own
    margins, so the assembled sharded array is exactly [h, w, K] and the
    caller never slices it globally.  (A global row slice of a
    row-sharded array — even an aligned one — makes GSPMD gather the FULL
    array on every device: measured +29-33 GB on the 10k config-5 test,
    the round-5 OOM root cause.)"""
    n = int(mesh.shape[axis_name])
    slicer = ImageSlicer((h, w), tile_size, tile_step, weight=weight)
    th, tw = slicer.tile_size
    tgt_h, tgt_w = slicer.target_shape
    m_top, m_left = slicer.margin_top, slicer.margin_left
    strip_h = -(-h // n)  # output rows per device (final frame)

    coords = slicer.crops  # (x, y, w, h)
    ys, xs = coords[:, 1].astype(np.int64), coords[:, 0].astype(np.int64)
    coords_yx = np.stack([ys, xs], axis=1)
    masks = _group_masks(coords_yx, slicer.tile_step, partition)

    # static normalization canvas in the target frame
    weight_np = slicer.weight.astype(np.float32)
    norm = np.zeros((tgt_h, tgt_w), dtype=np.float64)
    for x, y in zip(xs, ys):
        norm[y : y + th, x : x + tw] += weight_np
    norm = np.clip(norm, np.finfo(np.float64).eps, None).astype(np.float32)
    inv_norm = 1.0 / norm

    probe = jax.eval_shape(
        model_fns[0], jax.ShapeDtypeStruct((batch_size, th, tw, c), jnp.float32)
    )
    out_channels = int(probe.shape[-1])

    dev_grid = _axis_device_grid(mesh, axis_name)
    weight_const = jnp.asarray(weight_np)[..., None]

    # inverse norm, extended with identity rows past the target so every
    # device's strip_h-row window is defined (the canvas there is zero and
    # those rows are trimmed by the caller when h % n != 0)
    rows_total = m_top + n * strip_h
    if rows_total > tgt_h:
        inv_norm = np.concatenate(
            [inv_norm, np.ones((rows_total - tgt_h, tgt_w), np.float32)], axis=0
        )

    # per-device, per-group tile lists: every tile of the group whose rows
    # intersect the device's OUTPUT window (target-frame rows
    # [m_top + d*strip_h, m_top + (d+1)*strip_h)), in global scan order
    # (bit-match invariant), split into balanced exact batches — no padding
    # slots.  Local row offsets are in the haloed strip frame (window start
    # minus one tile height).
    per_dev_args = []
    for d in range(n):
        dev = dev_grid[d, 0]
        lo = m_top + d * strip_h
        hi = lo + strip_h
        mains, rems = [], []
        for g_mask in masks:
            sel = g_mask & (ys + th > lo) & (ys < hi)
            local = np.stack([ys[sel] - lo + th, xs[sel]], axis=1).astype(np.int32)
            main, rem = _stack_batches(local, batch_size)
            mains.append(jax.device_put(main, dev))
            rems.append(jax.device_put(rem, dev))
        inv_crop = inv_norm[lo:hi, m_left : m_left + w, None]
        per_dev_args.append(
            (
                tuple(mains),
                tuple(rems),
                jax.device_put(weight_const, dev),
                jax.device_put(jnp.asarray(inv_crop), dev),
            )
        )

    runner = _build_strip_runner(model_fns, strip_h, tgt_w, m_left, w, th, tw, out_channels)
    return slicer, strip_h, runner, tuple(per_dev_args), dev_grid, out_channels


def _accumulate_batch(model_fn, canvas, batch_coords, padded, weight_dev, th, tw, out_channels):
    """One exact batch: gather tiles, run the model, weighted DUS overlap-add.
    Identical arithmetic (and per-tile order) to the single-chip runner
    (inference/tiles.py _build_tiled_runner) so strips bit-match it."""
    n = batch_coords.shape[0]
    tiles = jax.vmap(
        lambda yx: lax.dynamic_slice(padded, (yx[0], yx[1], 0), (th, tw, padded.shape[-1]))
    )(batch_coords)
    preds = model_fn(tiles).astype(jnp.float32)

    def inner(i, canvas):
        y, x = batch_coords[i, 0], batch_coords[i, 1]
        region = lax.dynamic_slice(canvas, (y, x, 0), (th, tw, out_channels))
        update = region + preds[i] * weight_dev
        return lax.dynamic_update_slice(canvas, update, (y, x, 0))

    return lax.fori_loop(0, n, inner, canvas)


@lru_cache(maxsize=64)
def _build_strip_runner(model_fns, strip_rows, tgt_w, col_off, w_out, th, tw, out_channels):
    """Jitted per-device strips program: haloed local canvas, group-ordered
    balanced-batch scans + exact remainder steps, then the device's own
    FINAL-frame window (strip_rows output rows x [col_off, col_off+w_out)
    columns) x inverse norm — margins cropped locally so the assembled
    array needs no global slicing.  Retraces per distinct batch-plan
    shapes; devices whose plans coincide share the trace."""

    @jax.jit
    def run(strip_img, group_mains, group_rems, weight_dev, inv_norm_crop):
        local = jnp.zeros((strip_rows + 2 * th, tgt_w, out_channels), jnp.float32)
        for fn, main, rem in zip(model_fns, group_mains, group_rems):
            if main.shape[0] > 0:
                local, _ = lax.scan(
                    lambda c, bc, fn=fn: (
                        _accumulate_batch(fn, c, bc, strip_img, weight_dev, th, tw, out_channels),
                        None,
                    ),
                    local,
                    main,
                )
            if rem.shape[0] > 0:
                local = _accumulate_batch(
                    fn, local, rem, strip_img, weight_dev, th, tw, out_channels
                )
        # own output window only; halo rows belong to the neighbours, which
        # computed the straddling tiles themselves
        return local[th : th + strip_rows, col_off : col_off + w_out] * inv_norm_crop

    return run


@lru_cache(maxsize=8)
def _build_canvas_runner(model_fns, tgt_h, tgt_w, th, tw, out_channels):
    """Jitted per-device replicated-canvas program: full-target accumulator
    over the device's balanced exact batches (normalization happens after
    the cross-device psum)."""

    @jax.jit
    def run(padded, group_mains, group_rems, weight_dev):
        canvas = jnp.zeros((tgt_h, tgt_w, out_channels), jnp.float32)
        for fn, main, rem in zip(model_fns, group_mains, group_rems):
            if main.shape[0] > 0:
                canvas, _ = lax.scan(
                    lambda c, bc, fn=fn: (
                        _accumulate_batch(fn, c, bc, padded, weight_dev, th, tw, out_channels),
                        None,
                    ),
                    canvas,
                    main,
                )
            if rem.shape[0] > 0:
                canvas = _accumulate_batch(
                    fn, canvas, rem, padded, weight_dev, th, tw, out_channels
                )
        return canvas

    return run


@lru_cache(maxsize=8)
def _psum_merge_program(mesh, axis_name, tgt_h, tgt_w, out_channels):
    """One-collective merge of the replicated-canvas partials: psum over the
    tile axis (rides ICI), then the static inverse-norm multiply."""

    def merge(partial, inv_norm):
        return lax.psum(partial[0], axis_name) * inv_norm

    return jax.jit(
        shard_map(
            merge,
            mesh=mesh,
            in_specs=(P(axis_name), P()),
            out_specs=P(),
        )
    )


def _tiled_apply_replicated(
    model_fns, partition, image, mesh, tile_size, tile_step, weight, batch_size, axis_name
) -> jnp.ndarray:
    """Round-2 scheme: full-resolution accumulator per device + one psum.

    Tile groups (d4 parity classes) are each round-robined over devices
    independently, so the load stays balanced (per-device counts differ by
    at most 1) and every device scans group g with group g's model
    function — same group order as the single-chip grouped runner.  Each
    device runs balanced exact batches of its own tiles; no padding slot
    ever executes the model.
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    n = int(mesh.shape[axis_name])

    slicer = ImageSlicer((h, w), tile_size, tile_step, weight=weight)
    th, tw = slicer.tile_size
    coords = slicer.crops
    coords_yx_all = np.stack([coords[:, 1], coords[:, 0]], axis=1).astype(np.int32)
    masks = _group_masks(coords_yx_all.astype(np.int64), slicer.tile_step, partition)

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
    padded_np = np.pad(np.asarray(image, dtype=np.float32), pad_spec)

    probe = jax.eval_shape(
        model_fns[0], jax.ShapeDtypeStruct((batch_size, th, tw, image.shape[-1]), jnp.float32)
    )
    out_channels = int(probe.shape[-1])
    weight_const = jnp.asarray(weight_np)[..., None]

    dev_grid = _axis_device_grid(mesh, axis_name)
    runner = _build_canvas_runner(model_fns, tgt_h, tgt_w, th, tw, out_channels)

    partials = []
    for d in range(n):
        dev = dev_grid[d, 0]
        mains, rems = [], []
        for g_mask in masks:
            g_coords = coords_yx_all[g_mask]
            main, rem = _stack_batches(g_coords[d::n], batch_size)
            mains.append(jax.device_put(main, dev))
            rems.append(jax.device_put(rem, dev))
        padded_dev = jax.device_put(padded_np, dev)
        partial = runner(padded_dev, tuple(mains), tuple(rems), jax.device_put(weight_const, dev))
        partials.append(partial[None])  # shard shape [1, tgt_h, tgt_w, K]

    arrays = []
    for d in range(n):
        arrays.append(partials[d])
        for replica in dev_grid[d, 1:]:
            arrays.append(jax.device_put(partials[d], replica))
    stacked = jax.make_array_from_single_device_arrays(
        (n, tgt_h, tgt_w, out_channels), NamedSharding(mesh, P(axis_name)), arrays
    )
    inv_norm = jax.device_put(
        jnp.asarray(1.0 / norm)[..., None], NamedSharding(mesh, P())
    )
    merge = _psum_merge_program(mesh, axis_name, tgt_h, tgt_w, out_channels)
    with mesh:
        merged = merge(stacked, inv_norm)
    return merged[
        slicer.margin_top : slicer.margin_top + h,
        slicer.margin_left : slicer.margin_left + w,
    ]
