"""Pallas TPU kernel: weighted scatter-accumulate of prediction tiles into a
full-resolution canvas (the hot loop of huge-image tiled inference —
reference TileMerger.integrate_batch, tiles.py:321-339).

Design:
* Mosaic requires HBM DMA slices to be lane-aligned (last dim multiple of
  128), so the NHWC canvas [H, W, C] is viewed as [H, W*C] (a free row-major
  reshape) and tiles as [N, th, tw*C]; column offsets become x*C.
* Each grid step DMAs the tile-sized canvas region into VMEM scratch, fuses
  ``region + tile * weight`` (and ``norm + weight``) on the VPU, and DMAs it
  back. Tile rows are auto-pipelined into VMEM by the block spec.
* Tile coordinates arrive via scalar prefetch (SMEM).
* TPU grid steps execute sequentially, so overlapping tiles accumulate
  correctly without atomics.

Two kernels live here:

* :func:`pallas_grid_merge` — the DEFAULT fast path for complete regular
  tile grids (what ImageSlicer always produces).  Gather formulation: each
  step x step canvas block is the sum of the k^2 static tile quadrants
  covering it, so the canvas is written exactly once with no
  read-modify-write; Mosaic auto-double-buffers all DMAs.  Measured on v5e
  (49 x 256^2x4 tiles, step 128): 0.16 ms vs 0.27 ms for the XLA
  scan-of-DUS (1.8x; the kernel body alone is 0.03 ms — the rest is
  per-dispatch latency).  Bit-exact vs the scatter path.
* :func:`pallas_accumulate_tiles` — scatter-accumulate for ARBITRARY
  aligned coords (streaming/partial batches).  Serializes canvas RMW per
  tile, so it loses to the XLA scan (~12 ms vs 0.27 ms on the same
  microbench) and stays an explicit opt-in.

Use :func:`grid_merge_supported` / :func:`pallas_merge_supported` to check
geometry; interpret mode runs anywhere (tests use it on CPU).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = [
    "pallas_accumulate_tiles",
    "pallas_available",
    "pallas_merge_supported",
    "pallas_grid_merge",
    "grid_merge_supported",
    "detect_regular_grid",
]

_LANE = 128
_SUBLANE = 8


def pallas_available() -> bool:
    return _PALLAS_OK


def pallas_merge_supported(
    coords_yx: np.ndarray, tile_h: int, tile_w: int, channels: int, norm_channels: int = 1
) -> bool:
    """True when the tile geometry satisfies Mosaic DMA alignment in the
    flattened [H, W*C] view: row offsets & tile height multiples of 8,
    (col offset * C) and (tile_w * C) multiples of 128 for both the canvas
    (C) and the norm mask (norm_channels)."""
    if not _PALLAS_OK:
        return False
    coords = np.asarray(coords_yx)
    for c in (channels, norm_channels):
        if (tile_w * c) % _LANE:
            return False
        if ((coords[:, 1] * c) % _LANE).any():
            return False
    if tile_h % _SUBLANE or (coords[:, 0] % _SUBLANE).any():
        return False
    return True


def _merge_kernel(th, twc, tw_norm,
                  coords_ref, tiles_ref, weight_ref, weight_norm_ref, canvas_in, norm_in,
                  canvas_ref, norm_ref, scratch, nscratch, sems):
    i = pl.program_id(0)
    # alignment guaranteed by pallas_merge_supported(); the hints let Mosaic
    # prove the dynamic DMA offsets divide the (8, 128) tiling
    y = pl.multiple_of(coords_ref[i, 0], _SUBLANE)
    xc = pl.multiple_of(coords_ref[i, 1], _LANE)   # col offset * C  (canvas view)
    xn = pl.multiple_of(coords_ref[i, 2], _LANE)   # col offset * Cn (norm view)

    canvas_dma_in = pltpu.make_async_copy(
        canvas_ref.at[pl.ds(y, th), pl.ds(xc, twc)], scratch, sems.at[0]
    )
    norm_dma_in = pltpu.make_async_copy(
        norm_ref.at[pl.ds(y, th), pl.ds(xn, tw_norm)], nscratch, sems.at[1]
    )
    canvas_dma_in.start()
    norm_dma_in.start()
    canvas_dma_in.wait()
    norm_dma_in.wait()

    scratch[:] = scratch[:] + tiles_ref[0] * weight_ref[:]
    nscratch[:] = nscratch[:] + weight_norm_ref[:]

    canvas_dma_out = pltpu.make_async_copy(
        scratch, canvas_ref.at[pl.ds(y, th), pl.ds(xc, twc)], sems.at[0]
    )
    norm_dma_out = pltpu.make_async_copy(
        nscratch, norm_ref.at[pl.ds(y, th), pl.ds(xn, tw_norm)], sems.at[1]
    )
    canvas_dma_out.start()
    norm_dma_out.start()
    canvas_dma_out.wait()
    norm_dma_out.wait()


@partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def _pallas_merge_2d(canvas2d, norm2d, tiles2d, coords, weight2d, weight_norm2d, interpret=False):
    """canvas2d [H, W*C], norm2d [H, W*Cn], tiles2d [N, th, tw*C],
    coords [N, 3] = (row, col*C, col*Cn), weight2d [th, tw*C],
    weight_norm2d [th, tw*Cn]."""
    n, th, twc = tiles2d.shape
    tw_norm = weight_norm2d.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, th, twc), lambda i, coords: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # canvas weight window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norm weight window
            pl.BlockSpec(memory_space=pl.ANY),      # canvas (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # norm mask (HBM)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, twc), canvas2d.dtype),
            pltpu.VMEM((th, tw_norm), canvas2d.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = partial(_merge_kernel, th, twc, tw_norm)

    canvas2d, norm2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(canvas2d.shape, canvas2d.dtype),
            jax.ShapeDtypeStruct(norm2d.shape, norm2d.dtype),
        ],
        # operand order: (coords, tiles, weight, weight_norm, canvas, norm);
        # alias canvas->out0 and norm->out1 for in-place accumulation
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(coords, tiles2d, weight2d, weight_norm2d, canvas2d, norm2d)
    return canvas2d, norm2d


def pallas_accumulate_tiles(canvas, norm_mask, tiles, coords_yx, weight, interpret=False):
    """Weighted scatter-add of tiles into canvas via the Pallas TPU kernel.

    Args:
        canvas: [H, W, C] accumulator (donated).
        norm_mask: [H, W, Cn] weight accumulator (Cn typically 1; donated).
        tiles: [N, th, tw, C] predictions.
        coords_yx: [N, 2] int32 (row, col) offsets into the canvas.
        weight: [th, tw, 1]-broadcastable blending window.

    Returns:
        (canvas, norm_mask) with all tiles accumulated.

    Check :func:`pallas_merge_supported` first; misaligned geometries must
    use the XLA path (inference.tiles.accumulate_tiles).
    """
    n, th, tw, c = tiles.shape
    h, w, _ = canvas.shape
    cn = norm_mask.shape[-1]
    weight_full = jnp.broadcast_to(jnp.asarray(weight), (th, tw, c)).astype(canvas.dtype)
    weight_norm = jnp.broadcast_to(jnp.asarray(weight), (th, tw, cn)).astype(canvas.dtype)

    coords = jnp.stack(
        [coords_yx[:, 0], coords_yx[:, 1] * c, coords_yx[:, 1] * cn], axis=1
    ).astype(jnp.int32)

    canvas2d, norm2d = _pallas_merge_2d(
        canvas.reshape(h, w * c),
        norm_mask.reshape(h, w * cn),
        tiles.reshape(n, th, tw * c),
        coords,
        weight_full.reshape(th, tw * c),
        weight_norm.reshape(th, tw * cn),
        interpret=interpret,
    )
    return canvas2d.reshape(h, w, c), norm2d.reshape(h, w, cn)


# ---------------------------------------------------------------------------
# Gather-formulation merge for regular tile grids (the default fast path)
# ---------------------------------------------------------------------------
#
# When the tiles lie on a full row-major grid with uniform step s and
# tile = k*s (ImageSlicer always produces this; k=2 for the canonical
# 512/256 overlap), the scatter-accumulate can be turned inside out:
# every s x s canvas block is covered by exactly the k^2 tiles
# (by-qy, bx-qx), q in [0,k)^2, each contributing its quadrant q.  The
# canvas is then WRITTEN EXACTLY ONCE (out block = sum of k^2 weighted
# tile quadrants) instead of read-modify-written once per overlapping
# tile.  No RMW hazard -> Mosaic's pipeline emitter double-buffers all
# DMAs automatically, and HBM traffic drops from
#   k^2 x tiles-read + k^2 x canvas-(read+write)        (scatter)
# to
#   k^2 x tiles-read + 1 x canvas-write                 (gather).
#
# This replaces the hot loop of reference TileMerger.integrate_batch
# (pytorch_toolbelt/inference/tiles.py:321-339) for grid geometries.


def detect_regular_grid(coords_yx, tile_h: int, tile_w: int):
    """If coords form a complete row-major (ty, tx) grid with uniform steps
    that divide the tile size, return (ty_tiles, tx_tiles, step_h, step_w);
    else None."""
    coords = np.asarray(coords_yx)
    if coords.ndim != 2 or coords.shape[1] != 2 or len(coords) == 0:
        return None
    ys = np.unique(coords[:, 0])
    xs = np.unique(coords[:, 1])
    if len(ys) * len(xs) != len(coords):
        return None
    expect = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)
    if not np.array_equal(coords, expect):
        return None
    if ys[0] != 0 or xs[0] != 0:
        return None

    def step_of(vals, tile):
        if len(vals) == 1:
            return tile  # degenerate axis: single tile, k=1
        d = np.diff(vals)
        if (d != d[0]).any():
            return None
        return int(d[0])

    sh = step_of(ys, tile_h)
    sw = step_of(xs, tile_w)
    if sh is None or sw is None or sh <= 0 or sw <= 0:
        return None
    if tile_h % sh or tile_w % sw:
        return None
    return len(ys), len(xs), sh, sw


def grid_merge_supported(coords_yx, tile_h, tile_w, channels, canvas_shape, norm_channels=1):
    """True when the gather-formulation kernel applies: TPU backend, regular
    grid, canvas exactly spanned by the grid, and lane-aligned step blocks."""
    if not _PALLAS_OK:
        return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    grid = detect_regular_grid(coords_yx, tile_h, tile_w)
    if grid is None:
        return False
    ty, tx, sh, sw = grid
    h, w = int(canvas_shape[0]), int(canvas_shape[1])
    if (ty - 1) * sh + tile_h != h or (tx - 1) * sw + tile_w != w:
        return False
    for c in (channels, norm_channels):
        if (sw * c) % _LANE:
            return False
    if sh % _SUBLANE:
        return False
    return True


def _make_gather_kernel(kh, kw, ty, tx, sh, swc, swn):
    def kernel(*refs):
        # refs: kh*kw tile views, w_ref, wn_ref, out_ref, norm_ref
        tile_refs = refs[: kh * kw]
        w_ref, wn_ref = refs[kh * kw], refs[kh * kw + 1]
        out_ref, norm_ref = refs[kh * kw + 2], refs[kh * kw + 3]
        by = pl.program_id(0)
        bx = pl.program_id(1)

        acc = jnp.zeros(out_ref.shape, out_ref.dtype)
        nacc = jnp.zeros(norm_ref.shape, norm_ref.dtype)
        for qy in range(kh):
            for qx in range(kw):
                t_y = by - qy
                t_x = bx - qx
                valid = jnp.logical_and(
                    jnp.logical_and(t_y >= 0, t_y < ty),
                    jnp.logical_and(t_x >= 0, t_x < tx),
                )
                gate = jnp.where(valid, 1.0, 0.0).astype(acc.dtype)
                wq = w_ref[qy * sh : (qy + 1) * sh, qx * swc : (qx + 1) * swc]
                wnq = wn_ref[qy * sh : (qy + 1) * sh, qx * swn : (qx + 1) * swn]
                tq = tile_refs[qy * kw + qx][0]
                acc = acc + gate * (tq * wq)
                nacc = nacc + gate * wnq
        out_ref[:] = acc
        norm_ref[:] = nacc

    return kernel


@partial(
    jax.jit,
    static_argnames=("ty", "tx", "kh", "kw", "sh", "sw", "cn", "out_dtype", "interpret"),
)
def _pallas_grid_merge_nhwc(tiles, weight, ty, tx, kh, kw, sh, sw, cn, out_dtype,
                            interpret=False):
    """tiles [N, th, tw, C] in row-major (ty, tx) order, weight [th, tw, 1];
    returns (canvas [H, W, C], norm [H, W, Cn]) with H=(ty+kh-1)*sh.
    All reshapes/broadcasts live INSIDE the jit so a call is one dispatch."""
    n, th, tw, c = tiles.shape
    weight_full = jnp.broadcast_to(weight, (th, tw, c)).astype(out_dtype)
    weight_norm = jnp.broadcast_to(weight, (th, tw, cn)).astype(out_dtype)
    tiles2d = tiles.astype(out_dtype).reshape(n, th, tw * c)
    weight2d = weight_full.reshape(th, tw * c)
    weight_norm2d = weight_norm.reshape(th, tw * cn)

    swc = sw * c
    swn = sw * cn
    by_blocks = ty + kh - 1
    bx_blocks = tx + kw - 1

    def make_tile_spec(qy, qx):
        def index_map(by, bx):
            t = jnp.clip(by - qy, 0, ty - 1) * tx + jnp.clip(bx - qx, 0, tx - 1)
            return (t, qy, qx)

        return pl.BlockSpec((1, sh, swc), index_map)

    in_specs = [make_tile_spec(qy, qx) for qy in range(kh) for qx in range(kw)]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # weight window
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # norm weight window

    out_specs = [
        pl.BlockSpec((sh, swc), lambda by, bx: (by, bx)),
        pl.BlockSpec((sh, swn), lambda by, bx: (by, bx)),
    ]

    kernel = _make_gather_kernel(kh, kw, ty, tx, sh, swc, swn)
    operands = [tiles2d] * (kh * kw) + [weight2d, weight_norm2d]

    canvas2d, norm2d = pl.pallas_call(
        kernel,
        grid=(by_blocks, bx_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((by_blocks * sh, bx_blocks * swc), tiles2d.dtype),
            jax.ShapeDtypeStruct((by_blocks * sh, bx_blocks * swn), tiles2d.dtype),
        ],
        interpret=interpret,
    )(*operands)
    h = by_blocks * sh
    w = bx_blocks * sw
    return canvas2d.reshape(h, w, c), norm2d.reshape(h, w, cn)


def pallas_grid_merge(tiles, coords_yx, weight, canvas_shape, norm_channels=1,
                      dtype=None, interpret=False):
    """Merge a COMPLETE regular-grid tile set into a fresh canvas via the
    gather-formulation Pallas kernel (canvas written exactly once; no RMW).

    Args:
        tiles: [N, th, tw, C] predictions, in ImageSlicer row-major order.
        coords_yx: [N, 2] (row, col) origins — must form a regular grid
            (check with :func:`grid_merge_supported` first).
        weight: [th, tw]-broadcastable blending window.
        canvas_shape: (H, W) of the target canvas.

    Returns:
        (canvas [H, W, C], norm_mask [H, W, norm_channels]) — same contract
        as accumulating all tiles into zero-initialized buffers.
    """
    n, th, tw, c = tiles.shape
    cn = norm_channels
    grid = detect_regular_grid(np.asarray(coords_yx), th, tw)
    if grid is None:
        raise ValueError("pallas_grid_merge requires a complete regular tile grid")
    ty, tx, sh, sw = grid
    kh, kw = th // sh, tw // sw
    h, w = int(canvas_shape[0]), int(canvas_shape[1])
    if (ty + kh - 1) * sh != h or (tx + kw - 1) * sw != w:
        raise ValueError(
            f"canvas shape {(h, w)} does not match grid extent "
            f"{((ty + kh - 1) * sh, (tx + kw - 1) * sw)}"
        )
    dtype = np.dtype(dtype) if dtype is not None else np.dtype(tiles.dtype)
    w_arr = jnp.asarray(weight)
    if w_arr.ndim == 2:
        w_arr = w_arr[..., None]

    return _pallas_grid_merge_nhwc(
        tiles, w_arr,
        ty=ty, tx=tx, kh=kh, kw=kw, sh=sh, sw=sw, cn=cn,
        out_dtype=dtype.name, interpret=interpret,
    )
