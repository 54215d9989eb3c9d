"""Pallas TPU kernel: weighted scatter-accumulate of prediction tiles into a
full-resolution canvas (the hot loop of huge-image tiled inference —
reference TileMerger.integrate_batch, tiles.py:321-339).

Design:
* The canvas and norm mask stay in HBM (ANY); each grid step DMAs the
  tile-sized region into VMEM scratch, fuses ``region + tile * weight``
  (and ``norm + weight``) on the VPU, and DMAs it back.
* The tile batch is auto-pipelined into VMEM by the block spec.
* Tile coordinates arrive via scalar prefetch (SMEM) so the DMA addresses
  are known ahead of the body.
* TPU grid steps execute sequentially, so overlapping tiles accumulate
  correctly without atomics.

Falls back to interpreter mode off-TPU (tests run it on CPU).
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

__all__ = ["pallas_accumulate_tiles", "pallas_available"]


def pallas_available() -> bool:
    return _PALLAS_OK


def _merge_kernel(th, tw, c,
                  coords_ref, tiles_ref, weight_ref, canvas_in, norm_in,
                  canvas_ref, norm_ref, scratch, nscratch, sems):
    i = pl.program_id(0)
    y = coords_ref[i, 0]
    x = coords_ref[i, 1]

    canvas_dma_in = pltpu.make_async_copy(
        canvas_ref.at[pl.ds(y, th), pl.ds(x, tw), :], scratch, sems.at[0]
    )
    norm_dma_in = pltpu.make_async_copy(
        norm_ref.at[pl.ds(y, th), pl.ds(x, tw), :], nscratch, sems.at[1]
    )
    canvas_dma_in.start()
    norm_dma_in.start()
    canvas_dma_in.wait()
    norm_dma_in.wait()

    scratch[:] = scratch[:] + tiles_ref[0] * weight_ref[:]
    nscratch[:] = nscratch[:] + weight_ref[:, :, :1]

    canvas_dma_out = pltpu.make_async_copy(
        scratch, canvas_ref.at[pl.ds(y, th), pl.ds(x, tw), :], sems.at[0]
    )
    norm_dma_out = pltpu.make_async_copy(
        nscratch, norm_ref.at[pl.ds(y, th), pl.ds(x, tw), :], sems.at[1]
    )
    canvas_dma_out.start()
    norm_dma_out.start()
    canvas_dma_out.wait()
    norm_dma_out.wait()


@partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def pallas_accumulate_tiles(canvas, norm_mask, tiles, coords_yx, weight, interpret=False):
    """Weighted scatter-add of tiles into canvas via a Pallas TPU kernel.

    Args:
        canvas: [H, W, C] accumulator (donated).
        norm_mask: [H, W, 1] weight accumulator (donated).
        tiles: [N, th, tw, C] predictions.
        coords_yx: [N, 2] int32 (row, col) offsets into the canvas.
        weight: [th, tw, C-broadcastable] blending window (use [th, tw, 1]
            broadcast to C before the call for best layout).

    Returns:
        (canvas, norm_mask) with all tiles accumulated.
    """
    n, th, tw, c = tiles.shape
    weight = jnp.broadcast_to(weight, (th, tw, c)).astype(canvas.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, th, tw, c), lambda i, coords: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight window
            pl.BlockSpec(memory_space=pl.ANY),   # canvas (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # norm mask (HBM)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((th, tw, c), canvas.dtype),
            pltpu.VMEM((th, tw, 1), canvas.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = partial(_merge_kernel, th, tw, c)

    canvas, norm_mask = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
            jax.ShapeDtypeStruct(norm_mask.shape, norm_mask.dtype),
        ],
        # operand order: (coords, tiles, weight, canvas, norm); alias
        # canvas->out0 and norm->out1 for in-place accumulation
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(coords_yx, tiles, weight, canvas, norm_mask)
    return canvas, norm_mask
