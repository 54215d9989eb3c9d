"""Pallas implicit-GEMM 3x3 convolution for NARROW channel counts.

Why this exists (measured, benchmarks/RESULTS.md "MXU lane-occupancy probe"):
XLA's TPU convolution maps output channels to MXU lanes, so a 32-channel
conv fills 32/128 lanes and measures ~9 TFLOP/s on v5e — while a dense
256-channel conv on the same bytes hits 144 TFLOP/s.  The narrow convs of
the BASELINE UNet-32 therefore dominate the north-star pipeline.

This kernel transposes the GEMM mapping instead of the model:

    out[co, p] = sum_k W[co, k] @ patches[k, p]      k = 9 * C_in

* p = spatial positions on the LANE axis (a full 128+ wide row tile),
* k = the 3x3xC_in contraction on the SUBLANE axis (288 for C_in=32 —
  2.25 full MXU passes instead of 4x-underfilled lanes),
* co streamed — its narrowness no longer wastes the systolic array.

Activations live in ``[H, C, W]`` layout ("HCW"): the dy taps of the 3x3
window are then plain sublane-dim row offsets and the dx taps are lane
rolls, so the im2col patch buffer is assembled entirely from natural
VMEM-shaped copies (no transposes anywhere).  The grid walks row-strips;
each cell DMAs its strip + 1-row halo from HBM, builds patches
[TH, 9*C_in, W] and runs TH clean [C_out, k] @ [k, W] MXU calls with a
fused scale/bias/ReLU epilogue (inference BN folds into scale+bias).

Constraints: stride 1, SAME padding, W a multiple of 128, C_in a multiple
of 8.  The reference semantics matched is torch Conv2d(3x3, padding=1) /
flax nn.Conv SAME — the hot layer of every UNet block
(reference modules/unet.py:13-60).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_hcw", "conv3x3_eligible", "pack_conv3x3_weights", "fold_batchnorm"]

_TH = 16  # output rows per grid cell (bf16 sublane tile)


def pack_conv3x3_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C_in, C_out] (flax HWIO) -> [3, C_out, 3*C_in]: one weight
    matrix per dx tap, contraction order k = dy * C_in + ci."""
    kh, kw, ci, co = w_hwio.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"conv3x3 kernel expects 3x3 weights, got {kh}x{kw}")
    # [dy,dx,ci,co] -> [dx, co, dy, ci] -> [3, co, 3*ci]
    return jnp.transpose(w_hwio, (1, 3, 0, 2)).reshape(3, co, 3 * ci)


def fold_batchnorm(scale, bias, mean, var, eps: float = 1e-5):
    """Inference BatchNorm -> (scale', bias') to fuse into the conv epilogue:
    y = x * scale' + bias'."""
    inv = scale / jnp.sqrt(var + eps)
    return inv, bias - mean * inv


def _conv_kernel(x_hbm, w_ref, sb_ref, out_ref, xs, patches, sem, *, c_in, c_out, w_len, relu):
    s = pl.program_id(1)
    b = pl.program_id(0)

    # one DMA: strip + 1-row halo (x_hbm is padded to H+2 rows).  The dx
    # taps are NOT folded into the contraction: Mosaic has no bf16 lane
    # rotate and DMA lane offsets must be 128-aligned, so instead the three
    # dx taps become three k=3*C_in dots whose fp32 PARTIAL RESULTS are
    # lane-rotated (32-bit rotate is supported) and edge-masked.
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(s * _TH, _TH + 2)], xs, sem)
    dma.start()
    dma.wait()

    # im2col without transposes: patches[dy*C+ci, t*W+q] = xs[t+dy, ci, q].
    # All output rows of the strip share ONE [3*C_in, TH*W] rhs so each tap
    # is a single long-stream MXU dot (N = TH*W) instead of TH short ones —
    # the pipeline fill/drain of a [C_out, k] x [k, W] dot at C_out=32 costs
    # more than the dot itself (measured 12 -> 40+ TF/s moving to this form).
    for dy in range(3):
        for t in range(_TH):
            patches[pl.ds(dy * c_in, c_in), pl.ds(t * w_len, w_len)] = xs[t + dy]

    scale = sb_ref[0]  # [C_out, 1]
    bias = sb_ref[1]
    n = _TH * w_len
    lane = jax.lax.broadcasted_iota(jnp.int32, (c_out, n), 1)
    seg = jax.lax.rem(lane, w_len)

    def tap(dx):
        return jax.lax.dot_general(
            w_ref[dx],               # [C_out, 3*C_in]
            patches[...],            # [3*C_in, TH*W]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # out[q] = sum_dx w_dx . x[q + dx - 1]  ->  shift partials by 1-dx.
    # The rolls wrap across row segments, but exactly the wrapped columns
    # (q = 0 / q = W-1 of each row) have no left/right tap: masked to 0.
    left = pltpu.roll(tap(0), 1, 1)
    left = jnp.where(seg == 0, 0.0, left)
    mid = tap(1)
    right = pltpu.roll(tap(2), n - 1, 1)
    right = jnp.where(seg == w_len - 1, 0.0, right)

    acc = (left + mid + right) * scale + bias
    if relu:
        acc = jnp.maximum(acc, 0.0)
    acc = acc.astype(out_ref.dtype)
    for t in range(_TH):
        out_ref[0, t] = acc[:, t * w_len : (t + 1) * w_len]


def conv3x3_eligible(h: int, c_in: int, w_len: int, c_out: int) -> bool:
    """Static-shape predicate for the Pallas path (else use XLA's conv)."""
    return w_len % 128 == 0 and h % _TH == 0 and c_in % 8 == 0 and c_out % 8 == 0


@partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_hcw(x, w_packed, scale, bias, relu: bool = False, interpret: bool = False):
    """3x3 SAME conv on [B, H, C_in, W] activations with fused
    y = conv(x) * scale + bias (optionally ReLU).

    Args:
        x: [B, H, C_in, W] bf16, W % 128 == 0, C_in % 8 == 0.
        w_packed: [3, C_out, 3*C_in] from ``pack_conv3x3_weights``.
        scale, bias: [C_out] fp32 (BN folded via ``fold_batchnorm``; use
            ones/bias for a plain conv+bias).
        interpret: run the Pallas interpreter (CPU tests).
    Returns:
        [B, H, C_out, W] bf16.
    """
    b, h, c_in, w_len = x.shape
    c_out = int(w_packed.shape[1])
    if w_len % 128 != 0:
        raise ValueError(f"W must be a multiple of 128, got {w_len}")
    if c_in % 8 != 0:
        raise ValueError(f"C_in must be a multiple of 8, got {c_in}")
    if h % _TH != 0:
        raise ValueError(f"H must be a multiple of {_TH}, got {h}")
    if w_packed.shape != (3, c_out, 3 * c_in):
        raise ValueError(f"w_packed shape {w_packed.shape}, expected (3, C_out, {3 * c_in})")

    x_pad = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (0, 0), (0, 0)))  # SAME halo rows
    sb = jnp.stack([scale, bias]).astype(jnp.float32)[..., None]  # [2, C_out, 1]

    kernel = partial(
        _conv_kernel, c_in=c_in, c_out=c_out, w_len=w_len, relu=relu
    )
    grid = (b, h // _TH)
    flops = 2 * b * h * w_len * 9 * c_in * c_out
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM; strips DMA'd
            # (must be HBM, not ANY: VMEM placement forbids the dx-offset
            # lane slicing the three tap DMAs rely on)
            pl.BlockSpec((3, c_out, 3 * c_in), lambda b_, s_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c_out, 1), lambda b_, s_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _TH, c_out, w_len), lambda b_, s_: (b_, s_, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, c_out, w_len), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((_TH + 2, c_in, w_len), jnp.bfloat16),   # strip + halo rows
            pltpu.VMEM((3 * c_in, _TH * w_len), jnp.bfloat16),  # im2col patches
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + b * h * c_out * w_len * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_pad, w_packed.astype(jnp.bfloat16), sb)
