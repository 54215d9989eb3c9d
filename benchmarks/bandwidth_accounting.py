"""HBM-traffic accounting for the bench d4 pipelines.

RESULTS.md's round-4 batch sweep asserted the distributed-d4 pipeline sits
at a "bandwidth-bound plateau (est. ~435 GB/s)" — an estimate, not a
measurement.  This probe replaces the estimate with XLA's own cost model.

Method.  Cost-analyzing the WHOLE fused pipeline program is wrong on TPU:
the tile loop lowers to an HLO while, and XLA's ``cost_analysis()`` counts
a while body ONCE, not times its trip count (measured here: 20.3 TFLOP for
a full-d4 image whose per-tile arithmetic totals ~293 TFLOP).  Instead we
enumerate the EXACT batch programs the runner executes — the same
balanced-batch plan ``tiled_apply`` builds (per parity group:
``ceil(N / ceil(N/B))``-sized main batches + one exact remainder) — lower
each distinct (group_fn, batch_size) program once, read its
``bytes accessed`` / ``flops``, and multiply by its execution count.  The
canvas side (per-tile read-modify-write of a [th, tw, K] region at the
accumulator dtype + the final normalize over the padded canvas) is added
analytically; at K=1 it is ~0.5% of the model traffic.

Achieved GB/s = modeled bytes / measured wall time (chained-iteration,
d2h-synced — bench.py's methodology).  Reads out, per mode: modeled GB
moved, achieved GB/s, % of the v5e's 819 GB/s HBM peak, achieved TFLOP/s,
% of the 197 TFLOP/s bf16 peak — where each pipeline sits on the roofline,
from the compiler's model rather than hand arithmetic.

Covers {distributed, full} x {bf16, int8} at the shipped bench optima;
int8 "flops" are MAC-counted by the same XLA cost model and compared
against the chip's 394 TOP/s int8 peak.

Run on the real chip: ``python benchmarks/bandwidth_accounting.py``.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.inference import tiled_apply_d4_tta
from pytorch_toolbelt_tpu.inference import tiles as tiles_mod
from pytorch_toolbelt_tpu.utils import enable_compile_cache
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

enable_compile_cache(str(Path(__file__).parent.parent / ".xla_cache"))

IMAGE_SIZE = 5000
TILE_SIZE = 512
TILE_STEP = 256
HBM_PEAK_GBPS = 819.0  # v5e
BF16_PEAK_TFLOPS = 197.0  # v5e
INT8_PEAK_TOPS = 394.0  # v5e (2x the bf16 MAC rate)

# (mode, batch, precision) — the shipped bench.py optima
CASES = [
    ("distributed", 64, "bf16"),
    ("full", 16, "bf16"),
    ("distributed", 64, "int8"),
    ("full", 32, "int8"),
]


def _group_fns(forward, mode):
    if mode == "distributed":
        return tiles_mod._sparse_d4_fns(forward)
    return (tiles_mod._full_d4_fn(forward),)


def _batch_programs(h, w, batch_size, mode):
    """Exact (batch_size, executions) pairs per tile group, from the same
    plan the runner uses."""
    partition = "parity2x2" if mode == "distributed" else "none"
    _, group_coords, group_rem, _, _ = tiles_mod._get_tiled_plan(
        h, w, TILE_SIZE, TILE_STEP, "pyramid", batch_size, partition
    )
    per_group = []
    for coords, rem in zip(group_coords, group_rem):
        runs = []
        if coords.shape[0] > 0:
            runs.append((int(coords.shape[1]), int(coords.shape[0])))
        if rem.shape[0] > 0:
            runs.append((int(rem.shape[0]), 1))
        per_group.append(runs)
    return per_group


def main():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    x_init = jnp.zeros((1, TILE_SIZE, TILE_SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)
    variables = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.bfloat16) if leaf.dtype == jnp.float32 else leaf,
        variables,
    )

    def forward(tiles):
        return model.apply(variables, tiles.astype(jnp.bfloat16))

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
    perturb = jax.jit(lambda img, out: img * (1.0 + 1e-6 * out[0, 0, 0]))

    # int8 twin: same PTQ path bench.py measures (calibrated on bench tiles)
    from pytorch_toolbelt_tpu.inference import tiles as _t
    from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference

    slicer = _t.ImageSlicer((IMAGE_SIZE, IMAGE_SIZE), TILE_SIZE, TILE_STEP)
    cal = jnp.stack([jnp.asarray(t) for t in slicer.split(np.asarray(image))[:4]])
    q_forward = quantize_unet_inference(model, variables, cal)
    forwards = {"bf16": forward, "int8": q_forward}

    rows = []
    for mode, batch, precision in CASES:
        fns = _group_fns(forwards[precision], mode)
        plans = _batch_programs(IMAGE_SIZE, IMAGE_SIZE, batch, mode)

        total_bytes = 0.0
        total_flops = 0.0
        n_tiles_total = 0
        analyzed = {}
        for fn, runs in zip(fns, plans):
            for b, execs in runs:
                key = (id(fn), b)
                if key not in analyzed:
                    ca = (
                        jax.jit(fn)
                        .lower(jax.ShapeDtypeStruct((b, TILE_SIZE, TILE_SIZE, 3), jnp.float32))
                        .compile()
                        .cost_analysis()
                    )
                    analyzed[key] = (ca["bytes accessed"], ca["flops"])
                by, fl = analyzed[key]
                total_bytes += by * execs
                total_flops += fl * execs
                n_tiles_total += b * execs

        # canvas merge: per tile, read + write a [th, tw, K] region of the
        # fp32 accumulator (the tile's prediction is already counted as the
        # group program's output); final normalize reads + writes the padded
        # canvas once.
        K = 1
        merge_bytes = n_tiles_total * 2 * TILE_SIZE * TILE_SIZE * K * 4
        pad = tiles_mod.ImageSlicer((IMAGE_SIZE, IMAGE_SIZE), TILE_SIZE, TILE_STEP)
        tgt_h, tgt_w = pad.target_shape
        merge_bytes += 3 * tgt_h * tgt_w * K * 4  # normalize: read canvas + inv_norm, write out
        total_bytes += merge_bytes

        def run(img, fwd=forwards[precision], mode=mode, batch=batch):
            return tiled_apply_d4_tta(
                fwd,
                img,
                tile_size=TILE_SIZE,
                tile_step=TILE_STEP,
                weight="pyramid",
                batch_size=batch,
                mode=mode,
            )

        out = run(image)
        image = perturb(image, out)
        float(out[0, 0, 0])
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(image)
            image = perturb(image, out)
        float(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters

        gbps = total_bytes / 1e9 / dt
        tflops = total_flops / 1e12 / dt
        rows.append(
            {
                "mode": mode,
                "precision": precision,
                "batch": batch,
                "wall_s": round(dt, 3),
                "mps": round(IMAGE_SIZE * IMAGE_SIZE / 1e6 / dt, 2),
                "modeled_gb": round(total_bytes / 1e9, 1),
                "merge_gb": round(merge_bytes / 1e9, 1),
                "modeled_tflop": round(total_flops / 1e12, 2),
                "achieved_gbps": round(gbps, 1),
                "pct_hbm_peak": round(100 * gbps / HBM_PEAK_GBPS, 1),
                "achieved_tflops": round(tflops, 2),
                "pct_mxu_peak": round(
                    100
                    * tflops
                    / (BF16_PEAK_TFLOPS if precision == "bf16" else INT8_PEAK_TOPS),
                    1,
                ),
            }
        )
        print(json.dumps(rows[-1]))

    print(json.dumps({"probe": "bandwidth_accounting", "rows": rows}))


if __name__ == "__main__":
    main()
