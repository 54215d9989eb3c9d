"""Whole-pipeline HBM-traffic accounting for the bench d4 programs.

RESULTS.md's round-4 batch sweep asserted the distributed-d4 pipeline sits
at a "bandwidth-bound plateau (est. ~435 GB/s)" — an estimate, not a
measurement.  This probe replaces the estimate with XLA's own cost model of
the ONE fused program that bench.py executes per image: lower + compile the
whole pad->slice->forward(x views)->merge pipeline and read
``cost_analysis()['bytes accessed']`` (the compiler's HBM-traffic model at
fusion granularity: fused intermediates are not counted, so this is the
traffic the scheduler actually plans against HBM) and ``['flops']``.
Achieved GB/s = modeled bytes / measured wall time (chained-iteration,
d2h-synced, same methodology as bench.py).

Reads out, per mode: modeled GB moved, achieved GB/s, % of the v5e's
819 GB/s HBM peak, achieved TFLOP/s, % of the 197 TFLOP/s bf16 peak —
i.e. WHERE each pipeline sits on the roofline, from the compiler's model
rather than hand arithmetic.

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
from pytorch_toolbelt_tpu.utils import enable_compile_cache
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

enable_compile_cache(str(Path(__file__).parent.parent / ".xla_cache"))

IMAGE_SIZE = 5000
TILE_SIZE = 512
TILE_STEP = 256
HBM_PEAK_GBPS = 819.0  # v5e
BF16_PEAK_TFLOPS = 197.0  # v5e

# (mode, batch) — the shipped bench.py optima
CASES = [("distributed", 64), ("full", 16)]


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

    rows = []
    for mode, batch in CASES:
        def run(img, mode=mode, batch=batch):
            return tiled_apply_d4_tta(
                forward,
                img,
                tile_size=TILE_SIZE,
                tile_step=TILE_STEP,
                weight="pyramid",
                batch_size=batch,
                mode=mode,
            )

        # Cost model of the WHOLE pipeline as one program.  This is a
        # separate outer-jit copy of the same computation bench.py runs via
        # the internal cached runner; XLA's analysis of it covers the
        # pad/slice/views/model/merge/normalize chain end to end.
        compiled = (
            jax.jit(run)
            .lower(jax.ShapeDtypeStruct((IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32))
            .compile()
        )
        ca = compiled.cost_analysis()
        modeled_gb = ca["bytes accessed"] / 1e9
        modeled_tflop = ca["flops"] / 1e12

        # chained-iteration timing, d2h-synced (bench.py methodology)
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

        gbps = modeled_gb / dt
        tflops = modeled_tflop / dt
        rows.append(
            {
                "mode": mode,
                "batch": batch,
                "wall_s": round(dt, 3),
                "mps": round(IMAGE_SIZE * IMAGE_SIZE / 1e6 / dt, 2),
                "modeled_gb": round(modeled_gb, 1),
                "modeled_tflop": round(modeled_tflop, 2),
                "achieved_gbps": round(gbps, 1),
                "pct_hbm_peak": round(100 * gbps / HBM_PEAK_GBPS, 1),
                "achieved_tflops": round(tflops, 2),
                "pct_bf16_peak": round(100 * tflops / BF16_PEAK_TFLOPS, 1),
            }
        )
        print(json.dumps(rows[-1]))

    print(json.dumps({"probe": "bandwidth_accounting", "rows": rows}))


if __name__ == "__main__":
    main()
