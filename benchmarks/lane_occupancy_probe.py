"""MXU lane-occupancy probe (VERDICT round-2 #2, structural lever analysis).

UNet-32's 32-output-channel convolutions fill 32/128 MXU result lanes.  The
candidate structural fix folds the 8 d4 views into the channel axis (views
become groups: C=8x32=256 with feature_group_count=8, mathematically the
same block-diagonal computation).  Whether that wins depends entirely on how
XLA lowers grouped convolutions on TPU:

* per-group loop / batch regrouping  -> same lane fill as today (no win)
* dense-with-masked-weights        -> 8x FLOPs at 4x lane fill (2x LOSS)
* true block-diagonal MXU packing  -> up to 4x win on 32-ch layers

This probe times the same total work three ways at the bench's hot shape
(512x512 spatial, batch 8 tiles x 8 views):

  A. views-in-batch   : conv  [64, 512, 512, 32] -> 32           (today)
  B. views-as-groups  : conv  [8, 512, 512, 256] -> 256, fg=8
  C. dense-256 control: conv  [8, 512, 512, 256] -> 256 dense (8x FLOPs,
     full lanes — calibrates what full occupancy buys)

Prints one JSON line per case.  Run: python benchmarks/lane_occupancy_probe.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B_TILES, H, W, C = 2, 256, 256, 32
VIEWS = 8


def conv(x, w, fg=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fg,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def bench(name, fn, x, w):
    # Methodology notes (all empirically forced by the axon relay):
    # * iterations are CHAINED (the relay dedups identical executions) and the
    #   carry stays fp32 — in bf16 the 1e-6 perturbation rounds to exactly 1.0
    #   and the chain repeats values;
    # * the WHOLE conv output feeds the carry — a scalar reduce of a conv is
    #   algebraically simplified by XLA into a cheap contraction;
    # * sync via a d2h scalar read — block_until_ready() can return early on
    #   the relay;
    # * the d2h round trip costs ~10s of ms, so the per-iter cost is the SLOPE
    #   between a short and a long loop, not a single averaged loop.
    x = x.astype(jnp.float32)
    chain = jax.jit(
        lambda x_, w_: x_ + 1e-6 * fn(x_.astype(jnp.bfloat16), w_).astype(jnp.float32)
    )
    x = chain(x, w)
    float(x[0, 0, 0, 0])

    def timed(iters):
        nonlocal x
        t0 = time.perf_counter()
        for _ in range(iters):
            x = chain(x, w)
        float(x[0, 0, 0, 0])
        return time.perf_counter() - t0

    t_short, t_long = timed(5), timed(25)
    dt = (t_long - t_short) / 20
    return {"case": name, "ms": round(dt * 1e3, 2)}


def main():
    rng = np.random.RandomState(0)
    xa = jnp.asarray(rng.randn(B_TILES * VIEWS, H, W, C).astype(np.float32), jnp.bfloat16)
    wa = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05, jnp.bfloat16)
    xb = jnp.asarray(rng.randn(B_TILES, H, W, C * VIEWS).astype(np.float32), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(3, 3, C, C * VIEWS).astype(np.float32) * 0.05, jnp.bfloat16)
    wc = jnp.asarray(rng.randn(3, 3, C * VIEWS, C * VIEWS).astype(np.float32) * 0.05, jnp.bfloat16)

    flop_a = 2 * B_TILES * VIEWS * H * W * 9 * C * C
    results = [
        (bench("A_views_in_batch_32ch", lambda x, w: conv(x, w), xa, wa), flop_a),
        (bench("B_views_as_groups_fg8", lambda x, w: conv(x, w, fg=VIEWS), xb, wb), flop_a),
        (bench("C_dense256_control", lambda x, w: conv(x, w), xb, wc), flop_a * VIEWS),
    ]
    for r, flops in results:
        r["tflops_per_s"] = round(flops / (r["ms"] / 1e3) / 1e12, 1)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
