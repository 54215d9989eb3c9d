"""Loss-kernel throughput microbench (BASELINE.json config 4: focal / dice /
jaccard / lovasz fwd+bwd on batch-8 19-class 1024x1024 logits).

Reports effective GB/s: bytes of (logits + grad) moved per second through a
jitted value_and_grad of each loss. Run on the TPU chip:

    python benchmarks/loss_bench.py

Timing methodology: iterations are CHAINED — each step's logits depend on
the previous step's gradient — because the axon TPU relay in this
environment deduplicates identical (executable, args) executions, so a
repeat-same-input loop can report cached (near-zero) times.  Chaining also
defeats async-dispatch pipelining without needing a device sync inside the
timed region.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu import losses as L

B, H, W, C = 8, 1024, 1024, 19


def bench_loss(name, loss_fn, logits, target, iters=5):
    # target passed as an ARGUMENT: closure capture would bake it into the
    # program as a 160MB constant (blows the remote-compile payload limit)
    @jax.jit
    def step(x, t):
        value, grad = jax.value_and_grad(lambda x_: loss_fn(x_, t))(x)
        # chain: the next iteration's input depends on this gradient, so the
        # relay cannot serve a memoized result and the device must finish
        # this step before starting the next
        return x + 1e-4 * grad, value, grad

    x, value, grad = step(logits, target)
    float(value)  # d2h read: reliable sync on the axon relay (flushes compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, value, grad = step(x, target)
    float(value)
    dt = (time.perf_counter() - t0) / iters
    gb = (logits.size + grad.size) * 4 / 1e9  # fp32 read + grad write
    return {"loss": name, "ms": round(dt * 1e3, 2), "GB/s": round(gb / dt, 1), "value": float(value)}


def main():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    target_int = jnp.asarray(rng.randint(0, C, size=(B, H, W)))
    target_bin = jnp.asarray((rng.rand(B, H, W, C) > 0.5).astype(np.float32))

    probas = jax.nn.softmax(logits, -1)
    results = [
        bench_loss("focal_binary", L.BinaryFocalLoss(), logits, target_bin),
        bench_loss("focal_softmax", L.CrossEntropyFocalLoss(), logits, target_int),
        bench_loss("dice_multiclass", L.DiceLoss(mode="multiclass"), logits, target_int),
        bench_loss("jaccard_multilabel", L.JaccardLoss(mode="multilabel"), logits, target_bin),
        bench_loss("lovasz_softmax", L.LovaszLoss(), probas, target_int),
        bench_loss("bitempered", L.BiTemperedLogisticLoss(t1=0.8, t2=1.4), logits, target_int),
    ]
    # Round-3 Lovasz levers (VERDICT round 2 #3): per-image vmapped sorts
    # (8 x [19, 2^20] problems instead of [19, 2^23] — ~24% fewer bitonic
    # passes, and the reference's per_image=True semantics), and 16-bit
    # compact sort keys (25% less forward-sort traffic, fp32 order truncated
    # to 23 bits at this shape).  Each is measured alone and combined.
    from pytorch_toolbelt_tpu.losses import lovasz as lovasz_mod

    results.append(
        bench_loss("lovasz_softmax_per_image", L.LovaszLoss(per_image=True), probas, target_int)
    )
    # Split sort (lax.sort per 2^20 chunk + bitonic cross-merge) on the exact
    # per_image=False path — a measured DEAD END (1660 vs 1519 ms flat), kept
    # opt-in; this row tracks it so a regression in either direction shows.
    lovasz_mod.SPLIT_SORT = True
    try:
        results.append(
            bench_loss("lovasz_softmax_split_sort", L.LovaszLoss(), probas, target_int)
        )
    finally:
        lovasz_mod.SPLIT_SORT = False
    lovasz_mod.COMPACT_SORT_KEYS = True
    try:
        results.append(
            bench_loss("lovasz_softmax_compact_keys", L.LovaszLoss(), probas, target_int)
        )
        results.append(
            bench_loss(
                "lovasz_softmax_compact_per_image",
                L.LovaszLoss(per_image=True), probas, target_int,
            )
        )
    finally:
        lovasz_mod.COMPACT_SORT_KEYS = False
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
