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
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, value, grad = step(x, target)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    gb = (logits.size + grad.size) * 4 / 1e9  # fp32 read + grad write
    return {"loss": name, "ms": round(dt * 1e3, 2), "GB/s": round(gb / dt, 1), "value": float(value)}


def main():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    target_int = jnp.asarray(rng.randint(0, C, size=(B, H, W)))
    target_bin = jnp.asarray((rng.rand(B, H, W, C) > 0.5).astype(np.float32))

    results = [
        bench_loss("focal_binary", L.BinaryFocalLoss(), logits, target_bin),
        bench_loss("focal_softmax", L.CrossEntropyFocalLoss(), logits, target_int),
        bench_loss("dice_multiclass", L.DiceLoss(mode="multiclass"), logits, target_int),
        bench_loss("jaccard_multilabel", L.JaccardLoss(mode="multilabel"), logits, target_bin),
        bench_loss("lovasz_softmax", L.LovaszLoss(), jax.nn.softmax(logits, -1), target_int),
        bench_loss("bitempered", L.BiTemperedLogisticLoss(t1=0.8, t2=1.4), logits, target_int),
    ]
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
