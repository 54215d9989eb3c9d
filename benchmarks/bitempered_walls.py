"""The two bi-tempered walls, measured directly (round 5).

RESULTS.md's bi-tempered account rests on two numbers this probe
reproduces on the chip:

1. the PASS wall — a single fused read-reduce pass over the config-4
   logits tensor costs ~2.08 ms; the loss forward is 8.5 of them
   (max + 5 sequential fixed-point reduce-broadcast cycles + final
   partition + loss terms), because every reduce->broadcast boundary
   ends an XLA fusion;
2. the POW wall — the same ~6-pow-per-element chain run DENSE at full
   lane occupancy (no reduces, no [.., 19] lane padding) at the VPU's
   generic pow rate, plus the rsqrt-decomposed form
   (z^-2.5 = rsqrt(z)^5, valid whenever 1/(1-t2) is half-integer) that
   ``losses.bitempered.exp_t`` ships.

The two walls OVERLAP (measured: strength-reducing pow changes the
end-to-end loss time not at all), which is why the documented
VMEM-kernel bound (~3.5x floor) needs both a classes-on-sublanes
relayout AND in-kernel rsqrt chains.

Run on the real chip: python benchmarks/bitempered_walls.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_toolbelt_tpu.utils import enable_compile_cache

enable_compile_cache(str(Path(__file__).parent.parent / ".xla_cache"))

B, H, W, C = 8, 1024, 1024, 19
N = B * H * W * C
SCAN = 8


def bench(fn, x, label):
    @jax.jit
    def run(x):
        def body(carry, _):
            y = fn(carry)
            return carry * (1.0 + 1e-9 * y.ravel()[0]), y.sum()

        x, vs = lax.scan(body, x, None, length=SCAN)
        return x, vs.sum()

    _, v = run(x)
    float(v)
    t0 = time.perf_counter()
    _, v = run(x)
    float(v)
    dt = (time.perf_counter() - t0) / SCAN
    print(json.dumps({"probe": label, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    flat = jnp.asarray(np.abs(rng.randn(N)).astype(np.float32) + 0.5)

    # pass wall: one fused read->rowreduce pass over the loss tensor
    bench(lambda x: jnp.max(x, axis=-1), logits, "single_pass_rowmax")

    # pow wall: 6 chained generic pows, dense full-lane layout
    def chain6(y):
        for k in range(6):
            y = jnp.power(1.0 + 0.01 * y, -0.4 - 0.01 * k)
        return y

    bench(chain6, flat, "pow6_generic_dense")

    # rsqrt-decomposed half-integer pows (the shipped exp_t fast path)
    def chain6_rsqrt(y):
        for _ in range(6):
            r = lax.rsqrt(1.0 + 0.01 * y)
            y = r * r * r * r * r  # z^-2.5
        return y

    bench(chain6_rsqrt, flat, "pow6_rsqrt5_dense")


if __name__ == "__main__":
    main()
