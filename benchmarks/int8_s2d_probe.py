"""Equivalent-work probe for an int8 space-to-depth pipeline (mode-matrix
cell "int8+s2d", VERDICT r3 #2).

The bf16 study (RESULTS.md round-3 narrow-conv study) showed s2d wins only
when the model batch is small — at the tiled pipelines' effective batches
(>=50) the narrow convs already run near pipeline speed and s2d's 4x FLOPs
buy back their own cost.  Before building a full quantized-s2d network,
this probe measures the SAME tradeoff in the int8 domain: a 32-channel
int8 3x3 conv at 512^2 (the pipeline's layout) vs the s2d-equivalent dense
128-channel int8 conv at 256^2 (4x FLOPs, same bytes, full MXU lanes), both
SCAN-chained inside one jit so relay dispatch and dedup cannot skew the
numbers.

If the s2d form is not decisively faster per unit of original work at the
pipeline batch, int8+s2d is a measured dead end (the int8 pipeline already
runs at 2x the bf16 MAC rate on the SAME layout).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SCAN_LEN = 16


def chain_conv(x, w, iters=SCAN_LEN):
    """Scan-chain an int8 conv: output requantized (shift) back to int8."""

    def body(carry, _):
        acc = lax.conv_general_dilated(
            carry, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        acc = lax.shift_right_arithmetic(acc + 16, 5)
        return jnp.clip(acc, -127, 127).astype(jnp.int8), acc[0, 0, 0, 0]

    out, probes = lax.scan(body, x, None, length=iters)
    return out, probes.sum()


def bench(fn, *args, iters=3):
    f = jax.jit(fn)
    out, probe = f(*args)
    float(probe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, probe = f(*args)
        float(probe)
    return (time.perf_counter() - t0) / iters / SCAN_LEN


def main():
    rng = np.random.RandomState(0)
    B = 32
    # case A: pipeline layout — 32-ch conv at 512^2
    xa = jnp.asarray(rng.randint(-127, 127, (B, 512, 512, 32)).astype(np.int8))
    wa = jnp.asarray(rng.randint(-127, 127, (3, 3, 32, 32)).astype(np.int8))
    # case B: s2d-equivalent — 128-ch conv at 256^2 (4x FLOPs, same bytes)
    xb = jnp.asarray(rng.randint(-127, 127, (B, 256, 256, 128)).astype(np.int8))
    wb = jnp.asarray(rng.randint(-127, 127, (3, 3, 128, 128)).astype(np.int8))

    ta = bench(chain_conv, xa, wa)
    tb = bench(chain_conv, xb, wb)
    flops_a = 2 * B * 512 * 512 * 9 * 32 * 32
    flops_b = 2 * B * 256 * 256 * 9 * 128 * 128
    print(f"A 32ch@512^2 int8 : {ta*1e3:7.2f} ms/conv  {flops_a/ta/1e12:6.1f} TOP/s")
    print(f"B 128ch@256^2 int8: {tb*1e3:7.2f} ms/conv  {flops_b/tb/1e12:6.1f} TOP/s")
    print(f"s2d-equivalent speedup per unit of original work: {ta/tb:.2f}x "
          f"(>1 means an int8 s2d pipeline could win)")


if __name__ == "__main__":
    main()
