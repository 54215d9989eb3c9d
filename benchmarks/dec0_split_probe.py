"""dec0 concat-materialization probe (round-5 stage-decomposition follow-up).

The per-stage table (RESULTS.md) puts HALF the pipeline's wall time in
dec0 (129 of 260 ms at batch 128) at 1.86x its roofline floor, under both
rooflines.  dec0 = bilinear-upsample(dec1 out, 64ch -> 512^2) ++ skip
(32ch) -> conv3x3(96 -> 32) -> conv3x3(32 -> 32).  Hypothesis: the 96-ch
concat is materialized to HBM (6.3 GB write + 6.3 GB read per step at
batch 128 bf16) instead of fusing into the conv.

By linearity conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) +
conv(b, W[:, :, Ca:]) EXACTLY — the split form never builds the 96-ch
tensor.  This probe times both forms scan-chained at the pipeline's
shapes and reports whether the split is worth porting into UNetDecoder.

Run on the real chip: python benchmarks/dec0_split_probe.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.utils import enable_compile_cache
from pytorch_toolbelt_tpu.zoo.fast_unet import _upsample_bilinear_nhwc

enable_compile_cache(str(Path(__file__).parent.parent / ".xla_cache"))

B, S, C_UP, C_SKIP, C_OUT = 64, 512, 64, 32, 32  # batch 128 OOMs in isolation:
# the concat variant allocates the [B,512,512,96] tensor TWICE (concatenate
# fusion + a layout copy — the OOM dump is direct evidence of the
# materialization); half batch keeps both variants resident
SCAN = 3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def main():
    rng = np.random.RandomState(0)
    prev = jnp.asarray(rng.randn(B, S // 2, S // 2, C_UP).astype(np.float32)).astype(jnp.bfloat16)
    skip = jnp.asarray(rng.randn(B, S, S, C_SKIP).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(
        (rng.randn(3, 3, C_UP + C_SKIP, C_OUT) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    w2 = jnp.asarray((rng.randn(3, 3, C_OUT, C_OUT) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    w1_up, w1_skip = w1[:, :, :C_UP], w1[:, :, C_UP:]

    def dec0_concat(prev, skip):
        up = _upsample_bilinear_nhwc(prev, S, S)
        x = jnp.concatenate([up, skip], axis=-1)
        x = jnp.maximum(conv(x, w1), 0)
        return jnp.maximum(conv(x, w2), 0)

    def dec0_split(prev, skip):
        up = _upsample_bilinear_nhwc(prev, S, S)
        x = jnp.maximum(conv(up, w1_up) + conv(skip, w1_skip), 0)
        return jnp.maximum(conv(x, w2), 0)

    # exactness first
    a = np.asarray(dec0_concat(prev[:2], skip[:2]).astype(jnp.float32))
    b = np.asarray(dec0_split(prev[:2], skip[:2]).astype(jnp.float32))
    rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
    print(f"split-vs-concat max rel diff (bf16): {rel:.2e}")

    def bench(fn, label):
        @jax.jit
        def run(prev, skip):
            def body(carry, _):
                out = fn(carry, skip)
                nxt = carry * (1.0 + 1e-6 * out[0, 0, 0, 0].astype(jnp.bfloat16))
                return nxt, out.mean(dtype=jnp.float32)

            p, vs = jax.lax.scan(body, prev, None, length=SCAN)
            return p, vs.sum()

        _, v = run(prev, skip)
        float(v)
        t0 = time.perf_counter()
        _, v = run(prev, skip)
        float(v)
        dt = (time.perf_counter() - t0) / SCAN
        print(json.dumps({"variant": label, "ms": round(dt * 1e3, 1)}), flush=True)
        return dt

    dt_c = bench(dec0_concat, "concat")
    dt_s = bench(dec0_split, "split")
    print(json.dumps({"probe": "dec0_split", "speedup": round(dt_c / dt_s, 3)}))


if __name__ == "__main__":
    main()
