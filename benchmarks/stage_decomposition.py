"""Per-stage roofline decomposition of the bench UNet-32 forward.

The round-5 bandwidth accounting (``bandwidth_accounting.py``) placed the
distributed-d4 pipeline at 58% of HBM peak and 26% of MXU peak — bound by
NEITHER roofline at the program level.  This probe asks WHERE the other
42% of the bandwidth headroom goes, by timing in-context prefixes of the
exact model the pipeline runs.

Method.  Rebuild the trained UNet-32 forward from its BN-folded weights as
an explicit list of stages (enc0..enc3, dec2..dec0, head — the same
arithmetic ``model.apply`` runs, validated to bf16 tolerance by
tests/test_fast_unet.py for the same folding helpers), then for each
prefix length k jit the first k stages and time it scan-chained inside ONE
program at the pipeline's effective model batch (64 tiles x 2 d4 views =
128).  Differencing adjacent prefixes cancels the per-execution dispatch
cost exactly (both prefixes carry one dispatch) and yields per-stage wall
time measured IN CONTEXT — the same fusion/layout freedom XLA has inside
the real pipeline, avoiding the isolated-conv layout artifact the round-3
narrow-conv study documented.  Per-stage bytes/FLOPs come from XLA's own
cost model (differenced the same way), so each stage lands on the roofline
chart: achieved GB/s vs the 819 GB/s HBM peak and achieved TFLOP/s vs the
197 TFLOP/s bf16 peak.

The structural-floor readout: sum_k max(bytes_k / HBM_peak,
flops_k / MXU_peak) is the classic roofline floor for the stage sequence;
the measured-vs-floor ratio per stage names the stages whose narrow convs
run below BOTH rooflines (the lane-occupancy wall measured from three
directions in round 3: XLA isolated, XLA in-chain, Pallas implicit-GEMM).

Run on the real chip: ``python benchmarks/stage_decomposition.py``.
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
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel
from pytorch_toolbelt_tpu.zoo.fast_unet import (
    _conv_nhwc,
    _fold_block,
    _upsample_bilinear_nhwc,
)

enable_compile_cache(str(Path(__file__).parent.parent / ".xla_cache"))

TILE = 512
BATCH = 128  # pipeline effective model batch: 64 tiles x 2 d4 views
HBM_PEAK = 819e9
BF16_PEAK = 197e12
SCAN_LEN = 3  # dispatch overhead cancels when differencing adjacent prefixes


def build_stages():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, TILE, TILE, 3), jnp.float32))
    params, stats = variables["params"], variables["batch_stats"]
    n = model.num_layers
    enc = [
        _fold_block(params["UnetEncoder_0"][f"UnetBlock_{i}"], stats["UnetEncoder_0"][f"UnetBlock_{i}"])
        for i in range(n)
    ]
    dec = [
        _fold_block(params["UNetDecoder_0"][f"UnetBlock_{i}"], stats["UNetDecoder_0"][f"UnetBlock_{i}"])
        for i in range(n - 1)
    ]
    head_w = params["ResizeHead_0"]["Conv_0"]["kernel"].astype(jnp.bfloat16)
    head_b = params["ResizeHead_0"]["Conv_0"]["bias"].astype(jnp.float32)

    # state = (x, skips)
    def enc_stage(layer):
        def fn(state):
            x, skips = state
            if layer > 0:
                x = jnp.maximum(
                    jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2]),
                    jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2]),
                )
            for (w, s, b) in enc[layer]:
                x = _conv_nhwc(x, w, s, b)
            return x, skips + [x]

        return fn

    def dec_stage(i):  # i = skip level (n-2 .. 0); flax block index n-2-i
        def fn(state):
            x, skips = state
            skip = skips[i]
            x = _upsample_bilinear_nhwc(x, skip.shape[1], skip.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
            for (w, s, b) in dec[n - 2 - i]:
                x = _conv_nhwc(x, w, s, b)
            return x, skips

        return fn

    def head_stage(state):
        x, skips = state
        y = jax.lax.conv_general_dilated(
            x, head_w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y + head_b, skips

    stages = [(f"enc{i} {TILE >> i}^2 x{32 << i}", enc_stage(i)) for i in range(n)]
    stages += [
        (f"dec{i} {TILE >> i}^2 x{32 << i}", dec_stage(i)) for i in range(n - 2, -1, -1)
    ]
    stages += [(f"head {TILE}^2 x1", head_stage)]
    return stages


def prefix_fn(stages, k):
    def fn(x):
        state = (x.astype(jnp.bfloat16), [])
        for _, stage in stages[:k]:
            state = stage(state)
        return state[0]

    return fn


def chained(fn, length):
    @jax.jit
    def run(x0):
        def step(x, _):
            out = fn(x)
            # chain: next input depends on the previous output so the relay
            # cannot dedup iterations; one scalar multiply, negligible
            x = x * (1.0 + 1e-6 * out.ravel()[0].astype(jnp.float32))
            return x, ()

        x, _ = jax.lax.scan(step, x0, None, length=length)
        return x

    return run


def timed(run, x0):
    out = run(x0)
    float(out[0, 0, 0, 0])  # d2h sync (relay-safe barrier)
    t0 = time.perf_counter()
    out = run(x0)
    float(out[0, 0, 0, 0])
    return time.perf_counter() - t0


def main():
    stages = build_stages()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(BATCH, TILE, TILE, 3).astype(np.float32))

    # empty-prefix baseline: differencing adjacent prefixes cancels the
    # per-execution dispatch for stages 2+ automatically; stage 1 needs the
    # dispatch measured explicitly (a k=0 identity chain)
    t_base = timed(chained(lambda x: x.astype(jnp.bfloat16), SCAN_LEN), x0) / SCAN_LEN

    rows = []
    prev_t, prev_by, prev_fl = t_base, 0.0, 0.0
    for k in range(1, len(stages) + 1):
        fn = prefix_fn(stages, k)
        ca = (
            jax.jit(fn)
            .lower(jax.ShapeDtypeStruct(x0.shape, x0.dtype))
            .compile()
            .cost_analysis()
        )
        t = timed(chained(fn, SCAN_LEN), x0) / SCAN_LEN
        dt, dby, dfl = t - prev_t, ca["bytes accessed"] - prev_by, ca["flops"] - prev_fl
        prev_t, prev_by, prev_fl = t, ca["bytes accessed"], ca["flops"]
        floor = max(dby / HBM_PEAK, dfl / BF16_PEAK)
        rows.append(
            {
                "stage": stages[k - 1][0],
                "ms": round(dt * 1e3, 1),
                "gb": round(dby / 1e9, 2),
                "tflop": round(dfl / 1e12, 3),
                "gbps": round(dby / dt / 1e9, 1),
                "pct_hbm": round(100 * dby / dt / HBM_PEAK, 1),
                "tflops": round(dfl / dt / 1e12, 1),
                "pct_mxu": round(100 * dfl / dt / BF16_PEAK, 1),
                "roofline_floor_ms": round(floor * 1e3, 1),
                "x_over_floor": round(dt / floor, 2) if floor > 0 else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    total_ms = sum(r["ms"] for r in rows)
    floor_ms = sum(r["roofline_floor_ms"] for r in rows)
    summary = {
        "probe": "stage_decomposition",
        "batch": BATCH,
        "total_ms": round(total_ms, 1),
        "roofline_floor_ms": round(floor_ms, 1),
        "x_over_floor": round(total_ms / floor_ms, 2),
        "rows": rows,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
