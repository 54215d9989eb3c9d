"""Benchmark driver entry point.

Runs the BASELINE.json north-star config on the real TPU chip(s):
tiled 5000x5000 UNet (32ch, growth 2) segmentation inference with d4 TTA,
pyramid-weight overlap-add merging — the whole pipeline as fused XLA
programs via pytorch_toolbelt_tpu.inference.tiled_apply_d4_tta.

The d4 TTA uses mode='distributed' (inference/tiles.py): at the config's
4-fold tile overlap, each of the 4 grid-parity tile classes computes a
disjoint PAIR of d4 views, so every interior pixel still averages all 8 d4
views — blended by the pyramid window — at 1/4 the model compute of running
all 8 views on all tiles.  Full-d4 numbers are reported alongside in
benchmarks/RESULTS.md (4.4 MP/s single chip; distributed: 17+ MP/s bf16,
22+ MP/s int8).

Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": ...}

vs_baseline anchoring (the torch reference publishes no numbers;
BASELINE.json:13 "published": {}): benchmarks/anchor_baseline.py measures
the actual torch reference pipeline (ImageSlicer + python tile loop +
TileMerger + d4_image2mask) on this host's CPU and documents the scaling
argument to an H100 estimate; the resulting anchor is ~8 MP/s for a
well-tuned H100 AMP run of the same full-d4 pipeline (see
benchmarks/RESULTS.md for the measured CPU number and the derivation).

With >1 visible device the same config also runs tile-sharded over the mesh
(distributed.tiled_apply_sharded with d4_tta='distributed' — BASELINE
config 5's code path, running the SAME parity-class d4 algorithm as the
single-chip headline) and the JSON line carries the multi-chip number in
"multichip_mps".
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.inference import tiled_apply_d4_tta
from pytorch_toolbelt_tpu.utils import enable_compile_cache
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

# The bench is remote-compile-dominated (the four pipeline variants cost
# ~16 min of compiles cold vs ~1 min of device time); the persistent cache
# turns repeat runs of the unchanged programs into sub-second deserializes.
enable_compile_cache(str(Path(__file__).parent / ".xla_cache"))

ANCHOR_H100_PYTORCH_MPS = 8.0  # see module docstring / benchmarks/RESULTS.md

IMAGE_SIZE = 5000
TILE_SIZE = 512
TILE_STEP = 256
BATCH = 64  # round-4 sweep (balanced no-padding batches): 17.3 MP/s at 64 vs 14.1 at 32
INT8_BATCH = 64  # int8 sweep peak (22.9 MP/s; 100/128 regress to 21.8)
FULL_D4_BATCH = 16  # 24+ OOMs in full mode (184-tile-batch decoder concat)


def main():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    x_init = jnp.zeros((1, TILE_SIZE, TILE_SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)
    # bf16 params + activations: MXU-native inference precision; the
    # overlap-add merge still accumulates in fp32 (tiled_apply default).
    variables = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.bfloat16) if leaf.dtype == jnp.float32 else leaf, variables
    )

    def forward(tiles):
        return model.apply(variables, tiles.astype(jnp.bfloat16))

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
    megapixels = (IMAGE_SIZE * IMAGE_SIZE) / 1e6

    def run(img):
        return tiled_apply_d4_tta(
            forward,
            img,
            tile_size=TILE_SIZE,
            tile_step=TILE_STEP,
            weight="pyramid",
            batch_size=BATCH,
            mode="distributed",
        )

    # Iterations are CHAINED (each input depends on the previous output) so
    # every timed step is genuinely fresh device work: the TPU relay in this
    # environment deduplicates identical (executable, args) executions, which
    # would otherwise make repeat-same-input timing loops report cached
    # results.  The perturbation is a single fused scalar multiply (~0.1 ms),
    # negligible against the ~1 s pipeline.
    perturb = jax.jit(lambda img, out: img * (1.0 + 1e-6 * out[0, 0, 0]))

    # warmup / compile (one chained step so the perturb program is also warm).
    # Sync via a d2h scalar read: on the axon relay block_until_ready() can
    # return before execution finishes (and compiles are deferred to the
    # first sync), so a device-to-host read is the only reliable barrier.
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
    mps = megapixels / dt

    # Same metric, mode='full': all 8 d4 views on every tile — the exact
    # algorithm of the reference's d4_image2mask-in-a-tile-loop.  Reported
    # alongside so the JSON line never conflates the two algorithms.
    def run_full(img):
        return tiled_apply_d4_tta(
            forward,
            img,
            tile_size=TILE_SIZE,
            tile_step=TILE_STEP,
            weight="pyramid",
            batch_size=FULL_D4_BATCH,
            mode="full",
        )

    out = run_full(image)
    image = perturb(image, out)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_full(image)
        image = perturb(image, out)
    float(out[0, 0, 0])
    full_dt = (time.perf_counter() - t0) / iters
    full_mps = megapixels / full_dt

    result = {
        "metric": "tiled_5000x5000_unet32_d4tta_pyramid_merge",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / ANCHOR_H100_PYTORCH_MPS, 3),
        "mode": "distributed_d4",
        "full_d4_mps": round(full_mps, 2),
        "full_d4_vs_baseline": round(full_mps / ANCHOR_H100_PYTORCH_MPS, 3),
        "baseline_kind": "estimated_h100_from_measured_cpu_run",
    }

    # MFU accounting (VERDICT r3 #3): model FLOPs from XLA's own cost
    # analysis of one tile-view forward, times view count, over wall time.
    # v5e bf16 peak = 197 TFLOP/s.  Tracks whether MP/s gains come from
    # doing less work or doing it faster.
    try:
        from pytorch_toolbelt_tpu.inference import ImageSlicer

        tile_flops = (
            jax.jit(forward)
            .lower(jax.ShapeDtypeStruct((1, TILE_SIZE, TILE_SIZE, 3), jnp.float32))
            .compile()
            .cost_analysis()["flops"]
        )
        n_tiles = len(ImageSlicer((IMAGE_SIZE, IMAGE_SIZE), TILE_SIZE, TILE_STEP).crops)
        PEAK_BF16 = 197e12
        dist_tflops = n_tiles * 2 * tile_flops / dt / 1e12  # 2 views/tile
        full_tflops = n_tiles * 8 * tile_flops / full_dt / 1e12  # 8 views/tile
        result["achieved_tflops"] = round(dist_tflops, 2)
        result["pct_peak_bf16"] = round(100 * dist_tflops * 1e12 / PEAK_BF16, 1)
        result["full_d4_achieved_tflops"] = round(full_tflops, 2)
        result["full_d4_pct_peak_bf16"] = round(100 * full_tflops * 1e12 / PEAK_BF16, 1)
    except Exception as exc:  # pragma: no cover - cost analysis is best-effort
        result["mfu_error"] = f"{type(exc).__name__}: {exc}"[:120]

    # int8 PTQ variant of the same pipeline (zoo/quantized_unet.py): fully
    # integer network, calibrated on tiles of the bench image itself.
    # Reported as SEPARATE fields — `value` stays the bf16 number so the
    # metric is never silently re-based onto a lower-precision algorithm.
    try:
        from pytorch_toolbelt_tpu.inference import ImageSlicer
        from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference

        slicer = ImageSlicer((IMAGE_SIZE, IMAGE_SIZE), TILE_SIZE, TILE_STEP)
        cal = jnp.stack([jnp.asarray(t) for t in slicer.split(np.asarray(image))[:4]])
        q_forward = quantize_unet_inference(model, variables, cal)

        ref_out = forward(cal).astype(jnp.float32)
        q_out = q_forward(cal)
        rel_rms = float(
            jnp.sqrt(jnp.mean((q_out - ref_out) ** 2)) / jnp.sqrt(jnp.mean(ref_out**2))
        )

        def run_q(img):
            return tiled_apply_d4_tta(
                q_forward, img, tile_size=TILE_SIZE, tile_step=TILE_STEP,
                weight="pyramid", batch_size=INT8_BATCH, mode="distributed",
            )

        out = run_q(image)
        image = perturb(image, out)
        float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run_q(image)
            image = perturb(image, out)
        float(out[0, 0, 0])
        q_dt = (time.perf_counter() - t0) / iters
        result["int8_mps"] = round(megapixels / q_dt, 2)
        result["int8_vs_baseline"] = round(megapixels / q_dt / ANCHOR_H100_PYTORCH_MPS, 3)
        result["int8_forward_rel_rms"] = round(rel_rms, 4)

        # s2d variant: stride-1 level as dense 128-ch convs — int8 narrow
        # convs are 3.3x lane-starved vs their s2d form (int8_s2d_probe.py)
        from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference_s2d

        qs_forward = quantize_unet_inference_s2d(model, variables, cal)
        qs_out = qs_forward(cal)
        result["int8_s2d_forward_rel_rms"] = round(
            float(jnp.sqrt(jnp.mean((qs_out - ref_out) ** 2)) / jnp.sqrt(jnp.mean(ref_out**2))), 4
        )

        def run_qs(img):
            return tiled_apply_d4_tta(
                qs_forward, img, tile_size=TILE_SIZE, tile_step=TILE_STEP,
                weight="pyramid", batch_size=INT8_BATCH, mode="distributed",
            )

        out = run_qs(image)
        image = perturb(image, out)
        float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run_qs(image)
            image = perturb(image, out)
        float(out[0, 0, 0])
        qs_dt = (time.perf_counter() - t0) / iters
        result["int8_s2d_mps"] = round(megapixels / qs_dt, 2)
        result["int8_s2d_vs_baseline"] = round(
            megapixels / qs_dt / ANCHOR_H100_PYTORCH_MPS, 3
        )
    except Exception as exc:  # pragma: no cover - bench must never die on the extra path
        result["int8_error"] = f"{type(exc).__name__}: {exc}"[:200]

    # Loss-suite fields (VERDICT r4 #8): BASELINE's metric string names
    # "loss fwd+bwd GB/s" alongside MP/s — capture the two flagship fused
    # custom-VJP losses in the driver JSON, not just RESULTS.md.  GB/s is
    # the ANALYTIC minimum HBM traffic of a value_and_grad step (read
    # logits x2 + targets x2 + write grad — benchmarks/loss_roofline.py)
    # over the measured scan-chained wall time, i.e. effective bandwidth;
    # x_floor = wall time over the 819 GB/s byte-floor time.
    try:
        from pytorch_toolbelt_tpu import losses as L

        LB, LH, LW, LC = 8, 1024, 1024, 19
        lrng = np.random.RandomState(1)
        l_logits = jnp.asarray(lrng.randn(LB, LH, LW, LC).astype(np.float32))
        l_tint = jnp.asarray(lrng.randint(0, LC, size=(LB, LH, LW)).astype(np.int32))
        l_tbin = jnp.asarray((lrng.rand(LB, LH, LW, LC) > 0.5).astype(np.float32))
        n_logits = LB * LH * LW * LC * 4
        n_int = LB * LH * LW * 4
        SCAN_LEN = 16

        def loss_time(loss_fn, x, t):
            @jax.jit
            def run_l(x, t):
                def body(carry, _):
                    value, grad = jax.value_and_grad(lambda x_: loss_fn(x_, t))(carry)
                    return carry + 1e-4 * grad, value

                x, values = jax.lax.scan(body, x, None, length=SCAN_LEN)
                return x, values.sum()

            _, v = run_l(x, t)
            float(v)
            t0 = time.perf_counter()
            _, v = run_l(x, t)
            float(v)
            return (time.perf_counter() - t0) / SCAN_LEN

        focal = L.BinaryFocalLoss()
        dice = L.DiceLoss(mode="multiclass")
        floor_bin = 5 * n_logits
        floor_int = 3 * n_logits + 2 * n_int
        dt_focal = loss_time(lambda x, t: focal(x, t), l_logits, l_tbin)
        dt_dice = loss_time(lambda x, t: dice(x, t), l_logits, l_tint)
        result["loss_focal_gbps"] = round(floor_bin / dt_focal / 1e9, 1)
        result["loss_focal_x_floor"] = round(dt_focal * 819e9 / floor_bin, 2)
        result["loss_dice_gbps"] = round(floor_int / dt_dice / 1e9, 1)
        result["loss_dice_x_floor"] = round(dt_dice * 819e9 / floor_int, 2)
    except Exception as exc:  # pragma: no cover - bench must never die here
        result["loss_error"] = f"{type(exc).__name__}: {exc}"[:200]

    devices = jax.devices()
    if len(devices) > 1:
        # BASELINE config 5 code path: the SAME distributed-d4 algorithm the
        # headline number runs, composed with the strip-sharded canvas — each
        # device runs the parity-class view pairs of the tiles intersecting
        # its strip (distributed/tiled.py d4_tta='distributed'; bit-matches
        # the single-chip mode='distributed' output, tests/test_distributed.py).
        from jax.sharding import Mesh

        from pytorch_toolbelt_tpu.distributed import tiled_apply_sharded

        mesh = Mesh(np.asarray(devices), ("data",))

        def run_sharded(img):
            return tiled_apply_sharded(
                forward, img, mesh,
                tile_size=TILE_SIZE, tile_step=TILE_STEP,
                weight="pyramid", batch_size=BATCH,
                d4_tta="distributed",
            )

        out = run_sharded(image)
        image = perturb(image, out)
        float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run_sharded(image)
            image = perturb(image, out)
        float(out[0, 0, 0])
        sharded_dt = (time.perf_counter() - t0) / iters
        result["multichip_mps"] = round(megapixels / sharded_dt, 2)
        result["n_devices"] = len(devices)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
