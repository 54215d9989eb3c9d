"""Config-3 int8 fidelity: close the gap or prove its floor (VERDICT r4 #4).

Round 4 measured 11.5% trained-model rel-RMS / 96.54% hard-prediction
agreement for the int8 SEResNeXt50-FPN twin — an order of magnitude
behind the UNet path.  This probe runs the round-5 levers on the same
trained model class and reports, per lever combination:

  * final-logits rel-RMS vs the f32 model (16 held-out tiles),
  * hard-prediction agreement vs the f32 model,
  * distributed-d4 pipeline MP/s (the throughput cost of the lever).

Levers (zoo/quantized_encdec.py): clipping calibration
(absmax | percentile | mse), sequential bias correction (always on), and
mixed-precision fallback of the worst-K attributed convs.  The per-layer
attribution table (top 12) is printed first — the error map of the
50-conv trunk that round 4 lacked.

Split execution: training + throughput run on the TPU; the attribution
probe and the lever fidelity grid run on the host CPU (identical f32/int
arithmetic, and the axon relay pays minutes per novel compile for the
hundreds of small eager programs attribution replays).  Throughput is
measured with calibration="absmax" + explicit ``fallback_nodes`` — the
clip VALUES don't change the compiled program, only the f32/int8 layer
split does.

Run on the real chip: python benchmarks/int8_fidelity_config3.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.inference import tiled_apply_d4_tta
from pytorch_toolbelt_tpu.utils import enable_compile_cache
from pytorch_toolbelt_tpu.zoo.quantized_encdec import (
    attribute_quantization_error,
    quantize_encoder_decoder_inference,
)

enable_compile_cache(str(Path(__file__).parent.parent / ".xla_cache"))

from quality_study_config3 import SCENE, STEP, TILE, make_scene, train_model  # noqa: E402


def main():
    cpu = jax.devices("cpu")[0]
    print("training SEResNeXt50-FPN (seed 0) on the TPU ...")
    model, variables = train_model()
    variables_host = jax.tree_util.tree_map(np.asarray, variables)

    cal_rng = np.random.RandomState(99)
    cal_np = np.stack([make_scene(cal_rng, TILE)[0] for _ in range(8)])
    held_rng = np.random.RandomState(4242)
    held_np = np.stack([make_scene(held_rng, TILE)[0] for _ in range(16)])

    results = []
    with jax.default_device(cpu):
        variables_cpu = jax.tree_util.tree_map(jnp.asarray, variables_host)
        cal = jnp.asarray(cal_np)
        held = jnp.asarray(held_np)
        f_held = np.asarray(model.apply(variables_cpu, held))
        f_pred = f_held.argmax(-1)

        print("\nper-layer attribution (single-layer int8, f32 surroundings; top 12):")
        rows = attribute_quantization_error(model, variables_cpu, cal)
        for r in rows[:12]:
            print(f"  node {r['node']:3d}  {r['op']:9s}  rel_rms {r['rel_rms']:.4f}", flush=True)
        conv_rows = [r for r in rows if r["op"] == "conv"]
        print(
            f"  ({len(conv_rows)} convs; median {np.median([r['rel_rms'] for r in conv_rows]):.4f}; "
            f"rms-sum of all layers {np.sqrt(np.sum([r['rel_rms']**2 for r in rows])):.4f})"
        )
        worst_ids = [r["node"] for r in conv_rows]  # sorted desc already

        combos = [
            ("absmax k=0 (r4 default)", dict(calibration="absmax"), 0),
            ("percentile k=0", dict(calibration="percentile"), 0),
            ("mse k=0", dict(calibration="mse"), 0),
            ("absmax k=4", dict(calibration="absmax"), 4),
            ("mse k=2", dict(calibration="mse"), 2),
            ("mse k=4", dict(calibration="mse"), 4),
            ("mse k=8", dict(calibration="mse"), 8),
        ]
        for label, kwargs, k in combos:
            q_forward = quantize_encoder_decoder_inference(
                model, variables_cpu, cal,
                fallback_nodes=worst_ids[:k] if k else None, **kwargs,
            )
            q_held = np.asarray(q_forward(held))
            rel = float(np.sqrt(np.mean((q_held - f_held) ** 2)) / np.sqrt(np.mean(f_held**2)))
            agree = float((q_held.argmax(-1) == f_pred).mean())
            results.append(
                {"lever": label, "k": k, "rel_rms": round(rel, 4), "agreement": round(agree, 4)}
            )
            print(json.dumps(results[-1]), flush=True)

    # ---- throughput on the TPU: k=0 vs k=4 program structures -----------
    print("\ndistributed-d4 throughput on the TPU (program structure = k only):")
    scene_rng = np.random.RandomState(1234)
    scene_img = jnp.asarray(make_scene(scene_rng, SCENE)[0])
    for k in (0, 4):
        q_forward = quantize_encoder_decoder_inference(
            model, variables, cal_np,
            calibration="absmax", fallback_nodes=worst_ids[:k] if k else None,
        )
        run = partial(
            tiled_apply_d4_tta, q_forward,
            tile_size=TILE, tile_step=STEP, batch_size=8, mode="distributed",
        )
        np.asarray(run(scene_img))  # compile
        t0 = time.perf_counter()
        np.asarray(run(scene_img))
        dt = time.perf_counter() - t0
        row = {"lever": f"tpu throughput k={k}", "k": k, "mps": round(SCENE * SCENE / 1e6 / dt, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "int8_fidelity_config3", "rows": results}))


if __name__ == "__main__":
    main()
