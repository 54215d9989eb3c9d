"""Config-3-scale quality study (VERDICT r3 #5 + #6).

Round 3's quality evidence came from a ~100k-param UNet-16 on binary
synthetic shapes; this study repeats the protocol at BASELINE config 3's
model class: **SEResNeXt50-FPN(128), 19 classes** (~26M params), so the
distributed-vs-full-d4 and int8 interchangeability claims are measured on
a model with real depth, SE gates, grouped convs and an FPN.

Protocol (self-contained, synthetic):
  1. Train SEResNeXt50-FPN on 19-class synthetic scenes (each shape gets a
     class from its color bucket; background = 0), 256x256 patches.
  2. Quantize the trained model with zoo/quantized_encdec.py (int8 PTQ).
  3. On held-out 1024x1024 scenes run tiled inference (tile 256 / step 128,
     pyramid blend): no TTA, full d4, distributed d4, int8 distributed d4.
  4. Report per-mode mIoU vs ground truth, prob-space deltas between the
     d4 modes, hard-prediction agreement — plus wall-clock MP/s of the
     bf16 vs int8 distributed-d4 pipelines on the same scenes.

Run: python benchmarks/quality_study_config3.py
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_toolbelt_tpu import losses as L
from pytorch_toolbelt_tpu.inference import tiled_apply, tiled_apply_d4_tta
from pytorch_toolbelt_tpu.zoo import EncoderDecoderModel, FPNDecoder, ResizeHead
from pytorch_toolbelt_tpu.zoo.encoders.resnet import seresnext50_encoder
from pytorch_toolbelt_tpu.zoo.quantized_encdec import quantize_encoder_decoder_inference

TILE = 256
STEP = 128
SCENE = 1024
NUM_CLASSES = 19


def make_scene(rng: np.random.RandomState, size: int):
    """Noisy image + 19-class mask: each shape's class is determined by its
    color bucket so the task is learnable from appearance."""
    img = rng.normal(0.0, 0.3, (size, size, 3)).astype(np.float32)
    mask = np.zeros((size, size), dtype=np.int32)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(max(6, size // 40)):
        cy, cx = rng.randint(0, size, 2)
        cls = rng.randint(1, NUM_CLASSES)
        if rng.rand() < 0.5:
            a, b = rng.randint(10, size // 5, 2)
            th = rng.rand() * np.pi
            dy, dx = yy - cy, xx - cx
            ry = dy * np.cos(th) + dx * np.sin(th)
            rx = -dy * np.sin(th) + dx * np.cos(th)
            inside = (ry / a) ** 2 + (rx / b) ** 2 <= 1.0
        else:
            h, w = rng.randint(10, size // 5, 2)
            inside = (np.abs(yy - cy) <= h) & (np.abs(xx - cx) <= w)
        mask[inside] = cls
        # class-coded color + noise: class k -> deterministic RGB direction
        color_rng = np.random.RandomState(1000 + cls)
        color = color_rng.normal(0.0, 1.0, 3).astype(np.float32)
        img[inside] += color * rng.uniform(0.8, 1.2)
    return img, mask


def build_model():
    encoder = seresnext50_encoder()
    decoder = FPNDecoder(input_spec=encoder.get_output_spec(), out_channels=128)
    head = ResizeHead(input_spec=decoder.get_output_spec(), num_classes=NUM_CLASSES)
    return EncoderDecoderModel(encoder=encoder, decoder=decoder, head=head)


def train_model(steps: int = 300, batch: int = 8, seed: int = 0):
    model = build_model()
    rng = np.random.RandomState(seed)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, TILE, TILE, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    loss_fn = L.JointLoss(L.DiceLoss(mode="multiclass"), L.CrossEntropyFocalLoss(), 1.0, 1.0)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def compute(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, training=True, mutable=["batch_stats"]
            )
            return loss_fn(out, y), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    t0 = time.perf_counter()
    for i in range(steps):
        xs, ys = zip(*(make_scene(rng, TILE) for _ in range(batch)))
        x = jnp.asarray(np.stack(xs))
        y = jnp.asarray(np.stack(ys))
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, x, y)
        if i % 50 == 0:
            print(f"  step {i}: loss {float(loss):.4f}  ({time.perf_counter()-t0:.0f}s)")
    print(f"  final loss {float(loss):.4f}  ({time.perf_counter()-t0:.0f}s)")
    return model, {"params": params, "batch_stats": batch_stats}


def miou(pred: np.ndarray, gt: np.ndarray) -> float:
    """Mean IoU over classes present in GT or prediction."""
    ious = []
    for c in range(NUM_CLASSES):
        p = pred == c
        g = gt == c
        union = np.logical_or(p, g).sum()
        if union == 0:
            continue
        ious.append(np.logical_and(p, g).sum() / union)
    return float(np.mean(ious))


MODES = ("no_tta", "full_d4", "distributed_d4", "int8_distributed_d4")


def evaluate_seed(seed: int, scenes):
    """Train one model with ``seed``, evaluate every mode on the SAME
    held-out scene set (shared across seeds for paired comparisons)."""
    print(f"training SEResNeXt50-FPN {NUM_CLASSES}-class (seed {seed}) ...")
    model, variables = train_model(seed=seed)

    def forward(tiles):
        return model.apply(variables, tiles)

    print("building int8 PTQ twin (quantized_encdec) ...")
    cal_rng = np.random.RandomState(99)
    cal = jnp.asarray(np.stack([make_scene(cal_rng, TILE)[0] for _ in range(8)]))
    q_forward = quantize_encoder_decoder_inference(model, variables, cal)
    ref = np.asarray(forward(cal))
    qout = np.asarray(q_forward(cal))
    rel = float(np.sqrt(np.mean((qout - ref) ** 2)) / np.sqrt(np.mean(ref**2)))
    print(f"  int8 forward rel-RMS vs f32 on calibration tiles: {rel:.4f}")

    kw = dict(tile_size=TILE, tile_step=STEP, batch_size=8)
    runners = {
        "no_tta": partial(tiled_apply, forward, **kw),
        "full_d4": partial(tiled_apply_d4_tta, forward, mode="full", **kw),
        "distributed_d4": partial(tiled_apply_d4_tta, forward, mode="distributed", **kw),
        "int8_distributed_d4": partial(tiled_apply_d4_tta, q_forward, mode="distributed", **kw),
    }

    records = []
    times = {"distributed_d4": [], "int8_distributed_d4": []}
    for img_np, gt in scenes:
        img = jnp.asarray(img_np)
        logits = {}
        for k, run in runners.items():
            t0 = time.perf_counter()
            logits[k] = np.asarray(run(img))  # d2h sync included
            if k in times:
                times[k].append(time.perf_counter() - t0)

        probs = {k: np.asarray(jax.nn.softmax(jnp.asarray(v), axis=-1)) for k, v in logits.items()}
        preds = {k: v.argmax(-1) for k, v in probs.items()}
        rec = {f"miou_{k}": miou(preds[k], gt) for k in MODES}
        dp = np.abs(probs["full_d4"] - probs["distributed_d4"])
        rec["mode_dp"] = float(dp.mean())
        rec["mode_dp_p95"] = float(np.percentile(dp, 95))
        rec["prob_std"] = float(probs["full_d4"].std())
        rec["mode_agreement"] = float((preds["full_d4"] == preds["distributed_d4"]).mean())
        rec["q_dp"] = float(np.abs(probs["int8_distributed_d4"] - probs["distributed_d4"]).mean())
        rec["q_agreement"] = float((preds["int8_distributed_d4"] == preds["distributed_d4"]).mean())
        records.append(rec)
    return records, times


def main():
    from study_stats import paired_delta_report, print_cell, summarize_cell

    n_scenes = 16
    seeds = (0, 1)
    scene_rng = np.random.RandomState(1234)
    scenes = [make_scene(scene_rng, SCENE) for _ in range(n_scenes)]

    records = []
    times = {"distributed_d4": [], "int8_distributed_d4": []}
    for seed in seeds:
        recs, ts = evaluate_seed(seed, scenes)
        records.extend(recs)
        for k in times:
            times[k].extend(ts[k])

    def col(key):
        return np.asarray([r[key] for r in records])

    mp = SCENE * SCENE / 1e6
    print(
        f"\n=== config-3 quality study: {len(seeds)} seeds x {n_scenes} scenes "
        f"{SCENE}x{SCENE}, trained SEResNeXt50-FPN, {NUM_CLASSES} classes "
        f"(n={len(records)} cells) ==="
    )
    for k in MODES:
        print_cell(summarize_cell(f"mIoU {k}", col(f"miou_{k}")))

    print("\npaired per-scene deltas (bootstrap 95% CI; significant iff CI excludes 0):")
    print_cell(
        paired_delta_report("TTA gain (full_d4 - no_tta)", col("miou_full_d4"), col("miou_no_tta"))
    )
    print_cell(
        paired_delta_report(
            "mode delta (dist - full)", col("miou_distributed_d4"), col("miou_full_d4")
        )
    )
    print_cell(
        paired_delta_report(
            "int8 cost (int8 - bf16 dist)",
            col("miou_int8_distributed_d4"),
            col("miou_distributed_d4"),
        )
    )

    print("\nfull-d4 vs distributed-d4 (probability space):")
    print(f"  mean |dp|          : {col('mode_dp').mean():.5f}")
    print(f"  p95  |dp|          : {col('mode_dp_p95').mean():.5f}")
    print(f"  prob std (full)    : {col('prob_std').mean():.4f}")
    print(f"  mean|dp| / std     : {col('mode_dp').mean() / col('prob_std').mean():.4f}")
    print(f"  hard-pred agreement: {col('mode_agreement').mean() * 100:.3f}%")
    print("\nint8 vs bf16 distributed-d4 (probability space):")
    print(f"  mean |dp|          : {col('q_dp').mean():.5f}")
    print(f"  hard-pred agreement: {col('q_agreement').mean() * 100:.3f}%")
    print("\ndistributed-d4 pipeline throughput (1024^2 scene, steady-state "
          "= later scenes after compile):")
    for k, ts in times.items():
        steady = min(ts[1:]) if len(ts) > 1 else ts[0]
        print(f"  {k:20s}: {steady*1e3:7.1f} ms = {mp/steady:6.2f} MP/s")


if __name__ == "__main__":
    main()
