"""Distributed-d4 vs full-d4 TTA: output-quality study (VERDICT r2 #1c).

The two modes are different ensembles: full-d4 averages all 8 views
uniformly within every tile; distributed-d4 gives every interior pixel a
pyramid-weighted average of the same 8 views, each view contributed by a
different covering tile (inference/tiles.py:598-674).  On a RANDOM-INIT
model their outputs differ materially (the round-2 judge measured
mean |delta| ~ 0.6x output std) because untrained features are far from
equivariant.  The question that matters for a user is whether the modes
differ on a TRAINED model, and whether either differs in task quality.

Protocol (fully self-contained, no external data):
  1. Train UNet-16 on synthetic binary segmentation (noisy ellipses +
     rectangles, 128x128 patches) to convergence (~400 steps, seconds on
     TPU).
  2. On held-out 640x640 scenes, run tiled inference (tile 128 / step 64,
     pyramid blend) three ways: no TTA, full d4, distributed d4.
  3. Report per-mode IoU vs ground truth, the prob-space delta between the
     two d4 modes (mean |dp|, p95 |dp|, as fractions of prob std), and
     hard-prediction agreement.

Run: python benchmarks/quality_study.py   (results table -> stdout; the
round's numbers are recorded in benchmarks/RESULTS.md)
"""

import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_toolbelt_tpu.inference import tiled_apply, tiled_apply_d4_tta
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

TILE = 128
STEP = 64
SCENE = 640


def make_scene(rng: np.random.RandomState, size: int):
    """Noisy image + binary mask of random ellipses and rectangles."""
    img = rng.normal(0.0, 0.35, (size, size, 3)).astype(np.float32)
    mask = np.zeros((size, size), dtype=np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(max(4, size // 48)):
        cy, cx = rng.randint(0, size, 2)
        if rng.rand() < 0.5:
            a, b = rng.randint(8, size // 5, 2)
            th = rng.rand() * np.pi
            dy, dx = yy - cy, xx - cx
            ry = dy * np.cos(th) + dx * np.sin(th)
            rx = -dy * np.sin(th) + dx * np.cos(th)
            inside = (ry / a) ** 2 + (rx / b) ** 2 <= 1.0
        else:
            h, w = rng.randint(8, size // 5, 2)
            inside = (np.abs(yy - cy) <= h) & (np.abs(xx - cx) <= w)
        mask[inside] = 1.0
        color = rng.normal(0.0, 1.0, 3).astype(np.float32)
        img[inside] += color * rng.uniform(0.6, 1.2)
    return img, mask[..., None]


def train_model(steps: int = 400, batch: int = 16, seed: int = 0):
    model = UNetSegmentationModel(num_classes=1, encoder_channels=16, growth_factor=2)
    rng = np.random.RandomState(seed)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, TILE, TILE, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, training=True, mutable=["batch_stats"]
            )
            loss = optax.sigmoid_binary_cross_entropy(out, y).mean()
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    for i in range(steps):
        xs, ys = zip(*(make_scene(rng, TILE) for _ in range(batch)))
        x = jnp.asarray(np.stack(xs))
        y = jnp.asarray(np.stack(ys))
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, x, y)
        if i % 100 == 0:
            print(f"  step {i}: loss {float(loss):.4f}")
    print(f"  final loss {float(loss):.4f}")
    return model, {"params": params, "batch_stats": batch_stats}


def iou(pred_mask: np.ndarray, gt: np.ndarray) -> float:
    inter = np.logical_and(pred_mask, gt).sum()
    union = np.logical_or(pred_mask, gt).sum()
    return float(inter) / max(float(union), 1.0)


MODES = ("no_tta", "full_d4", "distributed_d4", "int8_distributed_d4")


def evaluate_seed(seed: int, scenes):
    """Train one model with ``seed``, evaluate every mode on the SAME
    held-out scene set (shared across seeds for paired comparisons)."""
    print(f"training UNet-16 (seed {seed}) on synthetic shapes ...")
    model, variables = train_model(seed=seed)

    def forward(tiles):
        return model.apply(variables, tiles)

    # int8 PTQ twin of the same trained model, calibrated on training-like
    # tiles (zoo/quantized_unet.py)
    from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference

    cal_rng = np.random.RandomState(99)
    cal = jnp.asarray(np.stack([make_scene(cal_rng, TILE)[0] for _ in range(16)]))
    q_forward = quantize_unet_inference(model, variables, cal)

    kw = dict(tile_size=TILE, tile_step=STEP, batch_size=8)
    runners = {
        "no_tta": partial(tiled_apply, forward, **kw),
        "full_d4": partial(tiled_apply_d4_tta, forward, mode="full", **kw),
        "distributed_d4": partial(tiled_apply_d4_tta, forward, mode="distributed", **kw),
        "int8_distributed_d4": partial(tiled_apply_d4_tta, q_forward, mode="distributed", **kw),
    }

    records = []
    for img_np, gt in scenes:
        img = jnp.asarray(img_np)
        probs = {k: 1.0 / (1.0 + np.exp(-np.asarray(run(img)))) for k, run in runners.items()}
        gt_b = gt[..., 0] > 0.5
        rec = {f"iou_{k}": iou(probs[k][..., 0] > 0.5, gt_b) for k in MODES}
        dp = np.abs(probs["full_d4"] - probs["distributed_d4"])
        rec["mode_dp"] = float(dp.mean())
        rec["mode_dp_p95"] = float(np.percentile(dp, 95))
        rec["prob_std"] = float(probs["full_d4"].std())
        rec["mode_agreement"] = float(
            ((probs["full_d4"] > 0.5) == (probs["distributed_d4"] > 0.5)).mean()
        )
        rec["q_dp"] = float(np.abs(probs["int8_distributed_d4"] - probs["distributed_d4"]).mean())
        rec["q_agreement"] = float(
            ((probs["int8_distributed_d4"] > 0.5) == (probs["distributed_d4"] > 0.5)).mean()
        )
        records.append(rec)
    return records


def main():
    from study_stats import paired_delta_report, print_cell, summarize_cell

    n_scenes = 16
    seeds = (0, 1)
    scene_rng = np.random.RandomState(1234)
    scenes = [make_scene(scene_rng, SCENE) for _ in range(n_scenes)]

    records = []
    for seed in seeds:
        records.extend(evaluate_seed(seed, scenes))

    def col(key):
        return np.asarray([r[key] for r in records])

    print(
        f"\n=== quality study: {len(seeds)} seeds x {n_scenes} scenes of "
        f"{SCENE}x{SCENE}, trained UNet-16 (n={len(records)} cells) ==="
    )
    for k in MODES:
        print_cell(summarize_cell(f"IoU {k}", col(f"iou_{k}")))

    print("\npaired per-scene deltas (bootstrap 95% CI; significant iff CI excludes 0):")
    print_cell(paired_delta_report("TTA gain (full_d4 - no_tta)", col("iou_full_d4"), col("iou_no_tta")))
    print_cell(
        paired_delta_report(
            "mode delta (dist - full)", col("iou_distributed_d4"), col("iou_full_d4")
        )
    )
    print_cell(
        paired_delta_report(
            "int8 cost (int8 - bf16 dist)", col("iou_int8_distributed_d4"), col("iou_distributed_d4")
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


if __name__ == "__main__":
    main()
