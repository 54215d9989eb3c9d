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


def main():
    print("training UNet-16 on synthetic shapes ...")
    model, variables = train_model()

    def forward(tiles):
        return model.apply(variables, tiles)

    # int8 PTQ twin of the same trained model, calibrated on training-like
    # tiles (zoo/quantized_unet.py)
    from pytorch_toolbelt_tpu.zoo.quantized_unet import quantize_unet_inference

    cal_rng = np.random.RandomState(99)
    cal = jnp.asarray(np.stack([make_scene(cal_rng, TILE)[0] for _ in range(16)]))
    q_forward = quantize_unet_inference(model, variables, cal)

    run_plain = partial(tiled_apply, forward, tile_size=TILE, tile_step=STEP, batch_size=8)
    run_full = partial(
        tiled_apply_d4_tta, forward, tile_size=TILE, tile_step=STEP, batch_size=8, mode="full"
    )
    run_dist = partial(
        tiled_apply_d4_tta, forward, tile_size=TILE, tile_step=STEP, batch_size=8, mode="distributed"
    )
    run_dist_q = partial(
        tiled_apply_d4_tta, q_forward, tile_size=TILE, tile_step=STEP, batch_size=8,
        mode="distributed",
    )

    rng = np.random.RandomState(1234)
    n_scenes = 8
    ious = {"no_tta": [], "full_d4": [], "distributed_d4": [], "int8_distributed_d4": []}
    deltas, agreements, p95s, dstds = [], [], [], []
    q_deltas, q_agreements = [], []
    for s in range(n_scenes):
        img_np, gt = make_scene(rng, SCENE)
        img = jnp.asarray(img_np)
        logits = {
            "no_tta": np.asarray(run_plain(img)),
            "full_d4": np.asarray(run_full(img)),
            "distributed_d4": np.asarray(run_dist(img)),
            "int8_distributed_d4": np.asarray(run_dist_q(img)),
        }
        probs = {k: 1.0 / (1.0 + np.exp(-v)) for k, v in logits.items()}
        gt_b = gt[..., 0] > 0.5
        for k in ious:
            ious[k].append(iou(probs[k][..., 0] > 0.5, gt_b))
        dp = np.abs(probs["full_d4"] - probs["distributed_d4"])
        deltas.append(dp.mean())
        p95s.append(np.percentile(dp, 95))
        dstds.append(probs["full_d4"].std())
        agreements.append(
            ((probs["full_d4"] > 0.5) == (probs["distributed_d4"] > 0.5)).mean()
        )
        q_deltas.append(np.abs(probs["int8_distributed_d4"] - probs["distributed_d4"]).mean())
        q_agreements.append(
            ((probs["int8_distributed_d4"] > 0.5) == (probs["distributed_d4"] > 0.5)).mean()
        )

    print(f"\n=== quality study: {n_scenes} scenes of {SCENE}x{SCENE}, trained UNet-16 ===")
    for k, v in ious.items():
        print(f"IoU vs GT  {k:16s}: {np.mean(v):.4f}  (+/- {np.std(v):.4f})")
    print(f"\nfull-d4 vs distributed-d4 (probability space):")
    print(f"  mean |dp|          : {np.mean(deltas):.5f}")
    print(f"  p95  |dp|          : {np.mean(p95s):.5f}")
    print(f"  prob std (full)    : {np.mean(dstds):.4f}")
    print(f"  mean|dp| / std     : {np.mean(deltas) / np.mean(dstds):.4f}")
    print(f"  hard-pred agreement: {np.mean(agreements) * 100:.3f}%")
    print(f"\nint8 vs bf16 distributed-d4 (probability space):")
    print(f"  mean |dp|          : {np.mean(q_deltas):.5f}")
    print(f"  hard-pred agreement: {np.mean(q_agreements) * 100:.3f}%")


if __name__ == "__main__":
    main()
