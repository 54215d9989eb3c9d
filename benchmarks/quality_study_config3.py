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


def main():
    print(f"training SEResNeXt50-FPN {NUM_CLASSES}-class on synthetic scenes ...")
    model, variables = train_model()

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
    run_plain = partial(tiled_apply, forward, **kw)
    run_full = partial(tiled_apply_d4_tta, forward, mode="full", **kw)
    run_dist = partial(tiled_apply_d4_tta, forward, mode="distributed", **kw)
    run_dist_q = partial(tiled_apply_d4_tta, q_forward, mode="distributed", **kw)

    rng = np.random.RandomState(1234)
    n_scenes = 4
    ious = {"no_tta": [], "full_d4": [], "distributed_d4": [], "int8_distributed_d4": []}
    deltas, agreements, p95s, dstds, q_deltas, q_agreements = [], [], [], [], [], []
    times = {"distributed_d4": [], "int8_distributed_d4": []}
    for s in range(n_scenes):
        img_np, gt = make_scene(rng, SCENE)
        img = jnp.asarray(img_np)
        logits = {}
        logits["no_tta"] = np.asarray(run_plain(img))
        logits["full_d4"] = np.asarray(run_full(img))
        t0 = time.perf_counter()
        out = run_dist(img)
        logits["distributed_d4"] = np.asarray(out)  # d2h sync included
        times["distributed_d4"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = run_dist_q(img)
        logits["int8_distributed_d4"] = np.asarray(out)
        times["int8_distributed_d4"].append(time.perf_counter() - t0)

        probs = {k: jax.nn.softmax(jnp.asarray(v), axis=-1) for k, v in logits.items()}
        probs = {k: np.asarray(v) for k, v in probs.items()}
        preds = {k: v.argmax(-1) for k, v in probs.items()}
        for k in ious:
            ious[k].append(miou(preds[k], gt))
        dp = np.abs(probs["full_d4"] - probs["distributed_d4"])
        deltas.append(dp.mean())
        p95s.append(np.percentile(dp, 95))
        dstds.append(probs["full_d4"].std())
        agreements.append((preds["full_d4"] == preds["distributed_d4"]).mean())
        q_deltas.append(np.abs(probs["int8_distributed_d4"] - probs["distributed_d4"]).mean())
        q_agreements.append((preds["int8_distributed_d4"] == preds["distributed_d4"]).mean())

    mp = SCENE * SCENE / 1e6
    print(f"\n=== config-3 quality study: {n_scenes} scenes {SCENE}x{SCENE}, "
          f"trained SEResNeXt50-FPN, {NUM_CLASSES} classes ===")
    for k, v in ious.items():
        print(f"mIoU vs GT  {k:20s}: {np.mean(v):.4f}  (+/- {np.std(v):.4f})")
    print("\nfull-d4 vs distributed-d4 (probability space):")
    print(f"  mean |dp|          : {np.mean(deltas):.5f}")
    print(f"  p95  |dp|          : {np.mean(p95s):.5f}")
    print(f"  prob std (full)    : {np.mean(dstds):.4f}")
    print(f"  mean|dp| / std     : {np.mean(deltas) / np.mean(dstds):.4f}")
    print(f"  hard-pred agreement: {np.mean(agreements) * 100:.3f}%")
    print("\nint8 vs bf16 distributed-d4 (probability space):")
    print(f"  mean |dp|          : {np.mean(q_deltas):.5f}")
    print(f"  hard-pred agreement: {np.mean(q_agreements) * 100:.3f}%")
    print("\ndistributed-d4 pipeline throughput (1024^2 scene, steady-state "
          "= later scenes after compile):")
    for k, ts in times.items():
        steady = min(ts[1:]) if len(ts) > 1 else ts[0]
        print(f"  {k:20s}: {steady*1e3:7.1f} ms = {mp/steady:6.2f} MP/s")


if __name__ == "__main__":
    main()
