"""End-to-end segmentation training example (the capability shown in the
reference's README.md:71-100 and demo/, TPU-native).

Trains the flagship UNet on synthetic blobs with dice+focal, layerwise LR,
warmup-cosine schedule, and mesh data parallelism; then runs tiled
d4-TTA inference on a large synthetic image.

Run: python examples/train_segmentation.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_toolbelt_tpu import losses as L
from pytorch_toolbelt_tpu.distributed import batch_sharding, make_mesh, replicated
from pytorch_toolbelt_tpu.inference import tiled_apply
from pytorch_toolbelt_tpu.inference.tta import d4_image2mask
from pytorch_toolbelt_tpu.optimization import (
    flat_cosine_annealing_schedule,
    gradual_warmup_schedule,
    make_optimizer,
)
from pytorch_toolbelt_tpu.utils import count_parameters, get_random_name, set_manual_seed
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel


def synthetic_batch(rng: np.random.RandomState, batch: int, size: int):
    """Random blobs: image = noisy disks, mask = disk interiors."""
    yy, xx = np.mgrid[:size, :size]
    images = np.zeros((batch, size, size, 3), np.float32)
    masks = np.zeros((batch, size, size), np.int32)
    for i in range(batch):
        cy, cx = rng.randint(size // 4, 3 * size // 4, size=2)
        r = rng.randint(size // 8, size // 4)
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r**2
        masks[i] = disk
        images[i] = disk[..., None] * 0.7 + rng.rand(size, size, 3) * 0.3
    return jnp.asarray(images), jnp.asarray(masks)


def main(steps: int = 20, batch: int = 8, size: int = 128):
    key = set_manual_seed(42)
    run_name = get_random_name()
    print(f"run: {run_name}, devices: {jax.devices()}")

    model = UNetSegmentationModel(num_classes=2, encoder_channels=16, num_layers=3)
    x0, y0 = synthetic_batch(np.random.RandomState(0), batch, size)
    variables = model.init(key, x0)
    params, batch_stats = variables["params"], variables["batch_stats"]
    print("parameters:", count_parameters(params, human_friendly=True)["total"])

    schedule = gradual_warmup_schedule(
        1e-3, multiplier=1.0, total_epoch=5,
        after_schedule=flat_cosine_annealing_schedule(1e-3, t_max=steps, t_flat=steps // 2),
    )
    tx = make_optimizer(
        params,
        learning_rate=1e-3,
        weight_decay=1e-4,
        optimizer_factory=optax.adamw,
        apply_weight_decay_on_norm=False,
        apply_weight_decay_on_bias=False,
    )
    opt_state = tx.init(params)
    loss_fn = L.JointLoss(L.DiceLoss(mode="multiclass"), L.CrossEntropyFocalLoss(), 1.0, 0.5)

    mesh = make_mesh()
    rep = replicated(mesh)
    xs = batch_sharding(mesh, 4)
    ys = batch_sharding(mesh, 3)

    def train_step(params, batch_stats, opt_state, x, y):
        def compute(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, training=True, mutable=["batch_stats"]
            )
            return loss_fn(out, y), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    step = jax.jit(train_step, in_shardings=(rep, rep, rep, xs, ys), out_shardings=(rep,) * 4)

    rng = np.random.RandomState(1)
    with mesh:
        for i in range(steps):
            x, y = synthetic_batch(rng, batch, size)
            x = jax.device_put(x, xs)
            y = jax.device_put(y, ys)
            params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, x, y)
            if i % 5 == 0 or i == steps - 1:
                print(f"step {i:3d}  lr {schedule(i):.2e}  loss {float(loss):.4f}")

    # inference: tiled + d4 TTA on a big synthetic image
    trained = {"params": params, "batch_stats": batch_stats}
    infer = lambda tiles: model.apply(trained, tiles)
    # prediction canvas scales with the train tile so the smoke-test config
    # (size=32) stays a handful of tiles while the default is a real 512 map
    big = size * 4
    big_image = jnp.asarray(np.random.RandomState(7).rand(big, big, 3).astype(np.float32))
    merged = tiled_apply(
        lambda t: d4_image2mask(infer, t), big_image,
        tile_size=size, tile_step=size // 2, weight="pyramid", batch_size=4,
    )
    print("tiled d4-TTA prediction:", merged.shape, "finite:", bool(jnp.all(jnp.isfinite(merged))))


if __name__ == "__main__":
    main()
