"""Full-d4 tiled-TTA levers (VERDICT round-2 #2): batch sweep between 16 and
the OOM point, and bf16 canvas accumulation — measured on the real TPU chip
against the north-star config (5000x5000, UNet-32, 512/256 pyramid merge).

Each configuration prints one JSON line; OOMs are caught and recorded.

Run:  python benchmarks/full_d4_levers.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.inference import tiled_apply_d4_tta
from pytorch_toolbelt_tpu.inference.tiles import clear_tiled_cache
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

IMAGE_SIZE = 5000
TILE_SIZE = 512
TILE_STEP = 256


def main():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    x_init = jnp.zeros((1, TILE_SIZE, TILE_SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)
    variables = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.bfloat16) if leaf.dtype == jnp.float32 else leaf, variables
    )

    def forward(tiles):
        return model.apply(variables, tiles.astype(jnp.bfloat16))

    rng = np.random.RandomState(0)
    image0 = jnp.asarray(rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
    megapixels = (IMAGE_SIZE * IMAGE_SIZE) / 1e6
    perturb = jax.jit(lambda img, out: img * (1.0 + 1e-6 * out[0, 0, 0].astype(jnp.float32)))

    configs = [
        {"batch": 16, "acc": "fp32"},
        {"batch": 20, "acc": "fp32"},
        {"batch": 24, "acc": "fp32"},
        {"batch": 28, "acc": "fp32"},
        {"batch": 32, "acc": "fp32"},
        {"batch": 16, "acc": "bf16"},
        {"batch": 24, "acc": "bf16"},
        {"batch": 32, "acc": "bf16"},
    ]

    for cfg in configs:
        acc_dtype = jnp.float32 if cfg["acc"] == "fp32" else jnp.bfloat16
        clear_tiled_cache()
        image = image0

        def run(img):
            return tiled_apply_d4_tta(
                forward, img, tile_size=TILE_SIZE, tile_step=TILE_STEP,
                weight="pyramid", batch_size=cfg["batch"], mode="full",
                accumulator_dtype=acc_dtype,
            )

        try:
            out = run(image)
            image = perturb(image, out)
            # d2h scalar read: the only reliable sync on the axon relay
            # (block_until_ready can return early); it also flushes the
            # deferred compile out of the timed region
            float(out[0, 0, 0])
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                out = run(image)
                image = perturb(image, out)
            float(out[0, 0, 0])
            dt = (time.perf_counter() - t0) / iters
            # bf16 canvas numerics check vs nothing fancy: report max|.| so a
            # silently-NaN canvas can't masquerade as a fast one
            peak = float(jnp.max(jnp.abs(out.astype(jnp.float32))))
            print(json.dumps({
                "mode": "full_d4", **cfg,
                "mps": round(megapixels / dt, 2),
                "ms": round(dt * 1e3, 0),
                "out_absmax": round(peak, 4),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 - record OOMs and move on
            msg = str(e)
            kind = "OOM" if ("RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()) else "error"
            print(json.dumps({"mode": "full_d4", **cfg, "failed": kind, "detail": msg[:160]}), flush=True)


if __name__ == "__main__":
    main()
