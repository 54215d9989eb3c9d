"""Weak-scaling measurement for tiled_apply_sharded on the virtual CPU mesh
(VERDICT round-2 #6: bound the sharding overhead behind the "4 chips scale
the tile axis linearly" claim with data instead of a sentence).

Method: all n virtual devices share ONE physical core, so the right weak-
scaling read-out is TOTAL wall time against TOTAL work.  The image height
grows with n (H = n x base_h, W fixed), keeping per-device work constant:
a perfectly-overhead-free sharding would cost exactly n x the 1-device
time on this serialized host, so

    efficiency(n) = n * t(1) / t(n)

isolates everything the sharding adds — boundary-tile recompute at strip
seams, per-device grid imbalance, padding batches, halo handling.  It
cannot prove ICI behavior (no real links here), but the strips path uses
NO collectives at all, so ICI cost on real hardware is zero by
construction and the overhead bounded here is the only deviation from
linear scaling the algorithm carries.

Run:  python benchmarks/weak_scaling.py     (forces CPU, 8 virtual devices)
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# this image's sitecustomize registers the axon TPU backend at interpreter
# boot and overrides JAX_PLATFORMS from the environment — force CPU through
# jax.config (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) >= 8
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_platforms", "cpu")

from pytorch_toolbelt_tpu.distributed import tiled_apply_sharded

BASE_H, W = 512, 512
TILE, STEP = 128, 64
BATCH = 4


def model_fn(tiles):
    # fixed random conv stack: enough arithmetic that the model dominates the
    # merge (as in the real pipeline) but cheap to compile 4x on one core
    k = jax.random.PRNGKey(0)
    c = 16
    w1 = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 3, c)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, c, c)) * 0.1
    w3 = jax.random.normal(jax.random.fold_in(k, 3), (3, 3, c, 1)) * 0.1
    x = jax.lax.conv_general_dilated(tiles, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(x)
    x = jax.lax.conv_general_dilated(x, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.nn.relu(x)
    return jax.lax.conv_general_dilated(x, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def measure(n_devices: int, iters: int = 3) -> float:
    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.asarray(devices), ("data",))
    h = BASE_H * n_devices
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(h, W, 3).astype(np.float32))

    def run(img):
        return tiled_apply_sharded(
            model_fn, img, mesh, tile_size=TILE, tile_step=STEP,
            weight="pyramid", batch_size=BATCH,
        )

    out = run(image)  # compile + warmup
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(image)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    results = []
    t1 = None
    for n in (1, 2, 4, 8):
        t = measure(n)
        if n == 1:
            t1 = t
        eff = n * t1 / t
        results.append({
            "n_devices": n,
            "image": f"{BASE_H * n}x{W}",
            "wall_s": round(t, 3),
            "weak_scaling_efficiency": round(eff, 3),
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
