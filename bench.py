"""Benchmark driver entry point.

Runs the BASELINE.json north-star config on the real TPU chip:
tiled 5000x5000 UNet (32ch, growth 2) segmentation inference with d4 TTA,
pyramid-weight overlap-add merging — the whole pipeline as fused XLA
programs via pytorch_toolbelt_tpu.inference.tiled_apply.

Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": ...}

vs_baseline uses an assumed H100-PyTorch reference throughput for the same
pipeline (the torch reference publishes no numbers; BASELINE.json:13
"published": {}).  FLOP math: the config processes each of the 25 MP through
the UNet 32x (4x tile overlap at step=256, 8x d4 views) at ~180 GFLOP per
512x512 tile => ~576 TFLOP per image.  An H100 running the reference's
eager fp32/AMP pipeline (python tile loop, host<->device copies per batch)
sustains perhaps ~35% of bf16 peak on the conv stack in the best (AMP)
case => ~70 s (fp32) to ~3 s (AMP) per image; we charge the generous AMP
number: ~8 MP/s.  This bench runs on ONE v5e chip (197 TFLOP/s bf16 peak);
the >=5x north-star presumes the v5e-4 (4 chip) mesh configuration.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.inference import tiled_apply
from pytorch_toolbelt_tpu.inference.tta import d4_image2mask
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

ASSUMED_H100_PYTORCH_MPS = 8.0

IMAGE_SIZE = 5000
TILE_SIZE = 512
TILE_STEP = 256
BATCH = 16


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

    def model_with_d4_tta(tiles):
        return d4_image2mask(forward, tiles)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))

    def run():
        return tiled_apply(
            model_with_d4_tta,
            image,
            tile_size=TILE_SIZE,
            tile_step=TILE_STEP,
            weight="pyramid",
            batch_size=BATCH,
        )

    # warmup / compile
    out = run()
    out.block_until_ready()

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    megapixels = (IMAGE_SIZE * IMAGE_SIZE) / 1e6
    mps = megapixels / dt

    print(
        json.dumps(
            {
                "metric": "tiled_5000x5000_unet32_d4tta_pyramid_merge",
                "value": round(mps, 2),
                "unit": "MP/s",
                "vs_baseline": round(mps / ASSUMED_H100_PYTORCH_MPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
