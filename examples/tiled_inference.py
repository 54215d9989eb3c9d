"""Huge-image tiled inference walkthrough (capability target: the
reference's notebooks/tiled_inference.ipynb + README.md:196-227).

Shows the three ways to run a model over an image that does not fit the
model's input size, from most convenient to most manual:

1. ``tiled_apply_d4_tta`` — the fused TPU pipeline: pad -> slice -> batched
   forwards -> weighted overlap-add -> normalize, one XLA program, with d4
   test-time augmentation distributed over the tile grid.
2. ``tiled_apply`` — same fusion, no TTA.
3. ``ImageSlicer`` + ``TileMerger`` — the reference-style host loop (numpy
   slicing, device merging) for streaming scenarios where tiles arrive in
   batches (e.g. out-of-core imagery).

All three agree up to TTA differences; 2 and 3 agree to float tolerance.

Run: python examples/tiled_inference.py [image_size]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.inference import (
    ImageSlicer,
    TileMerger,
    tiled_apply,
    tiled_apply_d4_tta,
)
from pytorch_toolbelt_tpu.utils import set_manual_seed
from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

TILE, STEP = 256, 128


def main(size: int = 1024, batch_size: int = 8):
    key = set_manual_seed(0)
    model = UNetSegmentationModel(num_classes=1, encoder_channels=16, num_layers=3)
    variables = model.init(key, jnp.zeros((1, TILE, TILE, 3)))

    def forward(tiles):
        return model.apply(variables, tiles)

    image = jnp.asarray(np.random.RandomState(7).rand(size, size, 3).astype(np.float32))

    # 1. fused pipeline with distributed d4 TTA
    pred_tta = tiled_apply_d4_tta(
        forward, image, tile_size=TILE, tile_step=STEP, weight="pyramid", batch_size=batch_size
    )
    print("d4-TTA prediction:", pred_tta.shape, "finite:", bool(jnp.all(jnp.isfinite(pred_tta))))

    # 2. fused pipeline, no TTA
    pred = tiled_apply(
        forward, image, tile_size=TILE, tile_step=STEP, weight="pyramid", batch_size=batch_size
    )

    # 3. reference-style host loop: slice on host, merge on device
    slicer = ImageSlicer(image.shape, tile_size=TILE, tile_step=STEP, weight="pyramid")
    merger = TileMerger(slicer.target_shape, channels=1, weight=slicer.weight)
    tiles = np.stack(slicer.split(np.asarray(image)))
    for start in range(0, len(tiles), batch_size):
        batch = jnp.asarray(tiles[start : start + batch_size])
        merger.integrate_batch(forward(batch), slicer.crops[start : start + batch_size])
    pred_host = slicer.crop_to_orignal_size(np.asarray(merger.merge()))

    err = float(np.abs(np.asarray(pred) - pred_host).max())
    print(f"fused vs host-loop max abs diff: {err:.2e}")
    assert err < 1e-4
    return pred_tta, pred, pred_host


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
