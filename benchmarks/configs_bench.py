"""BASELINE.json configs 1, 3 and 5 measured on the real chip (config 2 is
the driver bench, bench.py; config 4 is loss_bench.py).

  1. UNet-32 (growth 2) binary segmentation, one 512x512 image, plain
     forward — measured on the host CPU (as specified) AND on the TPU.
  3. d4 + multiscale TTA over SEResNeXt50-FPN, 19-class 1024x1024, mean
     aggregation — batched d4 forward inside a MultiscaleTTA wrapper, one
     jitted program.
  5. End-to-end 10000x10000 orthophoto, tiled 512/256 pyramid merge with
     distributed-d4 TTA — single-chip run of the config-5 pipeline (the
     mesh-sharded variant runs in bench.py when >1 device is visible, and
     on the virtual CPU mesh in tests/test_distributed.py).

Timing: chained iterations + device-to-host sync (see loss_bench.py for
why the relay demands this).  Prints one JSON line per config.
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
from pytorch_toolbelt_tpu.inference.tta import MultiscaleTTA, d4_image2mask
from pytorch_toolbelt_tpu.zoo import (
    EncoderDecoderModel,
    FPNDecoder,
    ResizeHead,
    UNetSegmentationModel,
    se_resnext50_encoder,
)


def config1_unet512():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 512, 512, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def step(x, variables):
        out = model.apply(variables, x)
        return x * (1.0 + 1e-6 * out[0, 0, 0, 0]), jnp.sum(out[:, ::64, ::64])

    xx = x
    xx, s = step(xx, variables)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(5):
        xx, s = step(xx, variables)
        _ = float(s)
    dt = (time.perf_counter() - t0) / 5
    return {"config": 1, "desc": "unet32_512_forward", "ms": round(dt * 1e3, 2),
            "device": jax.devices()[0].platform}


def config3_d4_ms_seresnext_fpn():
    encoder = se_resnext50_encoder()
    model = EncoderDecoderModel(
        encoder=encoder,
        decoder=FPNDecoder(input_spec=encoder.get_output_spec(), out_channels=128),
        head=ResizeHead(
            input_spec=FPNDecoder(
                input_spec=encoder.get_output_spec(), out_channels=128
            ).get_output_spec(),
            num_classes=19,
        ),
    )
    x0 = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 1024, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x0)
    variables = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.bfloat16) if leaf.dtype == jnp.float32 else leaf, variables
    )

    # params ride as an argument: closed-over constants inflate the relay's
    # remote-compile payload (HTTP 413 past ~100 MB)
    @jax.jit
    def step(x, variables):
        def forward(xi):
            out = model.apply(variables, xi.astype(jnp.bfloat16))
            return (out["mask"] if isinstance(out, dict) else out).astype(jnp.float32)

        tta = MultiscaleTTA(lambda xi: d4_image2mask(forward, xi), size_offsets=[0, -256])
        out = tta(x)
        return x * (1.0 + 1e-6 * out[0, 0, 0, 0]), jnp.sum(out[:, ::128, ::128])

    x, s = step(x0, variables)
    _ = float(s)
    t0 = time.perf_counter()
    for _ in range(3):
        x, s = step(x, variables)
        _ = float(s)
    dt = (time.perf_counter() - t0) / 3
    mps = (1024 * 1024) / 1e6 / dt
    return {"config": 3, "desc": "d4_ms_seresnext50_fpn_19c_1024", "ms": round(dt * 1e3, 1),
            "MP/s": round(mps, 2)}


def config5_orthophoto_10k():
    model = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    x_init = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)
    variables = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.bfloat16) if leaf.dtype == jnp.float32 else leaf, variables
    )

    def forward(tiles):
        return model.apply(variables, tiles.astype(jnp.bfloat16))

    image = jax.random.uniform(jax.random.PRNGKey(1), (10000, 10000, 3), jnp.float32)
    jax.block_until_ready(image)
    perturb = jax.jit(lambda img, out: img * (1.0 + 1e-6 * out[0, 0, 0]))

    def run(img):
        return tiled_apply_d4_tta(
            forward, img, tile_size=512, tile_step=256,
            weight="pyramid", batch_size=32, mode="distributed",
        )

    out = run(image)
    image = perturb(image, out)
    out.block_until_ready()
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(image)
        image = perturb(image, out)
    out.block_until_ready()
    _ = float(jnp.sum(out[::512, ::512]))
    dt = (time.perf_counter() - t0) / iters
    return {"config": 5, "desc": "orthophoto_10000_tiled_d4_distributed",
            "ms": round(dt * 1e3, 0), "MP/s": round(100.0 / dt, 2),
            "n_devices": len(jax.devices())}


def main():
    for fn in (config1_unet512, config3_d4_ms_seresnext_fpn, config5_orthophoto_10k):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()
