"""Requant-mode probe for the int8 encoder-decoder path (round 4).

Measures, at config-3 model scale (SEResNeXt50-FPN(128), 19 classes,
256x256 tiles), the fidelity and forward wall-clock of the two integer
requant epilogues in ``zoo/quantized_encdec.py``:

* ``requant="shift"`` — the UNet path's power-of-two shift-only epilogue
  (loses up to one bit of int8 range per layer, which compounds over this
  ~50-conv trunk);
* ``requant="mul"`` — int32 fixed-point multiply+shift with exact
  activation scales (full int8 range at every layer);

each with sequential bias correction on and off.  Fidelity is rel-RMS of
the int8 logits vs the f32 model on (a) the calibration tiles themselves
(pure resolution/compounding error — no range clipping possible) and
(b) held-out tiles (adds calibration-coverage error).

The model is init + a few BN-stat updates ("trained-like", the same
construction the unit tests use) — requant noise depends on weight/
activation DISTRIBUTIONS, not on task skill, and this keeps the probe
self-contained and fast.  The trained-model quality deltas (mIoU) live in
quality_study_config3.py.

Run: python benchmarks/requant_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu.zoo import EncoderDecoderModel, FPNDecoder, ResizeHead
from pytorch_toolbelt_tpu.zoo.encoders.resnet import seresnext50_encoder
from pytorch_toolbelt_tpu.zoo.quantized_encdec import quantize_encoder_decoder_inference

TILE = 256
BATCH = 8
NUM_CLASSES = 19


def main():
    encoder = seresnext50_encoder()
    decoder = FPNDecoder(input_spec=encoder.get_output_spec(), out_channels=128)
    head = ResizeHead(input_spec=decoder.get_output_spec(), num_classes=NUM_CLASSES)
    model = EncoderDecoderModel(encoder=encoder, decoder=decoder, head=head)

    rng = np.random.RandomState(0)
    x_cal = jnp.asarray(rng.rand(BATCH, TILE, TILE, 3).astype(np.float32) * 2 - 1)
    x_held = jnp.asarray(rng.rand(BATCH, TILE, TILE, 3).astype(np.float32) * 2 - 1)

    variables = model.init(jax.random.PRNGKey(0), x_cal[:1])
    _, updates = model.apply(
        variables, x_cal, training=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}

    f_cal = np.asarray(model.apply(variables, x_cal))
    f_held = np.asarray(model.apply(variables, x_held))

    def rel(q, f):
        return float(np.sqrt(np.mean((q - f) ** 2)) / (np.sqrt(np.mean(f**2)) + 1e-12))

    print(f"platform: {jax.devices()[0].platform}  model: SEResNeXt50-FPN(128) "
          f"{NUM_CLASSES}c  tiles: {BATCH}x{TILE}^2")
    print(f"{'mode':>12s} {'bias_corr':>9s} {'relRMS cal':>10s} {'relRMS held':>11s} "
          f"{'fwd ms':>7s}")
    for mode in ("shift", "mul"):
        for bc in (False, True):
            fwd = quantize_encoder_decoder_inference(
                model, variables, x_cal, requant=mode, bias_correction=bc
            )
            q_cal = np.asarray(fwd(x_cal))
            q_held = np.asarray(fwd(x_held))
            jax.block_until_ready(fwd(x_held))
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                out = fwd(x_held)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"{mode:>12s} {str(bc):>9s} {rel(q_cal, f_cal):10.4f} "
                  f"{rel(q_held, f_held):11.4f} {ms:7.1f}")

    # f32 reference forward time for context
    f32 = jax.jit(lambda x: model.apply(variables, x))
    jax.block_until_ready(f32(x_held))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f32(x_held)
    jax.block_until_ready(out)
    print(f"{'f32 (jit)':>12s} {'—':>9s} {'—':>10s} {'—':>11s} "
          f"{(time.perf_counter() - t0) / 10 * 1e3:7.1f}")


if __name__ == "__main__":
    main()
