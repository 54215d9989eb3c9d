"""Round-3 narrow-conv study: why UNet-32's 32-channel convs are slow, what
actually fixes them, and what only *looks* like it fixes them.

Reproduces the measurements behind RESULTS.md "Round-3 narrow-conv study".
Cases (each prints one line; full run is ~30-45 min of remote compiles):

  0. dispatch-floor : the axon-relay per-dispatch overhead (~2.4 ms) that
     inflated round-2's small-op timings (lane_occupancy_probe case A was
     measured AT the floor, so its "9 TFLOP/s" was a lower bound artifact).
  1. conv-isolated  : [B32,512,512,32]->32 conv, in-jit scan chain (true
     device time): XLA NHWC vs the Pallas implicit-GEMM kernel
     (ops/conv_kernels.conv3x3_hcw).
  2. conv-in-model  : the same conv inside compiled context — isolated
     2-conv block vs an 8-conv chain vs the UNet encoder.  XLA's layout
     freedom in-model recovers most of the gap on its own.
  3. s2d            : equivalent work as a dense 128-channel conv at half
     resolution (space-to-depth: 4x FLOPs, full MXU lanes).
  4. model-e2e      : UNetSegmentationModel.apply vs fuse_unet_inference
     (HCW/Pallas) vs fuse_unet_inference_s2d at the bench shape B32x512^2.

Run: python benchmarks/narrow_conv_study.py [case ...]   (default: all)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 32, 512, 512, 32
FLOPS = 2 * B * H * W * 9 * C * C
SCAN_LEN = 10


def _sync(t):
    return float(jnp.asarray(t).ravel()[0])


def _scan_time(body, x):
    """True device time per op: SCAN_LEN chained applications in ONE jit, so
    neither relay dispatch overhead nor result dedup can contaminate it."""

    @jax.jit
    def chain(a):
        return jax.lax.scan(body, a, None, length=SCAN_LEN)[0]

    y = chain(x)
    _sync(y)
    t0 = time.perf_counter()
    y = chain(y)
    _sync(y)
    return (time.perf_counter() - t0) / SCAN_LEN


def _chain_time(fn, x, iters=8):
    """Per-call wall time including one relay dispatch (inputs chained
    through a scalar perturbation so the relay cannot dedup)."""
    perturb = jax.jit(
        lambda img, out: (img * (1.0 + 1e-6 * out.ravel()[0].astype(jnp.float32))).astype(img.dtype)
    )
    y = fn(x)
    x = perturb(x, y)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
        x = perturb(x, y)
    _sync(y)
    return (time.perf_counter() - t0) / iters


def _conv_body(w):
    def f(c, _):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y, 0).astype(jnp.bfloat16), ()

    return f


def case_dispatch_floor(rng):
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: a * 1.000001 + 1e-9)
    t = _chain_time(f, x, iters=20)
    print(f"dispatch-floor: {t*1e3:.2f} ms per chained trivial dispatch")


def case_conv_isolated(rng):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.05, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    t = _scan_time(_conv_body(w), x)
    print(f"conv-isolated xla-nhwc : {t*1e3:6.2f} ms  {FLOPS/t/1e12:5.1f} TF/s")

    from pytorch_toolbelt_tpu.ops.conv_kernels import conv3x3_hcw, pack_conv3x3_weights

    xk = jnp.transpose(x, (0, 1, 3, 2))  # -> HCW
    wp = pack_conv3x3_weights(w.astype(jnp.float32))
    sc, bi = jnp.ones((C,)), jnp.zeros((C,))

    def body(c, _):
        return conv3x3_hcw(c, wp, sc, bi, relu=True), ()

    t = _scan_time(body, xk)
    print(f"conv-isolated pallas   : {t*1e3:6.2f} ms  {FLOPS/t/1e12:5.1f} TF/s")


def case_conv_in_model(rng):
    import flax.linen as nn

    from pytorch_toolbelt_tpu.nn.unet import UnetBlock
    from pytorch_toolbelt_tpu.zoo.encoders.unet import UnetEncoder

    def bf16(v):
        return jax.tree_util.tree_map(
            lambda l: l.astype(jnp.bfloat16) if l.dtype == jnp.float32 else l, v
        )

    xb = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

    blk = UnetBlock(out_channels=C)
    vb = bf16(blk.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C))))
    t = _chain_time(jax.jit(lambda a: blk.apply(vb, a)), xb)
    print(f"in-model 1 block (2 convs) : {t*1e3:6.1f} ms  {2*FLOPS/t/1e12:5.1f} TF/s")

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, t_):
            for _ in range(4):
                t_ = UnetBlock(out_channels=C)(t_)
            return t_

    ch = Chain()
    vc = bf16(ch.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C))))
    t = _chain_time(jax.jit(lambda a: ch.apply(vc, a)), xb)
    print(f"in-model 4 blocks (8 convs): {t*1e3:6.1f} ms  {8*FLOPS/t/1e12:5.1f} TF/s")

    enc = UnetEncoder(out_channels=C, num_layers=4, growth_factor=2)
    ve = bf16(enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))))
    x3 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    t = _chain_time(jax.jit(lambda a: enc.apply(ve, a.astype(jnp.bfloat16))[0]), x3)
    print(f"in-model full encoder      : {t*1e3:6.1f} ms  ({0.862/t:5.1f} TF/s avg)")


def case_s2d(rng):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.05, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    t = _scan_time(_conv_body(w), x)
    print(f"s2d A direct 32ch@512^2    : {t*1e3:6.2f} ms  ({FLOPS/t/1e12:.1f} eff TF/s)")

    xs = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, 4 * C)) * 0.05, jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal((3, 3, 4 * C, 4 * C)) * 0.05, jnp.bfloat16)
    t = _scan_time(_conv_body(ws), xs)
    print(
        f"s2d B dense 128ch@256^2    : {t*1e3:6.2f} ms  "
        f"({FLOPS/t/1e12:.1f} eff TF/s, {4*FLOPS/t/1e12:.1f} actual)"
    )


def case_model_e2e(rng):
    from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel
    from pytorch_toolbelt_tpu.zoo.fast_unet import fuse_unet_inference, fuse_unet_inference_s2d

    m = UNetSegmentationModel(num_classes=1, encoder_channels=32, growth_factor=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    v = jax.tree_util.tree_map(
        lambda l: l.astype(jnp.bfloat16) if l.dtype == jnp.float32 else l, v
    )
    x = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    mp = B * H * W / 1e6

    t = _chain_time(jax.jit(lambda a: m.apply(v, a.astype(jnp.bfloat16))), x)
    print(f"e2e model.apply            : {t*1e3:6.1f} ms  ({mp/t:5.1f} MP/s)")
    t = _chain_time(fuse_unet_inference_s2d(m, v), x)
    print(f"e2e fused s2d              : {t*1e3:6.1f} ms  ({mp/t:5.1f} MP/s)")
    t = _chain_time(fuse_unet_inference(m, v), x)
    print(f"e2e fused hcw/pallas       : {t*1e3:6.1f} ms  ({mp/t:5.1f} MP/s)")


CASES = {
    "dispatch-floor": case_dispatch_floor,
    "conv-isolated": case_conv_isolated,
    "conv-in-model": case_conv_in_model,
    "s2d": case_s2d,
    "model-e2e": case_model_e2e,
}


def main():
    names = sys.argv[1:] or list(CASES)
    rng = np.random.default_rng(0)
    for name in names:
        CASES[name](rng)


if __name__ == "__main__":
    main()
