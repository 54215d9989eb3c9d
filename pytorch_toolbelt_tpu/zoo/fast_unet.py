"""Fused TPU inference paths for ``UNetSegmentationModel``.

Both paths replay the trained model's inference forward from its flax
variables with BatchNorm folded into the convs on host, matching
``model.apply(variables, x, training=False)`` to bf16 tolerance
(tests/test_fast_unet.py; reference semantics modules/unet.py:10-48 +
decoders/unet.py:24-129, ``model.eval()``).

* ``fuse_unet_inference_s2d`` — RECOMMENDED for small-batch serving.
  Pure XLA; runs the stride-1 level in space-to-depth form where its
  lane-starved 32-channel convs become dense 128-channel convs.  Measured
  1.25x over ``model.apply`` at B=32 x 512^2 on v5e; parity (not a win) at
  the B>=64 batches of the tiled d4 pipeline, where XLA's narrow convs
  already run near the pipeline average — see benchmarks/RESULTS.md
  "Round-3 narrow-conv study" for the full batch-dependence measurement.

* ``fuse_unet_inference`` — the ``[B, H, C, W]`` ("HCW") layout variant
  built on the Pallas implicit-GEMM kernel (``ops/conv_kernels``), with
  pool/upsample/concat in HCW and zero hot-loop transposes.  Kept as a
  measured negative result and as the harness for HCW-native pipelines:
  the kernel beats an ISOLATED XLA conv 1.9-2x, but in-model XLA's layout
  freedom reaches the same speed, and this path measures 169 vs 103 ms
  end-to-end against ``model.apply`` (RESULTS.md, same study).
"""

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.activations import ACT_RELU
from ..nn.functional import _linear_weights
from ..nn.normalization import _BATCH_ALIASES
from ..ops.conv_kernels import (
    conv3x3_eligible,
    conv3x3_hcw,
    fold_batchnorm,
    pack_conv3x3_weights,
)

__all__ = ["fuse_unet_inference", "fuse_unet_inference_s2d"]


# ---------------------------------------------------------------------------
# Space-to-depth (s2d) strategy
#
# A 32-channel conv fills 32/128 MXU lanes.  Space-to-depth trades spatial
# resolution for channels: the stride-1 level runs at H/2 x W/2 with 4x the
# channels, where the SAME 3x3 conv is expressible exactly as a 3x3 conv on
# the s2d representation with block-scattered weights (4x the FLOPs — the
# kernel support quadruples — but at dense-conv MXU efficiency, a measured
# net win; see benchmarks/RESULTS.md round-3 narrow-conv study).  Channel
# packing: s2d channel index = (2a + b) * C + c for pixel parity (a, b).
# ---------------------------------------------------------------------------


def _s2d(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with (a, b, c)-major packing."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _d2s(x):
    """Inverse of :func:`_s2d`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


def _s2d_conv_weights(w_hwio, idx_in=None, ci_total=None):
    """[3, 3, C_in, C_out] -> [3, 3, 4*C_in_total, 4*C_out] such that
    conv(s2d(x), w') == s2d(conv(x, w)) for stride-1 SAME convs.

    Derivation: an original tap at offset u = a + dy - 1 lands on s2d cell
    Dy = floor(u/2) with parity a' = u mod 2, so every (a, b) output block
    gathers from at most 3x3 s2d neighbours with parity-remapped weights.

    ``idx_in(a, b, c) -> flat channel`` overrides the input packing — needed
    when the s2d input is a CONCAT of independently-packed tensors (the
    U-Net decoder's upsample+skip concat).
    """
    w = np.asarray(w_hwio, dtype=np.float32)
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"s2d transform expects 3x3 weights, got {kh}x{kw}")
    if idx_in is None:
        idx_in = lambda a, b, c: (2 * a + b) * ci + c  # noqa: E731
    if ci_total is None:
        ci_total = ci
    ws = np.zeros((3, 3, 4 * ci_total, 4 * co), dtype=np.float32)
    for a in range(2):
        for b in range(2):
            out_sl = slice((2 * a + b) * co, (2 * a + b + 1) * co)
            for dy in range(3):
                u = a + dy - 1
                dy_s, ap = u // 2 + 1, u % 2
                for dx in range(3):
                    v = b + dx - 1
                    dx_s, bp = v // 2 + 1, v % 2
                    for c in range(ci):
                        ws[dy_s, dx_s, idx_in(ap, bp, c), out_sl] += w[dy, dx, c, :]
    return jnp.asarray(ws)


def _fold_block(params, stats):
    """UnetBlock scope -> [(w_hwio f32, scale f32, bias f32)] for its 2 convs."""
    out = []
    for i in (0, 1):
        w = params[f"Conv_{i}"]["kernel"].astype(jnp.float32)
        bn = params[f"Normalization_{i}"]["BatchNorm_0"]
        st = stats[f"Normalization_{i}"]["BatchNorm_0"]
        scale, bias = fold_batchnorm(
            bn["scale"].astype(jnp.float32),
            bn["bias"].astype(jnp.float32),
            st["mean"].astype(jnp.float32),
            st["var"].astype(jnp.float32),
        )
        out.append((w, scale, bias))
    return out


class _FusedConv:
    """One conv+BN+ReLU, weights pre-packed for whichever path runs it."""

    def __init__(self, w_hwio, scale, bias, interpret: bool):
        if int(w_hwio.shape[2]) % 8 != 0:  # stem: zero-pad C_in 3 -> 8
            pad = (-int(w_hwio.shape[2])) % 8
            w_hwio = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, pad), (0, 0)))
        self.c_in = int(w_hwio.shape[2])
        self.c_out = int(w_hwio.shape[3])
        self.w_packed = pack_conv3x3_weights(w_hwio)
        self.w_bf16 = w_hwio.astype(jnp.bfloat16)
        self.scale = scale
        self.bias = bias
        self.interpret = interpret

    def __call__(self, x):  # x: [B, H, C, W] bf16
        b, h, c, w = x.shape
        if c < self.c_in:  # stem channel padding
            x = jnp.pad(x, ((0, 0), (0, 0), (0, self.c_in - c), (0, 0)))
        if conv3x3_eligible(h, self.c_in, w, self.c_out):
            return conv3x3_hcw(
                x, self.w_packed, self.scale, self.bias, relu=True, interpret=self.interpret
            )
        y = jax.lax.conv_general_dilated(
            x,
            self.w_bf16,
            (1, 1),
            "SAME",
            dimension_numbers=("NHCW", "HWIO", "NHCW"),
            preferred_element_type=jnp.float32,
        )
        y = y * self.scale[None, None, :, None] + self.bias[None, None, :, None]
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)


def _max_pool_2x2_hcw(x):
    return jnp.maximum(
        jnp.maximum(x[:, 0::2, :, 0::2], x[:, 0::2, :, 1::2]),
        jnp.maximum(x[:, 1::2, :, 0::2], x[:, 1::2, :, 1::2]),
    )


def _upsample_bilinear_hcw(x, out_h: int, out_w: int, align_corners: bool = True):
    """Interpolation-matrix einsums on the H (axis 1) and W (axis 3) dims —
    the HCW twin of nn.functional.resize_bilinear."""
    _, h, _, w = x.shape
    if (out_h, out_w) == (h, w):
        return x
    wh = jnp.asarray(_linear_weights(h, out_h, align_corners, np.float32)).astype(x.dtype)
    ww = jnp.asarray(_linear_weights(w, out_w, align_corners, np.float32)).astype(x.dtype)
    x = jnp.einsum("nhcw,oh->nocw", x, wh)
    return jnp.einsum("nhcw,ow->nhco", x, ww)


def _conv_raw(x, w):
    """Plain XLA NHWC 3x3 SAME conv, fp32 accumulator out."""
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv_nhwc(x, w, scale, bias, relu=True):
    """Plain XLA NHWC conv with folded scale/bias [+ReLU], bf16 out."""
    y = _conv_raw(x, w)
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def _upsample_bilinear_nhwc(x, out_h, out_w, align_corners=True):
    wh = jnp.asarray(_linear_weights(x.shape[1], out_h, align_corners, np.float32)).astype(x.dtype)
    ww = jnp.asarray(_linear_weights(x.shape[2], out_w, align_corners, np.float32)).astype(x.dtype)
    x = jnp.einsum("nhwc,oh->nowc", x, wh)
    return jnp.einsum("nhwc,ow->nhoc", x, ww)


def _upsample_bilinear_to_s2d_cols(x, out_h, out_w, align_corners=True):
    """Bilinear-upsample [B, h, w, C] to (out_h, out_w), emitted as the TWO
    column-parity tensors of the s2d packing WITHOUT materialising the
    full-res tensor: ``cols[b]`` is [B, out_h/2, out_w/2, 2C] with channel
    order [a=0 block | a=1 block].  Row parities ride the channel axis from
    the start so every intermediate is a wide (2C >= 128) well-tiled tensor
    — the naive 4-separate-block form costs 2x memory in XLA layout padding
    at C=64 and OOMs the full-d4 pipeline at batch 128."""
    wh = np.asarray(_linear_weights(x.shape[1], out_h, align_corners, np.float32))
    ww = np.asarray(_linear_weights(x.shape[2], out_w, align_corners, np.float32))
    rows = jnp.concatenate(
        [jnp.einsum("nhwc,oh->nowc", x, jnp.asarray(wh[a::2]).astype(x.dtype)) for a in range(2)],
        axis=-1,
    )  # [B, out_h/2, w, 2C]
    return tuple(
        jnp.einsum("nhwc,ow->nhoc", rows, jnp.asarray(ww[b::2]).astype(x.dtype)) for b in range(2)
    )


def fuse_unet_inference_s2d(model, variables) -> Callable:
    """Pure-XLA fused inference forward that runs the stride-1 level of
    ``UNetSegmentationModel`` in SPACE-TO-DEPTH form.

    The 32-channel convs of the full-resolution level fill 32/128 MXU
    lanes; in s2d form they become dense 128-channel convs at half
    resolution (4x FLOPs at full lane occupancy — a measured net win, see
    benchmarks/RESULTS.md).  All deeper levels run as plain NHWC convs with
    inference-folded BatchNorm.  Matches ``model.apply(variables, x)`` at
    bf16 tolerance (tests/test_fast_unet.py).

    Reference semantics: modules/unet.py:10-48 + decoders/unet.py:24-129 +
    heads (model.eval() forward).
    """
    if model.activation != ACT_RELU:
        raise NotImplementedError("fuse_unet_inference_s2d supports activation='relu' only")
    if model.normalization.lower() not in _BATCH_ALIASES:
        raise NotImplementedError("fuse_unet_inference_s2d supports batch normalization only")

    params = variables["params"]
    stats = variables["batch_stats"]
    num_layers = model.num_layers
    num_stages = num_layers - 1
    c0 = model.encoder_channels

    enc = [
        _fold_block(params["UnetEncoder_0"][f"UnetBlock_{i}"], stats["UnetEncoder_0"][f"UnetBlock_{i}"])
        for i in range(num_layers)
    ]
    dec = [
        _fold_block(params["UNetDecoder_0"][f"UnetBlock_{i}"], stats["UNetDecoder_0"][f"UnetBlock_{i}"])
        for i in range(num_stages)
    ]
    head_w = params["ResizeHead_0"]["Conv_0"]["kernel"]
    head_b = params["ResizeHead_0"]["Conv_0"]["bias"].astype(jnp.float32)
    output_name = model.output_name

    def tile4(v):
        return jnp.tile(v, 4)

    # ---- level-0 weights, transformed to s2d space (host, once) ----
    (w_stem, s_stem, b_stem), (w_e0c1, s_e0c1, b_e0c1) = enc[0]
    w_stem_s = _s2d_conv_weights(w_stem)
    w_e0c1_s = _s2d_conv_weights(w_e0c1)

    # decoder stage 0 (flax block index num_stages-1): input = concat of the
    # upsampled stage-1 output (up_c channels, s2d-packed first) + the level-0
    # skip (c0 channels, s2d-packed second) — scatter weights to match.
    (w_d0c0, s_d0c0, b_d0c0), (w_d0c1, s_d0c1, b_d0c1) = dec[num_stages - 1]
    ci_cat = int(w_d0c0.shape[2])
    up_c = ci_cat - c0

    def idx_cat(a, b, c):
        if c < up_c:
            return (2 * a + b) * up_c + c
        return 4 * up_c + (2 * a + b) * c0 + (c - up_c)

    w_d0c0_s = _s2d_conv_weights(w_d0c0, idx_in=idx_cat, ci_total=ci_cat)
    # split d0c0 over its three input parts (col-parity-0 upsample blocks,
    # col-parity-1 blocks, skip) so the 4*ci_cat-channel concat never
    # materialises: conv(concat(u0, u1, s)) == conv(u0) + conv(u1) + conv(s).
    # _upsample_bilinear_to_s2d_cols packs cols[b] channels as [a=0 | a=1],
    # i.e. original blocks (2a+b) = b and 2+b.
    def col_w(b):
        return jnp.concatenate(
            [w_d0c0_s[:, :, b * up_c : (b + 1) * up_c], w_d0c0_s[:, :, (2 + b) * up_c : (3 + b) * up_c]],
            axis=2,
        )

    w_d0c0_col = (col_w(0), col_w(1))
    w_d0c0_skip = w_d0c0_s[:, :, 4 * up_c :]
    w_d0c1_s = _s2d_conv_weights(w_d0c1)
    w_head_s = _s2d_conv_weights(head_w)

    @jax.jit
    def forward(x):
        in_h, in_w = x.shape[1], x.shape[2]
        x = _s2d(x.astype(jnp.bfloat16))
        x = _conv_nhwc(x, w_stem_s, tile4(s_stem), tile4(b_stem))
        skip0_s2d = _conv_nhwc(x, w_e0c1_s, tile4(s_e0c1), tile4(b_e0c1))

        # pool level0 -> level1: 2x2 max == max over the 4 parity blocks
        b_, h_, w_, _ = skip0_s2d.shape
        x = skip0_s2d.reshape(b_, h_, w_, 4, c0).max(axis=3)

        # deeper encoder levels: plain NHWC
        skips = []
        for layer in range(1, num_layers):
            if layer > 1:
                x = jnp.maximum(
                    jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2]),
                    jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2]),
                )
            for (w, s, b) in enc[layer]:
                x = _conv_nhwc(x, w, s, b)
            skips.append(x)

        # decoder stages coarse -> fine, down to stage 1 in NHWC
        for i in range(num_stages - 1, 0, -1):
            skip = skips[i - 1]  # skips[0] == level-1 output
            x = _upsample_bilinear_nhwc(x, skip.shape[1], skip.shape[2])
            x = jnp.concatenate([x, skip], axis=-1)
            for (w, s, b) in dec[num_stages - 1 - i]:
                x = _conv_nhwc(x, w, s, b)

        # stage 0 in s2d space, d0c0 as a 3-part split conv (see col_w above)
        cols = _upsample_bilinear_to_s2d_cols(x, 2 * x.shape[1], 2 * x.shape[2])
        y = _conv_raw(cols[0], w_d0c0_col[0])
        y = y + _conv_raw(cols[1], w_d0c0_col[1])
        y = y + _conv_raw(skip0_s2d, w_d0c0_skip)
        s4, b4 = tile4(s_d0c0), tile4(b_d0c0)
        x = jnp.maximum(y * s4[None, None, None, :] + b4[None, None, None, :], 0.0).astype(
            jnp.bfloat16
        )
        x = _conv_nhwc(x, w_d0c1_s, tile4(s_d0c1), tile4(b_d0c1))

        # head conv (+bias, no relu) in s2d, then depth-to-space
        y = _conv_nhwc(x, w_head_s, jnp.ones(4 * head_w.shape[3]), tile4(head_b), relu=False)
        y = _d2s(y)
        if (y.shape[1], y.shape[2]) != (in_h, in_w):
            y = _upsample_bilinear_nhwc(y, in_h, in_w, align_corners=False)
        if output_name is not None:
            return {output_name: y}
        return y

    return forward


def fuse_unet_inference(model, variables, *, interpret: bool = False) -> Callable:
    """Build a jitted NHWC->NHWC inference forward for a trained
    ``UNetSegmentationModel`` that runs the narrow convs on the Pallas
    implicit-GEMM kernel.

    Args:
        model: the ``UNetSegmentationModel`` instance (architecture config).
        variables: its flax variables ({'params', 'batch_stats'}).
        interpret: run Pallas in interpreter mode (CPU tests).

    Returns:
        ``forward(x: [B, H, W, 3]) -> [B, H, W, num_classes]`` logits,
        numerically matching ``model.apply(variables, x)`` at bf16
        inference precision.
    """
    if model.activation != ACT_RELU:
        raise NotImplementedError("fuse_unet_inference supports activation='relu' only")
    if model.normalization.lower() not in _BATCH_ALIASES:
        raise NotImplementedError("fuse_unet_inference supports batch normalization only")
    if getattr(model, "dropout_rate", 0.0):
        # inference dropout is identity; the flag only matters for training
        pass

    params = variables["params"]
    stats = variables["batch_stats"]
    num_layers = model.num_layers

    enc_blocks: List[List[_FusedConv]] = []
    for i in range(num_layers):
        folded = _fold_block(
            params["UnetEncoder_0"][f"UnetBlock_{i}"],
            stats["UnetEncoder_0"][f"UnetBlock_{i}"],
        )
        enc_blocks.append([_FusedConv(w, s, b, interpret) for (w, s, b) in folded])

    dec_blocks: List[List[_FusedConv]] = []
    for i in range(num_layers - 1):
        folded = _fold_block(
            params["UNetDecoder_0"][f"UnetBlock_{i}"],
            stats["UNetDecoder_0"][f"UnetBlock_{i}"],
        )
        dec_blocks.append([_FusedConv(w, s, b, interpret) for (w, s, b) in folded])

    head_w = params["ResizeHead_0"]["Conv_0"]["kernel"].astype(jnp.bfloat16)
    head_b = params["ResizeHead_0"]["Conv_0"]["bias"].astype(jnp.float32)
    output_name = model.output_name

    @jax.jit
    def forward(x):
        in_h, in_w = x.shape[1], x.shape[2]
        x = jnp.transpose(x.astype(jnp.bfloat16), (0, 1, 3, 2))  # NHWC -> NHCW (C=3: cheap)
        skips = []
        for layer, convs in enumerate(enc_blocks):
            if layer > 0:
                x = _max_pool_2x2_hcw(x)
            for conv in convs:
                x = conv(x)
            skips.append(x)
        # decoder: coarse -> fine.  Flax names the decoder blocks in creation
        # (= coarse-first) order, so stage i's convs live at UnetBlock_{N-1-i}.
        num_stages = num_layers - 1
        for i in range(num_stages - 1, -1, -1):
            skip = skips[i]
            x = _upsample_bilinear_hcw(x, skip.shape[1], skip.shape[3])
            x = jnp.concatenate([x, skip], axis=2)
            for conv in dec_blocks[num_stages - 1 - i]:
                x = conv(x)
        # head: 3x3 conv + bias (num_classes is narrow: XLA path in HCW)
        y = jax.lax.conv_general_dilated(
            x,
            head_w,
            (1, 1),
            "SAME",
            dimension_numbers=("NHCW", "HWIO", "NHCW"),
            preferred_element_type=jnp.float32,
        )
        y = y + head_b[None, None, :, None]
        if (y.shape[1], y.shape[3]) != (in_h, in_w):  # ResizeHead output resize
            y = _upsample_bilinear_hcw(y, in_h, in_w, align_corners=False)
        out = jnp.transpose(y, (0, 1, 3, 2)).astype(jnp.bfloat16)  # -> NHWC
        if output_name is not None:
            return {output_name: out}
        return out

    return forward
