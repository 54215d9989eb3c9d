"""Post-training int8 quantized inference for ``UNetSegmentationModel``.

The v5e MXU runs int8 x int8 -> int32 convolutions measurably faster than
bf16 at these shapes, and int8 activations halve the HBM traffic of a
pipeline that sits near its bandwidth floor — but a naive f32
dequant/requant epilogue costs MORE than it saves (measured 207 ms vs the
78 ms bf16 reference for an 8-conv chain; benchmarks/RESULTS.md "Round-3
narrow-conv study").  This module therefore keeps the ENTIRE network in
the integer domain, TFLite-style:

* weights: per-output-channel symmetric int8;
* every real-valued scale (input scale, BatchNorm fold, weight scales,
  requant shifts) is absorbed into the NEXT layer's weight quantization,
  which is exact — a conv is linear in each input channel, so the
  consumer's weights simply pre-multiply the producer's per-channel scale;
* epilogues are integer-only: int32 bias add, int32 ReLU, per-channel
  round-half-up arithmetic shift (activation scales are powers of two
  relative to the accumulator), clip, int8 — the measured-fast form;
* bilinear upsampling runs as int8 interpolation-matrix einsums
  (matrices quantized to round(M * 127); the 127^2-vs-2^14 requant factor
  is folded into the tracked scale, so it introduces NO systematic error);
* 2x2 max-pool and channel concat are scale-exact in int8;
* only the image input (one quantize) and the head logits (one dequant on
  ``num_classes`` channels) touch float.

Activation ranges come from a short calibration run of the folded f32
model (per-channel absmax post-ReLU).  Shift-only activation quantization
costs at most one bit of range utilisation per channel vs an optimal
scale; the resulting quality delta is measured, not assumed — see
tests/test_quantized_unet.py and benchmarks/RESULTS.md.

Reference semantics quantized: modules/unet.py:10-48 +
decoders/unet.py:24-129 inference forward (the torch reference has no
quantized path; this is a TPU-native extension).
"""

from typing import Callable, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.activations import ACT_RELU
from ..nn.functional import _linear_weights
from ..nn.normalization import _BATCH_ALIASES
from .fast_unet import _fold_block

__all__ = ["quantize_unet_inference", "quantize_unet_inference_s2d"]

_QMAX = 127


class _QConv(NamedTuple):
    """One quantized conv+bias(+ReLU) with its integer epilogue constants."""

    w_q: jnp.ndarray  # [3, 3, ci, co] int8
    b_q: jnp.ndarray  # [co] int32
    shift: jnp.ndarray  # [co] int32
    rnd: jnp.ndarray  # [co] int32  (1 << (shift-1), 0 where shift == 0)
    sigma_out: np.ndarray  # [co] f64 — real scale of the int8 output


def _quantize_conv(w_eff, bias, amax_real, relu=True):
    """Quantize folded weights W_eff (input scales already absorbed) and
    derive the integer epilogue from the calibrated output range."""
    w_eff = np.asarray(w_eff, np.float64)
    bias = np.asarray(bias, np.float64)
    amax_real = np.asarray(amax_real, np.float64)
    sw = np.abs(w_eff).max(axis=(0, 1, 2)) / _QMAX
    sw = np.maximum(sw, 1e-12)
    w_q = np.clip(np.round(w_eff / sw), -_QMAX, _QMAX).astype(np.int8)
    b_q = np.round(bias / sw).astype(np.int64).clip(-(2**31), 2**31 - 1).astype(np.int32)
    amax_int = amax_real / sw
    shift = np.ceil(np.log2(np.maximum(amax_int / _QMAX, 1.0))).astype(np.int32)
    rnd = np.where(shift > 0, (1 << np.maximum(shift - 1, 0)), 0).astype(np.int32)
    sigma_out = sw * np.exp2(shift)
    return _QConv(
        jnp.asarray(w_q), jnp.asarray(b_q), jnp.asarray(shift), jnp.asarray(rnd), sigma_out
    ), relu


_MUL_SHIFT = 23  # fixed-point bits of the multiplier requant (see _quantize_conv_mul)


class _QConvMul(NamedTuple):
    """Quantized conv whose epilogue is an int32 fixed-point multiply+shift
    requant instead of a power-of-two shift — full int8 range utilisation
    at every layer (shift-only wastes up to one bit of range per layer,
    which compounds over deep trunks)."""

    w_q: jnp.ndarray  # [kh, kw, ci, co] int8
    b_q: jnp.ndarray  # [co] int32
    mult: jnp.ndarray  # [co] int32 — requant multiplier, scale = 2^_MUL_SHIFT/mult
    clamp: jnp.ndarray  # [co] int32 — pre-multiply accumulator clamp (overflow guard)
    sigma_out: np.ndarray  # [co] f64 — EXACT real scale of the int8 output


def _quantize_conv_mul(w_eff, bias, amax_real):
    """Like :func:`_quantize_conv` but with an exact-scale integer requant.

    The requant factor f = QMAX/amax_int is represented as mult/2^23.  The
    accumulator is pre-clamped per channel to (2^31-1-rnd)/mult, which by
    construction is ~2x the calibrated range — values there would clip to
    +-127 after requant anyway, so the clamp is lossless.  mult*amax_int is
    ~127*2^23 ~ 2^30 for every channel, so the int32 product never
    overflows, and sigma_out = sw*2^23/mult is exact for downstream
    absorption.  Cost vs shift-only: one extra int32 clamp+multiply per
    element, fused into the conv epilogue by XLA (parity measured on the
    config-3 pipeline, benchmarks/RESULTS.md)."""
    w_eff = np.asarray(w_eff, np.float64)
    bias = np.asarray(bias, np.float64)
    amax_real = np.asarray(amax_real, np.float64)
    sw = np.abs(w_eff).max(axis=(0, 1, 2)) / _QMAX
    sw = np.maximum(sw, 1e-12)
    w_q = np.clip(np.round(w_eff / sw), -_QMAX, _QMAX).astype(np.int8)
    b_q = np.round(bias / sw).astype(np.int64).clip(-(2**31), 2**31 - 1).astype(np.int32)
    amax_int = np.maximum(amax_real / sw, 1.0)
    mult = np.maximum(np.round(_QMAX / amax_int * (1 << _MUL_SHIFT)), 1.0)
    clamp = np.floor((2.0**31 - 1 - (1 << (_MUL_SHIFT - 1))) / mult)
    sigma_out = sw * float(1 << _MUL_SHIFT) / mult
    return _QConvMul(
        jnp.asarray(w_q),
        jnp.asarray(b_q),
        jnp.asarray(mult.astype(np.int32)),
        jnp.asarray(clamp.astype(np.int32)),
        sigma_out,
    )


def _requant_mul(acc, qc: _QConvMul):
    """int32 accumulator -> int8 via clamp, fixed-point multiply, shift."""
    c = qc.clamp[None, None, None, :]
    acc = jnp.clip(acc, -c, c)
    acc = acc * qc.mult[None, None, None, :]
    acc = jax.lax.shift_right_arithmetic(acc + (1 << (_MUL_SHIFT - 1)), _MUL_SHIFT)
    return jnp.clip(acc, -_QMAX, _QMAX).astype(jnp.int8)


def _qconv_apply(x_q, qc: _QConv, relu=True):
    acc = jax.lax.conv_general_dilated(
        x_q,
        qc.w_q,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    acc = acc + qc.b_q[None, None, None, :]
    if relu:
        acc = jnp.maximum(acc, 0)
    acc = jax.lax.shift_right_arithmetic(acc + qc.rnd[None, None, None, :], qc.shift[None, None, None, :])
    return jnp.clip(acc, -_QMAX, _QMAX).astype(jnp.int8)


def _q_maxpool(x_q):
    return jnp.maximum(
        jnp.maximum(x_q[:, 0::2, 0::2], x_q[:, 0::2, 1::2]),
        jnp.maximum(x_q[:, 1::2, 0::2], x_q[:, 1::2, 1::2]),
    )


def _q_upsample_matrices(in_h, in_w, out_h, out_w):
    """Quantized bilinear (align_corners=True, the decoder default)
    interpolation matrices and the exact scale factor they introduce."""
    mh = np.round(_linear_weights(in_h, out_h, True, np.float64) * _QMAX)
    mw = np.round(_linear_weights(in_w, out_w, True, np.float64) * _QMAX)
    # two einsums x127 each, two >>7 requants: sigma multiplier (2^7/127)^2
    return (
        jnp.asarray(mh.astype(np.int8)),
        jnp.asarray(mw.astype(np.int8)),
        (128.0 / _QMAX) ** 2,
    )


def _q_upsample(x_q, mh, mw):
    rows = jnp.einsum(
        "nhwc,oh->nowc", x_q, mh, preferred_element_type=jnp.int32
    )
    rows = jnp.clip(jax.lax.shift_right_arithmetic(rows + 64, 7), -_QMAX, _QMAX).astype(jnp.int8)
    cols = jnp.einsum(
        "nhwc,ow->nhoc", rows, mw, preferred_element_type=jnp.int32
    )
    return jnp.clip(jax.lax.shift_right_arithmetic(cols + 64, 7), -_QMAX, _QMAX).astype(jnp.int8)


def _calibrate_unet(model, variables, calibration_images, margin: float):
    """Fold BN into weights (f64) and record per-channel post-activation
    absmax from one folded f32 replay over the calibration batch.

    Returns (enc, dec, head_w, head_b, amax, input_amax) where enc/dec are
    per-block lists of (w_eff, bias) and amax is keyed ("enc"|"dec", i, j).
    Shared by the NHWC and the space-to-depth int8 builders."""
    params = variables["params"]
    stats = variables["batch_stats"]
    num_layers = model.num_layers
    num_stages = num_layers - 1

    def folded(scope, i):
        out = []
        for (w, s, b) in _fold_block(params[scope][f"UnetBlock_{i}"], stats[scope][f"UnetBlock_{i}"]):
            out.append(
                (
                    np.asarray(w, np.float64) * np.asarray(s, np.float64)[None, None, None, :],
                    np.asarray(b, np.float64),
                )
            )
        return out

    enc = [folded("UnetEncoder_0", i) for i in range(num_layers)]
    dec = [folded("UNetDecoder_0", i) for i in range(num_stages)]
    head_w = np.asarray(params["ResizeHead_0"]["Conv_0"]["kernel"], np.float64)
    head_b = np.asarray(params["ResizeHead_0"]["Conv_0"]["bias"], np.float64)

    x_cal = jnp.asarray(calibration_images, jnp.float32)
    amax = {}

    # Calibration is offline: force true-f32 contractions.  On TPU the
    # backend's DEFAULT precision runs f32 convs as single-pass bf16,
    # which contaminates both the activation ranges and the
    # bias-correction error estimates (round-5 finding: the round-4
    # config-3 fidelity figure was inflated by exactly this).
    _HI = jax.lax.Precision.HIGHEST

    def cal_conv(x, w, b, key):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI,
        ) + jnp.asarray(b, jnp.float32)[None, None, None, :]
        y = jnp.maximum(y, 0.0)
        amax[key] = np.asarray(jnp.abs(y).max(axis=(0, 1, 2)), np.float64) * margin
        return y

    def cal_upsample(x, oh, ow):
        wh = jnp.asarray(_linear_weights(x.shape[1], oh, True, np.float32))
        ww = jnp.asarray(_linear_weights(x.shape[2], ow, True, np.float32))
        return jnp.einsum(
            "nhwc,ow->nhoc",
            jnp.einsum("nhwc,oh->nowc", x, wh, precision=_HI), ww, precision=_HI,
        )

    x = x_cal
    skips_cal = []
    for layer in range(num_layers):
        if layer > 0:
            x = jnp.maximum(
                jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2]),
                jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2]),
            )
        for j, (w, b) in enumerate(enc[layer]):
            x = cal_conv(x, w, b, ("enc", layer, j))
        skips_cal.append(x)
    for i in range(num_stages - 1, -1, -1):
        skip = skips_cal[i]
        x = cal_upsample(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        for j, (w, b) in enumerate(dec[num_stages - 1 - i]):
            x = cal_conv(x, w, b, ("dec", i, j))
    input_amax = float(jnp.abs(x_cal).max()) * margin
    return enc, dec, head_w, head_b, amax, input_amax


def quantize_unet_inference(
    model, variables, calibration_images, *, margin: float = 1.0
) -> Callable:
    """Build a fully-integer jitted inference forward for a trained
    ``UNetSegmentationModel``.

    Args:
        model: the architecture config (relu + batch norm only).
        variables: trained flax variables ({'params', 'batch_stats'}).
        calibration_images: [N, H, W, 3] float array of representative
            inputs; per-channel activation ranges are read from one folded
            f32 forward over this batch.  H and W need not match the
            inference size (the quantized upsample matrices are built per
            trace from the jit-static activation shapes), but calibration
            statistics transfer best from similar content at any size.
        margin: multiplier on calibrated ranges (>1 guards against
            calibration undershoot at the cost of range utilisation).

    Returns:
        ``forward(x: [B, H, W, 3] float) -> [B, H, W, num_classes] float32``
        logits approximating ``model.apply(variables, x)`` at int8
        post-training-quantization fidelity.
    """
    if model.activation != ACT_RELU:
        raise NotImplementedError("quantize_unet_inference supports activation='relu' only")
    if model.normalization.lower() not in _BATCH_ALIASES:
        raise NotImplementedError("quantize_unet_inference supports batch normalization only")

    num_layers = model.num_layers
    num_stages = num_layers - 1
    enc, dec, head_w, head_b, amax, input_amax = _calibrate_unet(
        model, variables, calibration_images, margin
    )

    # ---- build the integer network, tracking per-channel real scales ----
    sigma_in = np.full(calibration_images.shape[-1], max(input_amax, 1e-12) / _QMAX)

    def build_conv(w_eff, b, key, sigma):
        w_abs = w_eff * sigma[None, None, :, None]  # absorb input scales
        qc, _ = _quantize_conv(w_abs, b, amax[key])
        return qc, qc.sigma_out

    q_enc: List[List[_QConv]] = []
    sig = sigma_in
    sig_skips = []
    for layer in range(num_layers):
        row = []
        for j, (w, b) in enumerate(enc[layer]):
            qc, sig = build_conv(w, b, ("enc", layer, j), sig)
            row.append(qc)
        q_enc.append(row)
        sig_skips.append(sig)
    q_dec: List[List[_QConv]] = []
    # The int8 interpolation matrices introduce a SHAPE-INDEPENDENT scale
    # multiplier ((2^7/127)^2 — see _q_upsample_matrices), so the weight
    # quantization below is valid for any inference spatial size; the
    # matrices themselves are built at trace time from the jit-static
    # activation shapes, decoupling calibration size from inference size.
    up_mult = (128.0 / _QMAX) ** 2
    for i in range(num_stages - 1, -1, -1):
        sig = np.concatenate([sig * up_mult, sig_skips[i]])
        row = []
        for j, (w, b) in enumerate(dec[num_stages - 1 - i]):
            qc, sig = build_conv(w, b, ("dec", i, j), sig)
            row.append(qc)
        q_dec.append(row)
    # head: dequant directly from the int32 accumulator
    head_eff = head_w * sig[None, None, :, None]
    sw_head = np.maximum(np.abs(head_eff).max(axis=(0, 1, 2)) / _QMAX, 1e-12)
    head_wq = jnp.asarray(np.clip(np.round(head_eff / sw_head), -_QMAX, _QMAX).astype(np.int8))
    head_sw = jnp.asarray(sw_head, jnp.float32)
    head_bias = jnp.asarray(head_b, jnp.float32)
    inv_sigma_in = jnp.asarray(1.0 / sigma_in, jnp.float32)
    output_name = model.output_name

    @jax.jit
    def forward(x):
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) * inv_sigma_in[None, None, None, :]), -_QMAX, _QMAX
        ).astype(jnp.int8)
        skips = []
        for layer in range(num_layers):
            if layer > 0:
                x_q = _q_maxpool(x_q)
            for qc in q_enc[layer]:
                x_q = _qconv_apply(x_q, qc)
            skips.append(x_q)
        for idx, i in enumerate(range(num_stages - 1, -1, -1)):
            skip = skips[i]
            mh, mw, _ = _q_upsample_matrices(
                x_q.shape[1], x_q.shape[2], skip.shape[1], skip.shape[2]
            )
            x_q = _q_upsample(x_q, mh, mw)
            x_q = jnp.concatenate([x_q, skip], axis=-1)
            for qc in q_dec[idx]:
                x_q = _qconv_apply(x_q, qc)
        acc = jax.lax.conv_general_dilated(
            x_q, head_wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * head_sw[None, None, None, :] + head_bias[None, None, None, :]
        if output_name is not None:
            return {output_name: y}
        return y

    return forward


# ---------------------------------------------------------------------------
# Space-to-depth int8 variant
# ---------------------------------------------------------------------------


def quantize_unet_inference_s2d(
    model, variables, calibration_images, *, margin: float = 1.0
) -> Callable:
    """Fully-integer inference forward with the STRIDE-1 LEVEL in
    space-to-depth form.

    Motivation (benchmarks/int8_s2d_probe.py, real chip): a 32-channel int8
    3x3 conv runs at 9.1 TOP/s — even more lane-starved than its bf16 twin
    (the int8 MXU wants 2x the elements per lane) — while the
    s2d-equivalent dense 128-channel conv runs at 121.9 TOP/s: 3.34x
    faster per unit of original work despite 4x the FLOPs.  Since the
    stride-1 level dominates the UNet's FLOPs, this variant rebuilds
    ``quantize_unet_inference``'s network with the level-0 convs, decoder
    stage 0 and the head in the s2d representation (exact 3x3-conv
    identity with block-scattered weights — zoo/fast_unet.py), everything
    else unchanged.

    Quantization deltas vs the NHWC builder:

    * level-0 activation scales are shared across the four spatial-parity
      blocks (the s2d weight blocks contain the same filter taps, so the
      per-channel weight scales agree across blocks automatically) — the
      2x2 max-pool into level 1 (a max across parity blocks) stays
      scale-exact;
    * the decoder's upsample+concat runs as the int8 twin of
      ``_upsample_bilinear_to_s2d_cols``: parity-sliced int8 interpolation
      matrices emit the two column-parity tensors, and the stage-0 conv is
      a 3-part split conv (cols0 + cols1 + skip) whose parts share one
      per-output-channel weight scale so their int32 accumulators add
      exactly;
    * the head dequantizes from int32, depth-to-spaces in f32, and resizes
      only if the input size was odd (s2d needs even spatial dims).
    """
    from .fast_unet import _s2d_conv_weights

    if model.activation != ACT_RELU:
        raise NotImplementedError("quantize_unet_inference_s2d supports activation='relu' only")
    if model.normalization.lower() not in _BATCH_ALIASES:
        raise NotImplementedError("quantize_unet_inference_s2d supports batch normalization only")

    num_layers = model.num_layers
    num_stages = num_layers - 1
    c0 = model.encoder_channels
    enc, dec, head_w, head_b, amax, input_amax = _calibrate_unet(
        model, variables, calibration_images, margin
    )

    def tile4(v):
        return np.concatenate([np.asarray(v, np.float64)] * 4)

    sigma_in = np.full(calibration_images.shape[-1], max(input_amax, 1e-12) / _QMAX)
    sigma_in_s2d = tile4(sigma_in)

    def build_conv(w_eff, b, amax_out, sigma):
        w_abs = np.asarray(w_eff, np.float64) * np.asarray(sigma, np.float64)[None, None, :, None]
        qc, _ = _quantize_conv(w_abs, b, amax_out)
        return qc, qc.sigma_out

    # ---- level 0 in s2d space ----
    (w_stem, b_stem), (w_e0c1, b_e0c1) = enc[0]
    q_stem, sig = build_conv(
        np.asarray(_s2d_conv_weights(w_stem)), tile4(b_stem),
        tile4(amax[("enc", 0, 0)]), sigma_in_s2d,
    )
    q_e0c1, sig_skip0 = build_conv(
        np.asarray(_s2d_conv_weights(w_e0c1)), tile4(b_e0c1),
        tile4(amax[("enc", 0, 1)]), sig,
    )
    sig = sig_skip0[:c0]  # block-max pool: per-original-channel scale

    # ---- deeper encoder levels: plain NHWC int8 ----
    q_enc = []
    sig_skips = []
    for layer in range(1, num_layers):
        row = []
        for j, (w, b) in enumerate(enc[layer]):
            qc, sig = build_conv(w, b, amax[("enc", layer, j)], sig)
            row.append(qc)
        q_enc.append(row)
        sig_skips.append(sig)

    # ---- decoder stages down to stage 1: plain NHWC int8 ----
    up_mult = (128.0 / _QMAX) ** 2
    q_dec = []
    for i in range(num_stages - 1, 0, -1):
        sig = np.concatenate([sig * up_mult, sig_skips[i - 1]])
        row = []
        for j, (w, b) in enumerate(dec[num_stages - 1 - i]):
            qc, sig = build_conv(w, b, amax[("dec", i, j)], sig)
            row.append(qc)
        q_dec.append(row)

    # ---- decoder stage 0 in s2d space: 3-part split conv ----
    (w_d0c0, b_d0c0), (w_d0c1, b_d0c1) = dec[num_stages - 1]
    ci_cat = int(w_d0c0.shape[2])
    up_c = ci_cat - c0
    co_d0 = int(w_d0c0.shape[3])

    def idx_cat(a, b, c):
        if c < up_c:
            return (2 * a + b) * up_c + c
        return 4 * up_c + (2 * a + b) * c0 + (c - up_c)

    w_d0c0_s = np.asarray(_s2d_conv_weights(w_d0c0, idx_in=idx_cat, ci_total=ci_cat), np.float64)

    def col_w(b):
        return np.concatenate(
            [w_d0c0_s[:, :, b * up_c : (b + 1) * up_c], w_d0c0_s[:, :, (2 + b) * up_c : (3 + b) * up_c]],
            axis=2,
        )

    sig_cols = np.concatenate([sig, sig]) * up_mult  # [2*up_c], cols packed [a=0 | a=1]
    parts = [
        col_w(0) * sig_cols[None, None, :, None],
        col_w(1) * sig_cols[None, None, :, None],
        w_d0c0_s[:, :, 4 * up_c :] * np.asarray(sig_skip0)[None, None, :, None],
    ]
    sw_d0 = np.maximum(
        np.max([np.abs(p).max(axis=(0, 1, 2)) for p in parts], axis=0) / _QMAX, 1e-12
    )
    d0_wq = [
        jnp.asarray(np.clip(np.round(p / sw_d0), -_QMAX, _QMAX).astype(np.int8)) for p in parts
    ]
    d0_bq = jnp.asarray(
        np.round(tile4(b_d0c0) / sw_d0).astype(np.int64).clip(-(2**31), 2**31 - 1).astype(np.int32)
    )
    amax_d0 = tile4(amax[("dec", 0, 0)])
    d0_shift = np.ceil(np.log2(np.maximum(amax_d0 / sw_d0 / _QMAX, 1.0))).astype(np.int32)
    d0_rnd = np.where(d0_shift > 0, (1 << np.maximum(d0_shift - 1, 0)), 0).astype(np.int32)
    sig = sw_d0 * np.exp2(d0_shift)
    d0_shift = jnp.asarray(d0_shift)
    d0_rnd = jnp.asarray(d0_rnd)

    q_d0c1, sig = build_conv(
        np.asarray(_s2d_conv_weights(w_d0c1)), tile4(b_d0c1), tile4(amax[("dec", 0, 1)]), sig
    )

    # ---- head in s2d space: int32 acc -> f32 dequant ----
    head_eff = np.asarray(_s2d_conv_weights(head_w), np.float64) * sig[None, None, :, None]
    sw_head = np.maximum(np.abs(head_eff).max(axis=(0, 1, 2)) / _QMAX, 1e-12)
    head_wq = jnp.asarray(np.clip(np.round(head_eff / sw_head), -_QMAX, _QMAX).astype(np.int8))
    head_sw = jnp.asarray(sw_head, jnp.float32)
    head_bias = jnp.asarray(tile4(head_b), jnp.float32)
    inv_sigma_in = jnp.asarray(1.0 / sigma_in, jnp.float32)
    output_name = model.output_name
    num_classes = int(head_w.shape[-1])

    def _s2d_int8(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // 2, w // 2, 4 * c)

    def _d2s_f32(x):
        b, h, w, c4 = x.shape
        c = c4 // 4
        x = x.reshape(b, h, w, 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * 2, w * 2, c)

    @jax.jit
    def forward(x):
        in_h, in_w = x.shape[1], x.shape[2]
        if in_h % 2 or in_w % 2:
            raise ValueError("quantize_unet_inference_s2d needs even input spatial dims")
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) * inv_sigma_in[None, None, None, :]), -_QMAX, _QMAX
        ).astype(jnp.int8)
        x_q = _s2d_int8(x_q)
        x_q = _qconv_apply(x_q, q_stem)
        skip0 = _qconv_apply(x_q, q_e0c1)  # [B, H/2, W/2, 4*c0]

        bb, hh, ww, _ = skip0.shape
        x_q = skip0.reshape(bb, hh, ww, 4, c0).max(axis=3)

        skips = []
        for layer in range(num_layers - 1):
            if layer > 0:
                x_q = _q_maxpool(x_q)
            for qc in q_enc[layer]:
                x_q = _qconv_apply(x_q, qc)
            skips.append(x_q)

        for idx, i in enumerate(range(num_stages - 1, 0, -1)):
            skip = skips[i - 1]
            mh, mw, _ = _q_upsample_matrices(
                x_q.shape[1], x_q.shape[2], skip.shape[1], skip.shape[2]
            )
            x_q = _q_upsample(x_q, mh, mw)
            x_q = jnp.concatenate([x_q, skip], axis=-1)
            for qc in q_dec[idx]:
                x_q = _qconv_apply(x_q, qc)

        # stage 0: upsample emitted as the two column-parity s2d tensors
        mh, mw, _ = _q_upsample_matrices(
            x_q.shape[1], x_q.shape[2], 2 * x_q.shape[1], 2 * x_q.shape[2]
        )
        rows = jnp.concatenate(
            [
                jnp.clip(
                    jax.lax.shift_right_arithmetic(
                        jnp.einsum("nhwc,oh->nowc", x_q, mh[a::2], preferred_element_type=jnp.int32)
                        + 64,
                        7,
                    ),
                    -_QMAX, _QMAX,
                ).astype(jnp.int8)
                for a in range(2)
            ],
            axis=-1,
        )  # [B, H/2, W, 2*up_c]
        acc = None
        for b_par in range(2):
            col = jnp.clip(
                jax.lax.shift_right_arithmetic(
                    jnp.einsum("nhwc,ow->nhoc", rows, mw[b_par::2], preferred_element_type=jnp.int32)
                    + 64,
                    7,
                ),
                -_QMAX, _QMAX,
            ).astype(jnp.int8)
            part = jax.lax.conv_general_dilated(
                col, d0_wq[b_par], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
        acc = acc + jax.lax.conv_general_dilated(
            skip0, d0_wq[2], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        acc = acc + d0_bq[None, None, None, :]
        acc = jnp.maximum(acc, 0)
        acc = jax.lax.shift_right_arithmetic(acc + d0_rnd[None, None, None, :], d0_shift[None, None, None, :])
        x_q = jnp.clip(acc, -_QMAX, _QMAX).astype(jnp.int8)

        x_q = _qconv_apply(x_q, q_d0c1)

        acc = jax.lax.conv_general_dilated(
            x_q, head_wq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * head_sw[None, None, None, :] + head_bias[None, None, None, :]
        y = _d2s_f32(y)
        if output_name is not None:
            return {output_name: y}
        return y

    return forward
