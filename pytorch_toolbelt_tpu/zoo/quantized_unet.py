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

__all__ = ["quantize_unet_inference"]

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

    params = variables["params"]
    stats = variables["batch_stats"]
    num_layers = model.num_layers
    num_stages = num_layers - 1

    def folded(scope, i, n):
        # fold BN INTO the weights: y = conv(x, W)*s + b == conv(x, W*s) + b
        out = []
        for (w, s, b) in _fold_block(params[scope][f"UnetBlock_{i}"], stats[scope][f"UnetBlock_{i}"]):
            out.append((np.asarray(w, np.float64) * np.asarray(s, np.float64)[None, None, None, :], np.asarray(b, np.float64)))
        return out

    enc = [folded("UnetEncoder_0", i, num_layers) for i in range(num_layers)]
    dec = [folded("UNetDecoder_0", i, num_stages) for i in range(num_stages)]
    head_w = np.asarray(params["ResizeHead_0"]["Conv_0"]["kernel"], np.float64)
    head_b = np.asarray(params["ResizeHead_0"]["Conv_0"]["bias"], np.float64)

    # ---- calibration: folded f32 replay, recording per-channel absmax ----
    x_cal = jnp.asarray(calibration_images, jnp.float32)
    amax = {}

    def cal_conv(x, w, b, key):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w, jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b, jnp.float32)[None, None, None, :]
        y = jnp.maximum(y, 0.0)
        amax[key] = np.asarray(jnp.abs(y).max(axis=(0, 1, 2)), np.float64) * margin
        return y

    def cal_upsample(x, oh, ow):
        wh = jnp.asarray(_linear_weights(x.shape[1], oh, True, np.float32))
        ww = jnp.asarray(_linear_weights(x.shape[2], ow, True, np.float32))
        return jnp.einsum("nhwc,ow->nhoc", jnp.einsum("nhwc,oh->nowc", x, wh), ww)

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
