"""Post-training int8 quantized inference for ``EncoderDecoderModel``
pipelines (ResNet-family trunk + FPN decoder + resize head) — the
generalization of ``quantized_unet.py`` to BASELINE config 3's model class
(SEResNeXt50-FPN, 19 classes).

Same TPU-native design rules as the UNet path (see quantized_unet.py for
the measurements that dictated them): the network stays in the integer
domain end to end, weights are per-output-channel symmetric int8 with the
producer's activation scales absorbed exactly into the consumer's weights,
and conv epilogues are integer-only requants.  Unlike the UNet path (8
convs), this trunk chains ~50 convs, so requant round-off compounds;
the default epilogue is therefore an int32 fixed-point multiply+shift
(``requant="mul"``, exact activation scales, full int8 range per layer)
rather than the UNet's power-of-two shift-only form (``requant="shift"``,
up to one bit of range lost per layer) — measured fidelity and speed for
both in benchmarks/RESULTS.md.  Three structures the UNet does not have
get explicit treatment:

* **Residual adds** (BasicBlock/Bottleneck shortcuts, FPN top-down sums):
  the two addends carry unrelated per-channel scales, so shift-only
  alignment is impossible.  Each addend is requantized to the add's
  calibrated output scale with a per-channel int32 fixed-point multiplier
  (``round(sigma_in/sigma_out * 2^12)``) — still integer-only; the float
  multiply never touches a full activation.
* **SE gates**: the squeeze path (GAP -> fc -> relu -> fc -> sigmoid) runs
  in f32 on the pooled [B, 1, 1, C] vector (negligible — ~C values per
  image) and the excitation becomes an integer multiply by
  ``round(gate * 2^14)`` with a >>14 requant; since gate <= 1 the
  activation scale is preserved exactly.
* **Bias-only convs** (FPN laterals/prediction convs, heads — no BN, no
  ReLU): quantized like conv+BN but with signed calibrated ranges.

Only the image input (one quantize) and the head logits (one dequant at
the head's stride-4 resolution, before the f32 output resize) touch float.

Reference semantics quantized: seresnet.py:33-126 (trunk) +
decoders/fpn.py:13-88 + heads/resize.py:11-82 inference forward (the torch
reference has no quantized path; this is a TPU-native extension).
"""

from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.functional import _linear_weights
from .decoders.fpn import FPNDecoder
from .encoders.resnet import ResNetEncoder
from .heads.resize import ResizeHead
from .models import EncoderDecoderModel
from .quantized_unet import (
    _QMAX,
    _q_upsample,
    _q_upsample_matrices,
    _quantize_conv,
    _quantize_conv_mul,
    _requant_mul,
)

__all__ = ["quantize_encoder_decoder_inference", "attribute_quantization_error"]

_ADD_SHIFT = 12  # fixed-point bits for residual-add requant multipliers
_SE_SHIFT = 14  # fixed-point bits for the SE excitation multiply


# ---------------------------------------------------------------------------
# Graph IR: the architecture is built ONCE as a list of nodes, then
# interpreted three times — f32 calibration replay, scale propagation /
# constant building, and the jitted int8 forward.  One structure, no
# divergence between the replays.
# ---------------------------------------------------------------------------


class _Node:
    __slots__ = ("op", "inputs", "attrs", "id")

    def __init__(self, op: str, inputs: List[int], **attrs):
        self.op = op
        self.inputs = inputs
        self.attrs = attrs
        self.id = None  # assigned by _Graph.add


class _Graph:
    def __init__(self):
        self.nodes: List[_Node] = []

    def add(self, op: str, inputs: List[int], **attrs) -> int:
        node = _Node(op, inputs, **attrs)
        node.id = len(self.nodes)
        self.nodes.append(node)
        return node.id


def _fold_conv_bn(params, stats, conv_name: str, bn_name: str):
    """conv (no bias) + BatchNorm -> (w_eff f64, bias f64)."""
    w = np.asarray(params[conv_name]["kernel"], np.float64)
    bn = params[bn_name]["BatchNorm_0"] if "BatchNorm_0" in params.get(bn_name, {}) else params[bn_name]
    st = stats[bn_name]["BatchNorm_0"] if "BatchNorm_0" in stats.get(bn_name, {}) else stats[bn_name]
    scale = np.asarray(bn["scale"], np.float64)
    bias = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(st["mean"], np.float64)
    var = np.asarray(st["var"], np.float64)
    s = scale / np.sqrt(var + 1e-5)
    return w * s[None, None, None, :], bias - mean * s


def _conv_with_bias(params, conv_name: str):
    w = np.asarray(params[conv_name]["kernel"], np.float64)
    b = np.asarray(params[conv_name].get("bias", np.zeros(w.shape[-1])), np.float64)
    return w, b


def _build_resnet_graph(g: _Graph, enc: ResNetEncoder, params, stats, x_id: int) -> List[int]:
    """Append the ResNetEncoder inference graph; return feature-map node ids."""
    conv_i = [0]
    bn_i = [0]

    def next_conv():
        name = f"Conv_{conv_i[0]}"
        conv_i[0] += 1
        return name

    def next_bn():
        name = f"BatchNorm_{bn_i[0]}"
        bn_i[0] += 1
        return name

    outputs = []
    if enc.deep_stem:
        w, b = _fold_conv_bn(params, stats, next_conv(), next_bn())
        x_id = g.add("conv", [x_id], w=w, b=b, stride=2, groups=1, relu=True, pad="SAME")
        w, b = _fold_conv_bn(params, stats, next_conv(), next_bn())
        x_id = g.add("conv", [x_id], w=w, b=b, stride=1, groups=1, relu=True, pad="SAME")
        w, b = _fold_conv_bn(params, stats, next_conv(), next_bn())
        x_id = g.add("conv", [x_id], w=w, b=b, stride=1, groups=1, relu=True, pad="SAME")
    else:
        w, b = _fold_conv_bn(params, stats, next_conv(), next_bn())
        x_id = g.add("conv", [x_id], w=w, b=b, stride=2, groups=1, relu=True, pad=((3, 3), (3, 3)))
    outputs.append(x_id)

    x_id = g.add("maxpool3s2", [x_id])

    block_prefix = "Bottleneck" if enc.bottleneck else "BasicBlock"
    block_index = 0
    for stage_index, num_blocks in enumerate(enc.stage_blocks):
        stage_stride = 1 if stage_index == 0 else 2
        for bi in range(num_blocks):
            bp = params[f"{block_prefix}_{block_index}"]
            bs = stats[f"{block_prefix}_{block_index}"]
            stride = stage_stride if bi == 0 else 1
            residual_id = x_id
            if enc.bottleneck:
                w, b = _fold_conv_bn(bp, bs, "Conv_0", "BatchNorm_0")
                y = g.add("conv", [x_id], w=w, b=b, stride=1, groups=1, relu=True, pad="SAME")
                w, b = _fold_conv_bn(bp, bs, "Conv_1", "BatchNorm_1")
                y = g.add("conv", [y], w=w, b=b, stride=stride, groups=enc.groups, relu=True, pad="SAME")
                w, b = _fold_conv_bn(bp, bs, "Conv_2", "BatchNorm_2")
                y = g.add("conv", [y], w=w, b=b, stride=1, groups=1, relu=False, pad="SAME")
                down_conv = "Conv_3"
                down_bn = "BatchNorm_3"
            else:
                w, b = _fold_conv_bn(bp, bs, "Conv_0", "BatchNorm_0")
                y = g.add("conv", [x_id], w=w, b=b, stride=stride, groups=1, relu=True, pad="SAME")
                w, b = _fold_conv_bn(bp, bs, "Conv_1", "BatchNorm_1")
                y = g.add("conv", [y], w=w, b=b, stride=1, groups=1, relu=False, pad="SAME")
                down_conv = "Conv_2"
                down_bn = "BatchNorm_2"
            if enc.use_se:
                se = bp["_SEModule_0"]
                w1, b1 = _conv_with_bias(se, "Conv_0")
                w2, b2 = _conv_with_bias(se, "Conv_1")
                y = g.add("se", [y], w1=w1, b1=b1, w2=w2, b2=b2)
            if down_conv in bp:  # projection shortcut
                sc_in = residual_id
                sc_stride = stride
                if enc.avg_down and stride > 1:
                    sc_in = g.add("avgpool2", [sc_in])
                    sc_stride = 1
                w, b = _fold_conv_bn(bp, bs, down_conv, down_bn)
                residual_id = g.add(
                    "conv", [sc_in], w=w, b=b, stride=sc_stride, groups=1, relu=False, pad="SAME"
                )
            x_id = g.add("add", [y, residual_id], relu=True)
            block_index += 1
        outputs.append(x_id)

    if enc.layers is not None:
        outputs = [outputs[i] for i in enc.layers]
    return outputs


def _build_fpn_graph(g: _Graph, dec: FPNDecoder, params, fm_ids: List[int]) -> List[int]:
    n = len(fm_ids)
    lateral = []
    for i, fm in enumerate(fm_ids):
        w, b = _conv_with_bias(params, f"Conv_{i}")
        lateral.append(g.add("conv", [fm], w=w, b=b, stride=1, groups=1, relu=False, pad="SAME"))
    outputs = [lateral[-1]]
    pred_i = n
    for index in range(n - 2, -1, -1):
        up = g.add("upsample2", [outputs[-1]])
        fused = g.add("add", [lateral[index], up], relu=False)
        if dec.prediction_kernel > 0:
            w, b = _conv_with_bias(params, f"Conv_{pred_i}")
            pred_i += 1
            fused = g.add("conv", [fused], w=w, b=b, stride=1, groups=1, relu=False, pad="SAME")
        outputs.append(fused)
    return outputs[::-1]


def _node_amax(y: jnp.ndarray, mode: str, percentile: float) -> np.ndarray:
    """Per-channel clip range of one calibration activation.

    * ``absmax``     — exact max |y| (round-4 behavior; no clipping error,
      maximal rounding step).
    * ``percentile`` — the ``percentile``-th percentile of |y|: trades a
      little clipping error on outliers for a finer grid on the bulk.
    * ``mse``        — per-channel grid search over 0.5..1.0 x absmax for
      the clip value minimizing quantize-dequantize MSE on the
      calibration batch (the optimal square-error tradeoff).
    """
    a = jnp.abs(y)
    axes = tuple(range(y.ndim - 1))
    absmax = jnp.max(a, axis=axes)
    if mode == "absmax":
        return np.asarray(absmax, np.float64)
    if mode == "percentile":
        pct = np.asarray(jnp.percentile(a, percentile, axis=axes), np.float64)
        # sparse post-relu channels (fewer than 1-percentile nonzeros) have
        # a zero percentile; an amax of 0 would give a degenerate ~1e-14
        # scale that saturates every real activation to +-127.  Floor the
        # clip at a small fraction of absmax so sparsity clips, not erases.
        return np.maximum(pct, np.asarray(absmax, np.float64) * 1e-3)
    if mode == "mse":
        factors = np.linspace(0.5, 1.0, 11)
        errs = []
        for f in factors:
            s = jnp.maximum(absmax * f, 1e-12) / _QMAX
            q = jnp.clip(jnp.round(y / s), -_QMAX, _QMAX) * s
            errs.append(jnp.mean((q - y) ** 2, axis=axes))
        best = np.argmin(np.asarray(jnp.stack(errs)), axis=0)
        return np.asarray(absmax, np.float64) * factors[best]
    raise ValueError(f"calibration must be 'absmax', 'percentile' or 'mse'; got {mode!r}")


def _build_encdec_graph(model: EncoderDecoderModel, variables):
    """Shared graph construction (checked preconditions + IR) for the
    quantizer and the attribution probe."""
    enc, dec, head = model.encoder, model.decoder, model.head
    if not isinstance(enc, ResNetEncoder):
        raise NotImplementedError(
            "quantize_encoder_decoder_inference supports ResNetEncoder-family trunks; "
            f"got {type(enc).__name__}"
        )
    if not isinstance(dec, FPNDecoder):
        raise NotImplementedError(f"decoder must be FPNDecoder; got {type(dec).__name__}")
    if str(getattr(dec.upsample_block, "value", dec.upsample_block)).lower() not in (
        "bilinear", "upsampielayertype.bilinear",
    ):
        raise NotImplementedError("FPN upsample must be bilinear for the int8 path")
    if not isinstance(head, ResizeHead):
        raise NotImplementedError(f"head must be ResizeHead; got {type(head).__name__}")

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    g = _Graph()
    input_id = g.add("input", [])
    fm_ids = _build_resnet_graph(g, enc, params["encoder"], stats["encoder"], input_id)
    fpn_ids = _build_fpn_graph(g, dec, params["decoder"], fm_ids)
    head_index = dec.get_output_spec().get_index_of_largest_feature_map()
    w, b = _conv_with_bias(params["head"], "Conv_0")
    head_id = g.add("head", [fpn_ids[head_index]], w=w, b=b)
    return g, input_id, head_id


# Calibration is offline: force true-f32 contractions (on TPU the default
# precision runs f32 convs as single-pass bf16, contaminating activation
# ranges and bias-correction estimates — round-5 finding).
_HI = jax.lax.Precision.HIGHEST


def _f32_exec(node, vals, align_corners: bool, out_hw):
    """Execute one graph node in f32 (the calibration-replay semantics)."""
    if node.op == "conv":
        y = jax.lax.conv_general_dilated(
            vals[node.inputs[0]],
            jnp.asarray(node.attrs["w"], jnp.float32),
            (node.attrs["stride"],) * 2,
            node.attrs["pad"],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=node.attrs["groups"],
            precision=_HI,
        ) + jnp.asarray(node.attrs["b"], jnp.float32)[None, None, None, :]
        if node.attrs["relu"]:
            y = jax.nn.relu(y)
        return y
    if node.op == "maxpool3s2":
        import flax.linen as nn

        return nn.max_pool(vals[node.inputs[0]], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    if node.op == "avgpool2":
        import flax.linen as nn

        return nn.avg_pool(vals[node.inputs[0]], (2, 2), strides=(2, 2))
    if node.op == "se":
        x = vals[node.inputs[0]]
        pooled = x.mean(axis=(1, 2), keepdims=True)
        h = jax.nn.relu(
            jax.lax.conv_general_dilated(
                pooled, jnp.asarray(node.attrs["w1"], jnp.float32), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI,
            ) + jnp.asarray(node.attrs["b1"], jnp.float32)
        )
        gate = jax.nn.sigmoid(
            jax.lax.conv_general_dilated(
                h, jnp.asarray(node.attrs["w2"], jnp.float32), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI,
            ) + jnp.asarray(node.attrs["b2"], jnp.float32)
        )
        return x * gate
    if node.op == "add":
        y = vals[node.inputs[0]] + vals[node.inputs[1]]
        if node.attrs["relu"]:
            y = jax.nn.relu(y)
        return y
    if node.op == "upsample2":
        x = vals[node.inputs[0]]
        wh = jnp.asarray(_linear_weights(x.shape[1], 2 * x.shape[1], True, np.float32))
        ww = jnp.asarray(_linear_weights(x.shape[2], 2 * x.shape[2], True, np.float32))
        return jnp.einsum(
            "nhwc,ow->nhoc",
            jnp.einsum("nhwc,oh->nowc", x, wh, precision=_HI), ww, precision=_HI,
        )
    if node.op == "head":
        y = jax.lax.conv_general_dilated(
            vals[node.inputs[0]], jnp.asarray(node.attrs["w"], jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI,
        ) + jnp.asarray(node.attrs["b"], jnp.float32)[None, None, None, :]
        wh = jnp.asarray(_linear_weights(y.shape[1], out_hw[0], align_corners, np.float32))
        ww = jnp.asarray(_linear_weights(y.shape[2], out_hw[1], align_corners, np.float32))
        return jnp.einsum(
            "nhwc,ow->nhoc",
            jnp.einsum("nhwc,oh->nowc", y, wh, precision=_HI), ww, precision=_HI,
        )
    raise AssertionError(node.op)  # pragma: no cover


def _absorb_grouped(w_eff, sig_in, groups):
    """Absorb per-channel input scales into the conv weights (grouped-aware)."""
    ci_pg = w_eff.shape[2]
    co = w_eff.shape[3]
    if groups == 1:
        return w_eff * sig_in[None, None, :, None]
    sig_grp = sig_in.reshape(groups, ci_pg)
    per_out = np.empty((ci_pg, co))
    co_pg = co // groups
    for gi in range(groups):
        per_out[:, gi * co_pg : (gi + 1) * co_pg] = sig_grp[gi][:, None]
    return w_eff * per_out[None, None, :, :]


def _simulate_conv_int8(node, x_f32, sig_in, amax_out):
    """One conv executed with int8 input/weights/output on f32 surroundings
    (the single-layer PTQ simulation used by the attribution probe):
    quantize the input with the producer's scale, absorb it into the
    weights, per-output-channel int8 weights, f32 epilogue, then snap the
    output onto its own int8 grid."""
    w_abs = _absorb_grouped(node.attrs["w"], sig_in, node.attrs["groups"])
    sw = np.maximum(np.abs(w_abs).max(axis=(0, 1, 2)) / _QMAX, 1e-12)
    w_q = np.clip(np.round(w_abs / sw), -_QMAX, _QMAX)
    x_q = jnp.clip(
        jnp.round(x_f32 / jnp.asarray(sig_in, jnp.float32)), -_QMAX, _QMAX
    )
    acc = jax.lax.conv_general_dilated(
        x_q, jnp.asarray(w_q, jnp.float32),
        (node.attrs["stride"],) * 2, node.attrs["pad"],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=node.attrs["groups"],
        precision=_HI,
    )
    y = acc * jnp.asarray(sw, jnp.float32) + jnp.asarray(node.attrs["b"], jnp.float32)
    if node.attrs["relu"]:
        y = jax.nn.relu(y)
    sig_out = jnp.asarray(np.maximum(amax_out, 1e-12) / _QMAX, jnp.float32)
    return jnp.clip(jnp.round(y / sig_out), -_QMAX, _QMAX) * sig_out


def attribute_quantization_error(
    model: EncoderDecoderModel,
    variables,
    calibration_images,
    *,
    margin: float = 1.0,
    calibration: str = "absmax",
    percentile: float = 99.9,
) -> List[dict]:
    """Per-layer PTQ error attribution (VERDICT r4 #4).

    For each conv node of the graph, quantize THAT LAYER ALONE (int8
    input/weights/output; everything else f32) and measure the resulting
    final-logits rel-RMS against the pure-f32 replay.  Non-conv nodes
    (adds, SE gates, upsamples) are attributed with their output
    snapped onto the int8 grid, isolating the activation-grid component.

    Returns a list of ``{"node": id, "op": str, "rel_rms": float}`` sorted
    most-damaging first — the ranking ``fallback_convs`` uses.
    """
    g, input_id, head_id = _build_encdec_graph(model, variables)
    head = model.head
    x_cal = jnp.asarray(calibration_images, jnp.float32)
    out_hw = (int(x_cal.shape[1]), int(x_cal.shape[2]))

    vals: Dict[int, jnp.ndarray] = {input_id: x_cal}
    amax: Dict[int, np.ndarray] = {}
    for node in g.nodes:
        if node.op == "input":
            continue
        y = _f32_exec(node, vals, head.interpolation_align_corners, out_hw)
        vals[node.id] = y
        amax[node.id] = _node_amax(y, calibration, percentile) * margin
    input_amax = _node_amax(x_cal, calibration, percentile) * margin
    return _rank_single_layer_errors(
        g, input_id, head_id, head.interpolation_align_corners, out_hw,
        vals, amax, input_amax,
    )


def _rank_single_layer_errors(
    g, input_id, head_id, align_corners, out_hw, vals, amax, input_amax, ops=None
) -> List[dict]:
    """Shared single-layer-replay ranking used by both the public
    attribution probe and the ``fallback_convs`` selection (one
    implementation: fixes to the replay apply to both)."""
    f_ref = vals[head_id]
    ref_norm = float(jnp.sqrt(jnp.mean(f_ref**2))) + 1e-12

    rows = []
    for k_node in g.nodes:
        if k_node.op in ("input", "maxpool3s2", "avgpool2", "head"):
            continue
        if ops is not None and k_node.op not in ops:
            continue
        src = k_node.inputs[0]
        sig_in = np.maximum(input_amax if src == input_id else amax[src], 1e-12) / _QMAX
        if k_node.op == "conv":
            y_q = _simulate_conv_int8(k_node, vals[src], sig_in, amax[k_node.id])
        else:
            sig_out = jnp.asarray(np.maximum(amax[k_node.id], 1e-12) / _QMAX, jnp.float32)
            y_q = jnp.clip(jnp.round(vals[k_node.id] / sig_out), -_QMAX, _QMAX) * sig_out
        # replay downstream in f32 (node ids are topological)
        vals_k = dict(vals)
        vals_k[k_node.id] = y_q
        for node in g.nodes[k_node.id + 1 :]:
            if node.op == "input":
                continue
            vals_k[node.id] = _f32_exec(node, vals_k, align_corners, out_hw)
        err = float(jnp.sqrt(jnp.mean((vals_k[head_id] - f_ref) ** 2))) / ref_norm
        rows.append({"node": k_node.id, "op": k_node.op, "rel_rms": err})
    rows.sort(key=lambda r: r["rel_rms"], reverse=True)
    return rows


def quantize_encoder_decoder_inference(
    model: EncoderDecoderModel,
    variables,
    calibration_images,
    *,
    margin: float = 1.0,
    requant: str = "mul",
    bias_correction: bool = True,
    calibration: str = "absmax",
    percentile: float = 99.9,
    fallback_convs: int = 0,
    fallback_nodes: Optional[Iterable[int]] = None,
) -> Callable:
    """Build a fully-integer jitted inference forward for a trained
    ``EncoderDecoderModel`` with a ResNet-family encoder (incl. SE /
    ResNeXt / ResNet-D flavors), an ``FPNDecoder`` and a ``ResizeHead``.

    Args:
        model: the trained model's architecture config.
        variables: its flax variables ({'params', 'batch_stats'}).
        calibration_images: [N, H, W, 3] float array of representative
            inputs for activation-range calibration.
        margin: multiplier on calibrated ranges.
        requant: ``"mul"`` (default) uses an int32 fixed-point
            multiply+shift requant per conv — exact activation scales, full
            int8 range at every layer; ``"shift"`` uses the power-of-two
            shift-only epilogue of the UNet path (up to one bit of range
            lost per layer, which compounds over this 50-conv trunk).
            Both are integer-only in the hot loop.
        bias_correction: when True (default), a second calibration pass runs
            the int8 graph node by node alongside the retained f32
            activations and absorbs each conv's per-channel mean quantization
            error into its integer bias (the head's into its f32 bias) —
            sequential PTQ bias correction.  Removes the systematic
            component of requant noise at zero inference cost.
        calibration: activation-range estimator — ``"absmax"`` (default),
            ``"percentile"`` (the ``percentile``-th percentile of |y|), or
            ``"mse"`` (per-channel clip minimizing quantize-dequantize MSE
            on the calibration batch).  See ``_node_amax``.
        percentile: percentile for ``calibration="percentile"``.
        fallback_convs: keep the K most-damaging conv layers (ranked by
            the single-layer attribution probe on the calibration batch —
            ``attribute_quantization_error``) in f32: their int8 inputs are
            dequantized, the conv runs in float with the folded weights,
            and the output is re-quantized onto its calibrated int8 grid
            so the rest of the graph stays integer.  Mixed-precision PTQ
            fallback; 0 (default) = fully integer.
        fallback_nodes: explicit conv node ids to keep in f32 (as returned
            by ``attribute_quantization_error``'s ``node`` field) — skips
            the internal attribution pass; overrides ``fallback_convs``.

    Returns:
        ``forward(x) -> [B, H, W, num_classes] float32`` logits
        approximating ``model.apply(variables, x)`` at int8 PTQ fidelity.
    """
    g, input_id, head_id = _build_encdec_graph(model, variables)
    head = model.head

    # ---- f32 calibration replay over the SAME graph ---------------------
    x_cal = jnp.asarray(calibration_images, jnp.float32)
    cal_hw_out = (int(x_cal.shape[1]), int(x_cal.shape[2]))
    amax: Dict[int, np.ndarray] = {}
    vals: Dict[int, jnp.ndarray] = {input_id: x_cal}
    for node in g.nodes:
        if node.op == "input":
            continue
        y = _f32_exec(node, vals, head.interpolation_align_corners, cal_hw_out)
        vals[node.id] = y
        amax[node.id] = _node_amax(y, calibration, percentile) * margin
    cal_out = vals[head_id]  # kept for tests/debugging via closure
    input_amax = _node_amax(x_cal, calibration, percentile) * margin

    # ---- mixed-precision fallback selection ------------------------------
    f32_nodes: set = set()
    if fallback_nodes is not None:
        f32_nodes = {int(i) for i in fallback_nodes}
        bad = [i for i in f32_nodes if i >= len(g.nodes) or g.nodes[i].op != "conv"]
        if bad:
            raise ValueError(f"fallback_nodes must be conv node ids; bad: {sorted(bad)}")
    elif fallback_convs > 0:
        rows = _rank_single_layer_errors(
            g, input_id, head_id, head.interpolation_align_corners, cal_hw_out,
            vals, amax, input_amax, ops=("conv",),
        )
        f32_nodes = {r["node"] for r in rows[:fallback_convs]}
    if not bias_correction:
        del vals

    # ---- scale propagation + integer constants --------------------------
    sigma: Dict[int, np.ndarray] = {input_id: np.maximum(input_amax, 1e-12) / _QMAX}
    consts: Dict[int, dict] = {}
    inv_sigma_in = jnp.asarray(1.0 / sigma[input_id], jnp.float32)
    out_align = head.interpolation_align_corners
    output_name = head.output_name

    # ---- shared int8 node executor ---------------------------------------
    # Runs one graph node in the integer domain given the consts built so
    # far; used EAGERLY on the calibration batch (bias correction) and
    # TRACED under jit (the inference forward) — one implementation, no
    # divergence between the calibration replay and the deployed program.

    def quantize_input(x):
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) * inv_sigma_in[None, None, None, :]),
            -_QMAX, _QMAX,
        ).astype(jnp.int8)

    def conv_acc(node, x_q):
        """Raw int32 conv accumulator WITHOUT bias (reused across the
        bias-correction re-epilogue)."""
        qc = consts[node.id]["qc"]
        return jax.lax.conv_general_dilated(
            x_q, qc.w_q,
            (node.attrs["stride"],) * 2, node.attrs["pad"],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=node.attrs["groups"],
            preferred_element_type=jnp.int32,
        )

    def conv_epilogue(node, acc):
        qc = consts[node.id]["qc"]
        acc = acc + qc.b_q[None, None, None, :]
        if node.attrs["relu"]:
            acc = jnp.maximum(acc, 0)
        if requant == "mul":
            return _requant_mul(acc, qc)
        acc = jax.lax.shift_right_arithmetic(
            acc + qc.rnd[None, None, None, :], qc.shift[None, None, None, :]
        )
        return jnp.clip(acc, -_QMAX, _QMAX).astype(jnp.int8)

    def exec_node(node, vals_q, resize_hw):
        if node.op == "conv":
            c = consts[node.id]
            if "f32" in c:  # mixed-precision fallback layer
                x = vals_q[node.inputs[0]].astype(jnp.float32) * c["sig_in"][None, None, None, :]
                y = jax.lax.conv_general_dilated(
                    x, c["w"],
                    (node.attrs["stride"],) * 2, node.attrs["pad"],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=node.attrs["groups"],
                ) + c["b"][None, None, None, :]
                if node.attrs["relu"]:
                    y = jax.nn.relu(y)
                return jnp.clip(
                    jnp.round(y * c["inv_sig_out"][None, None, None, :]), -_QMAX, _QMAX
                ).astype(jnp.int8)
            return conv_epilogue(node, conv_acc(node, vals_q[node.inputs[0]]))
        if node.op == "maxpool3s2":
            return jax.lax.reduce_window(
                vals_q[node.inputs[0]], jnp.int8(-128), jax.lax.max,
                (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
        if node.op == "avgpool2":
            x4 = vals_q[node.inputs[0]].astype(jnp.int32)
            s = x4[:, 0::2, 0::2] + x4[:, 0::2, 1::2] + x4[:, 1::2, 0::2] + x4[:, 1::2, 1::2]
            return jnp.clip(jax.lax.shift_right_arithmetic(s + 2, 2), -_QMAX, _QMAX).astype(jnp.int8)
        if node.op == "se":
            c = consts[node.id]
            x_q = vals_q[node.inputs[0]]
            pooled = x_q.astype(jnp.float32).mean(axis=(1, 2), keepdims=True) * c["sig_in"]
            h = jax.nn.relu(
                jax.lax.conv_general_dilated(
                    pooled, c["w1"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + c["b1"]
            )
            gate = jax.nn.sigmoid(
                jax.lax.conv_general_dilated(
                    h, c["w2"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + c["b2"]
            )
            gate_q = jnp.round(gate * (1 << _SE_SHIFT)).astype(jnp.int32)
            acc = x_q.astype(jnp.int32) * gate_q
            acc = jax.lax.shift_right_arithmetic(acc + (1 << (_SE_SHIFT - 1)), _SE_SHIFT)
            return jnp.clip(acc, -_QMAX, _QMAX).astype(jnp.int8)
        if node.op == "add":
            c = consts[node.id]
            acc = (
                vals_q[node.inputs[0]].astype(jnp.int32) * c["ma"][None, None, None, :]
                + vals_q[node.inputs[1]].astype(jnp.int32) * c["mb"][None, None, None, :]
            )
            if node.attrs["relu"]:
                acc = jnp.maximum(acc, 0)
            acc = jax.lax.shift_right_arithmetic(acc + (1 << (_ADD_SHIFT - 1)), _ADD_SHIFT)
            return jnp.clip(acc, -_QMAX, _QMAX).astype(jnp.int8)
        if node.op == "upsample2":
            x_q = vals_q[node.inputs[0]]
            mh, mw, _ = _q_upsample_matrices(
                x_q.shape[1], x_q.shape[2], 2 * x_q.shape[1], 2 * x_q.shape[2]
            )
            return _q_upsample(x_q, mh, mw)
        if node.op == "head":
            c = consts[node.id]
            acc = jax.lax.conv_general_dilated(
                vals_q[node.inputs[0]], c["w_q"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            logits = (
                acc.astype(jnp.float32) * c["sw"][None, None, None, :]
                + c["bias"][None, None, None, :]
            )
            wh = jnp.asarray(_linear_weights(logits.shape[1], resize_hw[0], out_align, np.float32))
            ww = jnp.asarray(_linear_weights(logits.shape[2], resize_hw[1], out_align, np.float32))
            return jnp.einsum("nhwc,ow->nhoc", jnp.einsum("nhwc,oh->nowc", logits, wh), ww)
        raise AssertionError(node.op)  # pragma: no cover

    # ---- constants builder (+ optional sequential bias correction) ------
    # vals_q carries the int8 calibration activations through the graph so
    # each conv's per-channel mean error vs the retained f32 activations can
    # be absorbed into its integer bias BEFORE its consumers are calibrated.
    vals_q: Optional[Dict[int, jnp.ndarray]] = (
        {input_id: quantize_input(x_cal)} if bias_correction else None
    )
    cal_hw = (int(x_cal.shape[1]), int(x_cal.shape[2]))

    for node in g.nodes:
        if node.op == "input":
            continue
        if node.op == "conv":
            sig_in = sigma[node.inputs[0]]
            if node.id in f32_nodes:
                # mixed-precision fallback: f32 conv on dequantized input,
                # output snapped back onto its calibrated int8 grid
                sig_out = np.maximum(amax[node.id], 1e-12) / _QMAX
                consts[node.id] = {
                    "f32": True,
                    "w": jnp.asarray(node.attrs["w"], jnp.float32),
                    "b": jnp.asarray(node.attrs["b"], jnp.float32),
                    "sig_in": jnp.asarray(sig_in, jnp.float32),
                    "inv_sig_out": jnp.asarray(1.0 / sig_out, jnp.float32),
                }
                sigma[node.id] = sig_out
                if bias_correction:
                    vals_q[node.id] = exec_node(node, vals_q, cal_hw)
                continue
            w_abs = _absorb_grouped(node.attrs["w"], sig_in, node.attrs["groups"])
            if requant == "mul":
                qc = _quantize_conv_mul(w_abs, node.attrs["b"], amax[node.id])
            elif requant == "shift":
                qc, _ = _quantize_conv(w_abs, node.attrs["b"], amax[node.id])
            else:
                raise ValueError(f"requant must be 'mul' or 'shift'; got {requant!r}")
            consts[node.id] = {"qc": qc}
            sigma[node.id] = qc.sigma_out
            if bias_correction:
                sw = np.maximum(np.abs(w_abs).max(axis=(0, 1, 2)) / _QMAX, 1e-12)
                acc = conv_acc(node, vals_q[node.inputs[0]])
                q0 = conv_epilogue(node, acc)
                axes = (0, 1, 2)
                err = np.asarray(jnp.mean(vals[node.id], axes), np.float64) - (
                    qc.sigma_out * np.asarray(jnp.mean(q0.astype(jnp.float32), axes), np.float64)
                )
                delta = np.round(err / sw)
                b_new = (
                    np.asarray(qc.b_q, np.int64) + delta.astype(np.int64)
                ).clip(-(2**31), 2**31 - 1).astype(np.int32)
                qc = qc._replace(b_q=jnp.asarray(b_new))
                consts[node.id] = {"qc": qc}
                vals_q[node.id] = conv_epilogue(node, acc)
            continue
        if node.op in ("maxpool3s2", "avgpool2"):
            sigma[node.id] = sigma[node.inputs[0]]
        elif node.op == "se":
            sig_in = sigma[node.inputs[0]]
            consts[node.id] = {
                "w1": jnp.asarray(node.attrs["w1"], jnp.float32),
                "b1": jnp.asarray(node.attrs["b1"], jnp.float32),
                "w2": jnp.asarray(node.attrs["w2"], jnp.float32),
                "b2": jnp.asarray(node.attrs["b2"], jnp.float32),
                "sig_in": jnp.asarray(sig_in, jnp.float32),
            }
            sigma[node.id] = sig_in
        elif node.op == "add":
            sig_a, sig_b = sigma[node.inputs[0]], sigma[node.inputs[1]]
            sig_out = np.maximum(amax[node.id], 1e-12) / _QMAX
            ma = np.clip(np.round(sig_a / sig_out * (1 << _ADD_SHIFT)), 0, 1 << 20)
            mb = np.clip(np.round(sig_b / sig_out * (1 << _ADD_SHIFT)), 0, 1 << 20)
            consts[node.id] = {
                "ma": jnp.asarray(ma.astype(np.int32)),
                "mb": jnp.asarray(mb.astype(np.int32)),
            }
            sigma[node.id] = sig_out
        elif node.op == "upsample2":
            sigma[node.id] = sigma[node.inputs[0]] * (128.0 / _QMAX) ** 2
        elif node.op == "head":
            sig_in = sigma[node.inputs[0]]
            head_eff = node.attrs["w"] * sig_in[None, None, :, None]
            sw = np.maximum(np.abs(head_eff).max(axis=(0, 1, 2)) / _QMAX, 1e-12)
            consts[node.id] = {
                "w_q": jnp.asarray(np.clip(np.round(head_eff / sw), -_QMAX, _QMAX).astype(np.int8)),
                "sw": jnp.asarray(sw, jnp.float32),
                "bias": jnp.asarray(node.attrs["b"], jnp.float32),
            }
            if bias_correction:
                # the output resize is linear with per-pixel weights summing
                # to 1, so a constant per-channel shift BEFORE the resize
                # equals the same shift after it — correct against the final
                # f32 logits directly.
                q0 = exec_node(node, vals_q, cal_hw)
                err = jnp.mean(vals[node.id], (0, 1, 2)) - jnp.mean(q0, (0, 1, 2))
                consts[node.id]["bias"] = consts[node.id]["bias"] + err.astype(jnp.float32)
        if bias_correction and node.op != "head":
            vals_q[node.id] = exec_node(node, vals_q, cal_hw)

    if bias_correction:
        del vals, vals_q

    # ---- jitted integer forward -----------------------------------------
    @jax.jit
    def forward(x):
        resize_hw = (x.shape[1], x.shape[2])
        vals_fw = {input_id: quantize_input(x)}
        out = None
        for node in g.nodes:
            if node.op == "input":
                continue
            y = exec_node(node, vals_fw, resize_hw)
            vals_fw[node.id] = y
            if node.op == "head":
                out = y
        if output_name is not None:
            return {output_name: out}
        return out

    forward._calibration_output = cal_out  # exposed for tests
    return forward
