"""Fused TPU inference path for ``UNetSegmentationModel``.

Why: XLA maps a conv's output channels to MXU lanes, so the narrow
(32/64-ch) convs that dominate the BASELINE UNet-32 fill only a quarter of
the systolic array (~7-9 TF/s measured on v5e, benchmarks/RESULTS.md).
``ops/conv_kernels.conv3x3_hcw`` transposes the GEMM mapping (spatial
positions on lanes, the 3x3xC_in contraction on sublanes) and measures
2.1-2.8x XLA on exactly those shapes — but it wants activations in
``[B, H, C, W]`` ("HCW") layout and inference-folded BatchNorm.

``fuse_unet_inference`` therefore replays the whole model forward in HCW
layout ONCE per fuse call, from the trained flax variables:

* every conv+BN+ReLU collapses to one Pallas call with a fused epilogue
  (weights packed and BN folded eagerly, on host, at fuse time);
* pool / bilinear-upsample / concat run in HCW too (strided-slice max,
  interpolation-matrix einsums on axes 1/3, channel-axis concat), so there
  are NO layout transposes anywhere in the hot loop — only the 3-channel
  input and the num_classes output cross layouts, both negligible;
* convs whose static shape the kernel does not support (the W<128 deep
  levels, the num_classes head) fall back to XLA's conv *in HCW layout*
  via ``dimension_numbers=("NHCW", "HWIO", "NHCW")``.

Semantics matched: ``model.apply(variables, x, training=False)`` with
batch-norm inference statistics — the reference's ``model.eval()`` forward
(reference modules/unet.py:10-48 + decoders/unet.py:24-129).  Verified to
bf16 tolerance in tests/test_fast_unet.py.
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

__all__ = ["fuse_unet_inference"]


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
