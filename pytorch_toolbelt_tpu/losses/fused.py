"""Fused forward+backward paths for the hot pointwise losses.

benchmarks/loss_roofline.py (v5e, config-4 shape: batch-8 19-class 1024^2
logits) measured the AD paths of softmax-focal and multiclass dice at ~5x
the HBM byte floor, and ``jax.checkpoint`` remat made them SLOWER (0.8x) —
the traffic is jax-AD residuals (softmax probs, one-hots, focal terms,
power intermediates) streamed between the forward and backward halves, and
naive remat recomputes without removing the residual streams.

These implementations replace AD with hand-derived analytic gradients via
``jax.custom_vjp``: the ONLY residuals are the inputs themselves, the
forward is one fused read->reduce pass, and the backward recomputes the
cheap elementwise chain and emits the gradient in a single
read->write pass.  Everything is elementwise + per-class scalars, so XLA
fuses each pass into a near-roofline stream — no Pallas needed (measured
in benchmarks/RESULTS.md "loss roofline" table).

Gradients:

softmax focal (reference functional.py:110-173 semantics):
    L = mean/sum over pixels of  pos * sum_c w_c pt_c^g bce_c,
    p = softmax(z), pt_c = p_c + t_c (1 - 2 p_c),
    bce_c = sigmoid-BCE(z_c, t_c)
    dL/dz_k = pos * [ u_k - p_k sum_c u_c + w_k pt_k^g (sigma(z_k) - t_k) ]
    with u_c = g w_c pt_c^(g-1) bce_c (1 - 2 t_c) p_c.

multiclass soft dice (reference dice.py:18-131 semantics):
    score_c = (2 I_c + s) / max(card_c + s, eps),
    I_c = sum p t,  card_c = sum (p + t)  over batch+pixels,
    dL/dp_ic = A_c t_ic + B_c  (per-class scalars A, B),
    then the softmax VJP  dz = p (G - sum_c G_c p_c).
"""

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_softmax_focal", "fused_multiclass_dice", "ENABLED"]

# Escape hatch: set False to route every loss through the generic jax-AD
# path (used by the roofline bench for A/B comparison).
ENABLED = True


def _zero_cotangent(t):
    if jnp.issubdtype(t.dtype, jnp.integer) or jnp.issubdtype(t.dtype, jnp.bool_):
        return np.zeros(t.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(t)


# ---------------------------------------------------------------------------
# Softmax focal
# ---------------------------------------------------------------------------


def _pow(x, e):
    """jnp.power with the small integer exponents the focal default hits
    special-cased to multiplies (pow lowers to exp/log transcendentals)."""
    if e == 1.0:
        return x
    if e == 2.0:
        return x * x
    return jnp.power(x, e)


def _focal_pieces(z, t, gamma, class_weights, ignore_index):
    """Shared forward pieces.  The one-hot target never materializes as an
    f32 tensor: a boolean iota-compare (`is_t`) drives `where` selections —
    algebraically identical (the one-hot is exact 0/1) but 4x cheaper if
    XLA chooses to materialize the shared subexpression."""
    z = z.astype(jnp.float32)
    num_classes = z.shape[-1]
    ignore_mask = t == ignore_index
    pos = jnp.logical_not(ignore_mask).astype(jnp.float32)
    t0 = jnp.where(ignore_mask, 0, t)
    is_t = (
        jax.lax.broadcasted_iota(t0.dtype, z.shape, z.ndim - 1) == t0[..., None]
    )
    p = jax.nn.softmax(z, axis=-1)
    base = jnp.maximum(z, 0) + jnp.log1p(jnp.exp(-jnp.abs(z)))
    bce = jnp.where(is_t, base - z, base)
    pt = jnp.where(is_t, 1.0 - p, p)
    w = None
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
    return z, pos, is_t, p, bce, pt, w


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_softmax_focal(output, target, gamma, class_weights, ignore_index, reduction):
    """softmax_focal_loss_with_logits fast path: normalized=False,
    reduced_threshold=None, reduction in ('mean', 'sum').

    ``class_weights`` must be a hashable static (tuple or None)."""
    z, pos, _, _, bce, pt, w = _focal_pieces(output, target, gamma, class_weights, ignore_index)
    loss = _pow(pt, gamma) * bce
    if w is not None:
        loss = loss * w
    loss = loss.sum(axis=-1) * pos
    return loss.mean() if reduction == "mean" else loss.sum()


def _focal_fwd(output, target, gamma, class_weights, ignore_index, reduction):
    value = fused_softmax_focal(output, target, gamma, class_weights, ignore_index, reduction)
    return value, (output, target)


def _focal_bwd(gamma, class_weights, ignore_index, reduction, res, g):
    output, target = res
    z, pos, is_t, p, bce, pt, w = _focal_pieces(output, target, gamma, class_weights, ignore_index)
    u_mag = gamma * _pow(pt, gamma - 1.0) * bce * p
    u = jnp.where(is_t, -u_mag, u_mag)  # (1 - 2*t_oh) sign flip
    sig = jax.nn.sigmoid(z)
    tail = _pow(pt, gamma) * jnp.where(is_t, sig - 1.0, sig)
    if w is not None:
        u = u * w
        tail = tail * w
    s = u.sum(axis=-1, keepdims=True)
    grad = (u - p * s + tail) * pos[..., None]
    scale = g / pos.size if reduction == "mean" else g
    return (grad * scale).astype(output.dtype), _zero_cotangent(target)


fused_softmax_focal.defvjp(_focal_fwd, _focal_bwd)


# ---------------------------------------------------------------------------
# Multiclass soft dice
# ---------------------------------------------------------------------------


def _dice_pieces(z, y, ignore_index):
    """Forward pieces without materializing an f32 one-hot: ``is_t`` is a
    boolean iota-compare (already zero on ignored pixels), and the one-hot
    reductions become masked sums / counts — exact identities."""
    z = z.astype(jnp.float32)
    if ignore_index is not None:
        valid = y != ignore_index
        is_t = (
            jax.lax.broadcasted_iota(y.dtype, z.shape, z.ndim - 1) == y[..., None]
        ) & valid[..., None]
        m = valid.astype(jnp.float32)
    else:
        m = None
        is_t = jax.lax.broadcasted_iota(y.dtype, z.shape, z.ndim - 1) == y[..., None]
    p_sm = jax.nn.softmax(z, axis=-1)
    p = p_sm if m is None else p_sm * m[..., None]
    axes = tuple(range(z.ndim - 1))
    intersection = jnp.where(is_t, p, 0.0).sum(axes)  # [C]
    t_sum = is_t.astype(jnp.float32).sum(axes)
    cardinality = p.sum(axes) + t_sum
    return p_sm, p, is_t, m, intersection, cardinality, t_sum


def _dice_epilogue(intersection, cardinality, t_sum, smooth, eps, log_loss, classes):
    d = jnp.maximum(cardinality + smooth, eps)
    scores = (2.0 * intersection + smooth) / d
    loss = -jnp.log(jnp.maximum(scores, eps)) if log_loss else 1.0 - scores
    loss = loss * (t_sum > 0)
    if classes is not None:
        loss = loss[jnp.asarray(classes)]
    return loss.mean(), scores, d


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_multiclass_dice(y_pred, y_true, smooth, eps, log_loss, ignore_index, classes):
    """DiceLoss(mode='multiclass', from_logits=True) fast path.

    ``classes`` must be a hashable static (tuple or None)."""
    _, _, _, _, intersection, cardinality, t_sum = _dice_pieces(y_pred, y_true, ignore_index)
    loss, _, _ = _dice_epilogue(intersection, cardinality, t_sum, smooth, eps, log_loss, classes)
    return loss


def _dice_fwd(y_pred, y_true, smooth, eps, log_loss, ignore_index, classes):
    value = fused_multiclass_dice(y_pred, y_true, smooth, eps, log_loss, ignore_index, classes)
    return value, (y_pred, y_true)


def _dice_bwd(smooth, eps, log_loss, ignore_index, classes, res, g):
    y_pred, y_true = res
    p_sm, _, is_t, m, intersection, cardinality, t_sum = _dice_pieces(y_pred, y_true, ignore_index)
    _, scores, d = _dice_epilogue(intersection, cardinality, t_sum, smooth, eps, log_loss, classes)

    num_classes = y_pred.shape[-1]
    # dL/dloss_c: mean over the (possibly class-subset) loss vector
    if classes is not None:
        sel = np.zeros(num_classes, np.float32)
        sel[list(classes)] = 1.0
        dloss = jnp.asarray(sel) / len(classes)
    else:
        dloss = jnp.full((num_classes,), 1.0 / num_classes, jnp.float32)
    dloss = dloss * (t_sum > 0)
    if log_loss:
        dscore = dloss * (-1.0 / jnp.maximum(scores, eps)) * (scores > eps)
    else:
        dscore = -dloss
    live = (cardinality + smooth > eps).astype(jnp.float32)
    a = dscore * 2.0 / d  # coefficient of the one-hot in dL/dp
    b = -dscore * (2.0 * intersection + smooth) / (d * d) * live
    gp = jnp.where(is_t, a + b, b)  # dL/d(p masked), broadcast [.., C]
    if m is not None:
        gp = gp * m[..., None]
    # softmax VJP
    grad = p_sm * (gp - (gp * p_sm).sum(axis=-1, keepdims=True))
    return (grad * g).astype(y_pred.dtype), _zero_cotangent(y_true)


fused_multiclass_dice.defvjp(_dice_fwd, _dice_bwd)
