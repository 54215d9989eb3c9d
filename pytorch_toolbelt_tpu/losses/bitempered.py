"""Bi-Tempered logistic loss (arXiv:1906.03361).

Behavioral parity target: pytorch_toolbelt/losses/bitempered_loss.py:25-284.

The normalization constant of the tempered softmax is found iteratively
(fixed point for t>1, binary search for t<1) — both loops are statically
unrolled so XLA fuses the whole chain (an HLO while body is a fusion
barrier on TPU; see _normalization_fixed_point). The backward pass
through the iteration is replaced by
the analytic escort-distribution gradient via ``jax.custom_vjp``, matching the
reference's custom ``ComputeNormalization`` autograd function
(bitempered_loss.py:80-110).

Activations are channels-LAST ([..., num_classes]) in both the reference and
here — the one loss family where the layouts already agree.
"""

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "log_t",
    "exp_t",
    "tempered_softmax",
    "bi_tempered_logistic_loss",
    "BiTemperedLogisticLoss",
    "BinaryBiTemperedLogisticLoss",
]


def log_t(u: jnp.ndarray, t: float) -> jnp.ndarray:
    if t == 1.0:
        return jnp.log(u)
    return (jnp.power(u, 1.0 - t) - 1.0) / (1.0 - t)


def _static_half_pow(z: jnp.ndarray, p: float) -> Optional[jnp.ndarray]:
    """z**p via sqrt/rsqrt + multiplies when 2p is a small integer.

    The VPU's generic pow (exp·log) measures 66 Gpow/s on this chip; the
    decomposed form measures 127 Gpow/s (benchmarks/RESULTS.md, round 5).
    exp_t's exponent 1/(1-t) is half-integer for many practical t
    (t=1.4 -> -2.5, t=1.5 -> -2, t=1.25 -> -4), and the tempered-softmax
    iteration evaluates it ~6x per element — the loss's measured compute
    wall.  Returns None when p is not decomposable.
    Matches jnp.power at the boundary: z=0 with p<0 gives +inf.

    Restricted to NEGATIVE p (the t>1 regime): for positive half-integer
    p (t<1) the sqrt chain's AD at z=0 yields inf*0=NaN where
    jnp.power's VJP (p * z^(p-1)) returns 0 — and exp_t/tempered_softmax
    are public differentiable API.  At negative p both forms diverge at
    z=0 identically (the loss path is shielded by its custom VJP)."""
    if p >= 0:
        return None
    n2 = round(2.0 * p)
    if abs(2.0 * p - n2) > 1e-12 or not (0 < abs(n2) <= 11):
        return None
    neg = n2 < 0
    n2 = abs(n2)
    if n2 % 2 == 0:
        base, k = (jnp.reciprocal(z) if neg else z), n2 // 2
    else:
        base, k = (jax.lax.rsqrt(z) if neg else jnp.sqrt(z)), n2
    acc = None
    while k:
        if k & 1:
            acc = base if acc is None else acc * base
        k >>= 1
        if k:
            base = base * base
    return acc


def exp_t(u: jnp.ndarray, t: float) -> jnp.ndarray:
    if t == 1.0:
        return jnp.exp(u)
    z = jax.nn.relu(1.0 + (1.0 - t) * u)
    fast = _static_half_pow(z, 1.0 / (1.0 - t))
    if fast is not None:
        return fast
    return jnp.power(z, 1.0 / (1.0 - t))


def _normalization_fixed_point(activations: jnp.ndarray, t: float, num_iters: int) -> jnp.ndarray:
    """Fixed-point iteration for t > 1 (reference bitempered_loss.py:25-45).

    ``num_iters`` is a static Python int, so the loop is UNROLLED rather
    than lowered to an opaque ``lax.fori_loop``: an HLO while body is a
    fusion barrier on TPU, which forced every iteration to re-stream the
    [..., C] activations from HBM (measured 14.4x the fwd+bwd byte floor
    in round 4).  Unrolled, XLA fuses the whole elementwise+row-reduce
    chain and the activations stream once (roofline table in
    benchmarks/RESULTS.md)."""
    mu = jnp.max(activations, axis=-1, keepdims=True)
    normalized0 = activations - mu

    normalized = normalized0
    for _ in range(num_iters):
        logt_partition = jnp.sum(exp_t(normalized, t), axis=-1, keepdims=True)
        normalized = normalized0 * jnp.power(logt_partition, 1.0 - t)
    logt_partition = jnp.sum(exp_t(normalized, t), axis=-1, keepdims=True)
    return -log_t(1.0 / logt_partition, t) + mu


def _normalization_binary_search(activations: jnp.ndarray, t: float, num_iters: int) -> jnp.ndarray:
    """Binary search for t < 1 (reference bitempered_loss.py:48-77)."""
    mu = jnp.max(activations, axis=-1, keepdims=True)
    normalized = activations - mu
    effective_dim = jnp.sum(
        (normalized > -1.0 / (1.0 - t)).astype(jnp.int32), axis=-1, keepdims=True
    ).astype(activations.dtype)

    lower = jnp.zeros_like(mu)
    upper = -log_t(1.0 / effective_dim, t) * jnp.ones_like(lower)

    # static trip count -> unrolled (same fusion rationale as the fixed
    # point above: a while body would re-stream the activations per step)
    for _ in range(num_iters):
        logt_partition = (upper + lower) / 2.0
        sum_probs = jnp.sum(exp_t(normalized - logt_partition, t), axis=-1, keepdims=True)
        update = (sum_probs < 1.0).astype(activations.dtype)
        lower, upper = (
            lower * update + (1.0 - update) * logt_partition,
            upper * (1.0 - update) + update * logt_partition,
        )
    return (upper + lower) / 2.0 + mu


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def compute_normalization(activations: jnp.ndarray, t: float, num_iters: int = 5) -> jnp.ndarray:
    if t < 1.0:
        return _normalization_binary_search(activations, t, num_iters)
    return _normalization_fixed_point(activations, t, num_iters)


def _compute_normalization_fwd(activations, t, num_iters):
    constants = compute_normalization(activations, t, num_iters)
    return constants, (activations, constants)


def _compute_normalization_bwd(t, num_iters, residuals, grad_output):
    """Escort-distribution backward (reference bitempered_loss.py:97-110)."""
    activations, constants = residuals
    probabilities = exp_t(activations - constants, t)
    escorts = jnp.power(probabilities, t)
    escorts = escorts / jnp.sum(escorts, axis=-1, keepdims=True)
    return (escorts * grad_output,)


compute_normalization.defvjp(_compute_normalization_fwd, _compute_normalization_bwd)


def tempered_softmax(activations: jnp.ndarray, t: float, num_iters: int = 5) -> jnp.ndarray:
    if t == 1.0:
        return jax.nn.softmax(activations, axis=-1)
    constants = compute_normalization(activations, t, num_iters)
    return exp_t(activations - constants, t)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _bt_loss_rows(
    activations: jnp.ndarray, labels_onehot: jnp.ndarray, t1: float, t2: float, num_iters: int
) -> jnp.ndarray:
    """Per-row bi-tempered loss with a hand-derived backward.

    AD through the (unrolled) normalization iteration streams one set of
    [..., C] residuals per iteration through HBM — measured 9.5x the
    fwd+bwd byte floor in round 5 (14.4x with the while-loop form in
    round 4).  The analytic gradient needs only (activations, labels,
    per-row constants) as residuals:

        dL/da_i = u_i - e_i * S,   u_j = p_j^{1-t1+t2} - y_j p_j^{t2-t1},
        e_i = p_i^{t2} / sum_k p_k^{t2}  (the escort distribution),
        S = sum_j u_j

    (from dp_j/da_i = p_j^{t2} (delta_ij - e_i), the implicit-function
    gradient of the normalization — reference bitempered_loss.py:97-110 —
    and dL/dp_j = p_j^{1-t1} - y_j p_j^{-t1}.  At t1=t2=1 this reduces to
    the softmax-CE gradient p - y.)"""
    probabilities = tempered_softmax(activations, t2, num_iters)
    loss_values = (
        labels_onehot * log_t(labels_onehot + 1e-10, t1)
        - labels_onehot * log_t(probabilities, t1)
        - jnp.power(labels_onehot, 2.0 - t1) / (2.0 - t1)
        + jnp.power(probabilities, 2.0 - t1) / (2.0 - t1)
    )
    return loss_values.sum(axis=-1)


def _bt_loss_rows_fwd(activations, labels_onehot, t1, t2, num_iters):
    if t2 == 1.0:
        constants = jax.scipy.special.logsumexp(activations, axis=-1, keepdims=True)
    else:
        constants = compute_normalization(activations, t2, num_iters)
    probabilities = exp_t(activations - constants, t2)
    loss_values = (
        labels_onehot * log_t(labels_onehot + 1e-10, t1)
        - labels_onehot * log_t(probabilities, t1)
        - jnp.power(labels_onehot, 2.0 - t1) / (2.0 - t1)
        + jnp.power(probabilities, 2.0 - t1) / (2.0 - t1)
    )
    return loss_values.sum(axis=-1), (activations, labels_onehot, constants)


def _bt_loss_rows_bwd(t1, t2, num_iters, residuals, grad_rows):
    activations, labels_onehot, constants = residuals
    p = exp_t(activations - constants, t2)
    u = jnp.power(p, 1.0 - t1 + t2) - labels_onehot * jnp.power(p, t2 - t1)
    pt2 = jnp.power(p, t2)
    escorts = pt2 / jnp.sum(pt2, axis=-1, keepdims=True)
    grad = u - escorts * jnp.sum(u, axis=-1, keepdims=True)
    # label cotangent: dL/dy = log_t1(y+eps) + y*(y+eps)^-t1 - log_t1(p)
    # - y^(1-t1)  (c does not depend on y).  A separate bwd output, so XLA
    # dead-code-eliminates it whenever labels aren't differentiated —
    # the common case costs nothing.
    ye = labels_onehot + 1e-10
    grad_labels = (
        log_t(ye, t1)
        + labels_onehot * jnp.power(ye, -t1)
        - log_t(p, t1)
        - jnp.power(labels_onehot, 1.0 - t1)
    )
    return grad_rows[..., None] * grad, grad_rows[..., None] * grad_labels


_bt_loss_rows.defvjp(_bt_loss_rows_fwd, _bt_loss_rows_bwd)


def bi_tempered_logistic_loss(
    activations: jnp.ndarray,
    labels: jnp.ndarray,
    t1: float,
    t2: float,
    label_smoothing: float = 0.0,
    num_iters: int = 5,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Bi-Tempered logistic loss.

    Args:
        activations: [..., num_classes] logits.
        labels: either one-hot of activations' shape, or integer labels with
            one dimension fewer.
    """
    if labels.ndim < activations.ndim:
        labels_onehot = jax.nn.one_hot(labels, activations.shape[-1], dtype=activations.dtype)
    else:
        labels_onehot = labels.astype(activations.dtype)

    if label_smoothing > 0:
        num_classes = labels_onehot.shape[-1]
        labels_onehot = (
            1 - label_smoothing * num_classes / (num_classes - 1)
        ) * labels_onehot + label_smoothing / (num_classes - 1)

    loss_values = _bt_loss_rows(activations, labels_onehot, t1, t2, num_iters)

    if reduction == "sum":
        return loss_values.sum()
    if reduction == "mean":
        return loss_values.mean()
    return loss_values


@dataclasses.dataclass(frozen=True)
class BiTemperedLogisticLoss:
    """Reference bitempered_loss.py:183-222. ``ignore_index`` masks by target."""

    t1: float
    t2: float
    smoothing: float = 0.0
    ignore_index: Optional[int] = None
    reduction: str = "mean"

    def __call__(self, predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        loss = bi_tempered_logistic_loss(
            predictions, targets, t1=self.t1, t2=self.t2,
            label_smoothing=self.smoothing, reduction="none",
        )
        if self.ignore_index is not None:
            mask = targets != self.ignore_index
            loss = loss * mask
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss


@dataclasses.dataclass(frozen=True)
class BinaryBiTemperedLogisticLoss:
    """Binary variant; predictions/targets are [B, *spatial, 1] channels-last
    (reference bitempered_loss.py:223-284 uses [B,1,...])."""

    t1: float
    t2: float
    smoothing: float = 0.0
    ignore_index: Optional[int] = None
    reduction: str = "mean"

    def __call__(self, predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        if predictions.shape[-1] != 1 or targets.shape[-1] != 1:
            raise ValueError("Channel dimension for predictions and targets must be equal to 1")
        loss = bi_tempered_logistic_loss(
            jnp.concatenate([-predictions, predictions], axis=-1),
            jnp.concatenate([1 - targets, targets], axis=-1),
            t1=self.t1,
            t2=self.t2,
            label_smoothing=self.smoothing,
            reduction="none",
        )[..., None]
        if self.ignore_index is not None:
            loss = jnp.where(targets == self.ignore_index, 0.0, loss)
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss
