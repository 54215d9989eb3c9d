"""Smaller loss wrappers.

Parity targets: soft_bce.py, soft_ce.py, balanced_bce.py, soft_f1.py,
wing_loss.py, logcosh.py, focal_cosine.py, quality_focal_loss.py in
pytorch_toolbelt/losses/.
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .functional import (
    balanced_binary_cross_entropy_with_logits,
    binary_cross_entropy_with_logits,
    label_smoothed_nll_loss,
    log_cosh_loss,
    reduce_loss,
    soft_micro_f1,
    wing_loss,
)

__all__ = [
    "SoftBCEWithLogitsLoss",
    "SoftCrossEntropyLoss",
    "BalancedBCEWithLogitsLoss",
    "BinarySoftF1Loss",
    "SoftF1Loss",
    "WingLoss",
    "LogCoshLoss",
    "FocalCosineLoss",
    "QualityFocalLoss",
]


@dataclasses.dataclass(frozen=True)
class SoftBCEWithLogitsLoss:
    """BCE-with-logits + label smoothing + ignore_index
    (reference soft_bce.py:9-48)."""

    weight: Optional[Tuple[float, ...]] = None
    ignore_index: Optional[int] = -100
    reduction: str = "mean"
    smooth_factor: Optional[float] = None
    pos_weight: Optional[Tuple[float, ...]] = None

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.smooth_factor is not None:
            soft_targets = (1 - target) * self.smooth_factor + target * (1 - self.smooth_factor)
        else:
            soft_targets = target
        soft_targets = soft_targets.astype(input.dtype)

        if self.pos_weight is not None:
            pw = jnp.asarray(self.pos_weight, dtype=input.dtype)
            # torch BCEWithLogits pos_weight form: -[pw*t*log(s) + (1-t)*log(1-s)]
            loss = -(
                pw * soft_targets * jax.nn.log_sigmoid(input)
                + (1 - soft_targets) * jax.nn.log_sigmoid(-input)
            )
        else:
            loss = binary_cross_entropy_with_logits(input, soft_targets)

        if self.weight is not None:
            loss = loss * jnp.asarray(self.weight, dtype=loss.dtype)

        if self.ignore_index is not None:
            loss = loss * (target != self.ignore_index).astype(loss.dtype)

        return reduce_loss(loss, self.reduction)


@dataclasses.dataclass(frozen=True)
class SoftCrossEntropyLoss:
    """Label-smoothed cross entropy, classes LAST (reference soft_ce.py:9-33)."""

    reduction: str = "mean"
    smooth_factor: float = 0.0
    ignore_index: Optional[int] = -100
    axis: int = -1

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        log_prob = jax.nn.log_softmax(input, axis=self.axis)
        return label_smoothed_nll_loss(
            log_prob,
            target,
            epsilon=self.smooth_factor,
            ignore_index=self.ignore_index,
            reduction=self.reduction,
            axis=self.axis,
        )


@dataclasses.dataclass(frozen=True)
class BalancedBCEWithLogitsLoss:
    """Balanced BCE (reference balanced_bce.py:51-76)."""

    gamma: float = 1.0
    reduction: str = "mean"
    ignore_index: Optional[int] = None

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return balanced_binary_cross_entropy_with_logits(
            output, target, gamma=self.gamma, ignore_index=self.ignore_index, reduction=self.reduction
        )


@dataclasses.dataclass(frozen=True)
class BinarySoftF1Loss:
    """1 - soft micro-F1 on sigmoid probabilities (reference soft_f1.py:57-77).

    ``ignore_index`` masks contributions (equivalent to the reference's
    dynamic filtering since masked entries contribute zero to tp/fp/fn)."""

    ignore_index: Optional[int] = None
    eps: float = 1e-6

    def __call__(self, preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        targets = targets.reshape(-1)
        preds = preds.reshape(-1)
        probs = jnp.clip(jax.nn.sigmoid(preds), self.eps, 1 - self.eps)
        if self.ignore_index is not None:
            keep = (targets != self.ignore_index).astype(probs.dtype)
            probs = probs * keep
            targets = targets * keep
        return soft_micro_f1(probs.reshape(-1, 1), targets.reshape(-1, 1).astype(probs.dtype))


@dataclasses.dataclass(frozen=True)
class SoftF1Loss:
    """Multiclass soft-F1 loss on softmax probabilities, classes LAST
    (reference soft_f1.py:80-99)."""

    ignore_index: Optional[int] = None
    eps: float = 1e-6

    def __call__(self, preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        probs = jnp.clip(jax.nn.softmax(preds, axis=-1), self.eps, 1 - self.eps)
        targets_oh = jax.nn.one_hot(targets, preds.shape[-1], dtype=probs.dtype)
        if self.ignore_index is not None:
            # zero out whole ROWS whose integer label is ignored — masked
            # entries then contribute nothing to tp/fp/fn, equivalent to the
            # reference's dynamic row filtering (soft_f1.py:88-95)
            keep = (targets != self.ignore_index).astype(probs.dtype)[..., None]
            probs = probs * keep
            targets_oh = targets_oh * keep
        return soft_micro_f1(probs, targets_oh)


@dataclasses.dataclass(frozen=True)
class WingLoss:
    """Wing loss for landmarks (reference wing_loss.py:8-15)."""

    width: float = 5
    curvature: float = 0.5
    reduction: str = "mean"

    def __call__(self, prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return wing_loss(prediction, target, self.width, self.curvature, self.reduction)


@dataclasses.dataclass(frozen=True)
class LogCoshLoss:
    """Mean log-cosh regression loss (reference logcosh.py:8-13)."""

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        return log_cosh_loss(y_pred, y_true)


@dataclasses.dataclass(frozen=True)
class FocalCosineLoss:
    """Cosine-embedding + focal CE mix (arXiv:2007.07805;
    reference focal_cosine.py:9-39). Inputs [B, C] logits, targets [B] int."""

    alpha: float = 1.0
    gamma: float = 2.0
    xent: float = 0.1
    reduction: str = "mean"

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        num_classes = input.shape[-1]
        target_oh = jax.nn.one_hot(target, num_classes, dtype=input.dtype)

        # cosine embedding loss with y=1: 1 - cos_sim(input, one_hot)
        denom = jnp.linalg.norm(input, axis=-1) * jnp.linalg.norm(target_oh, axis=-1)
        cos_sim = jnp.sum(input * target_oh, axis=-1) / jnp.maximum(denom, 1e-8)
        cosine_loss = 1.0 - cos_sim
        if self.reduction == "mean":
            cosine_loss = cosine_loss.mean()
        elif self.reduction == "sum":
            cosine_loss = cosine_loss.sum()

        # cross entropy over L2-normalized logits (reference focal_cosine.py:33)
        normalized = input / jnp.maximum(jnp.linalg.norm(input, axis=-1, keepdims=True), 1e-12)
        logp = jax.nn.log_softmax(normalized, axis=-1)
        cent_loss = -jnp.take_along_axis(logp, target[..., None], axis=-1).squeeze(-1)
        pt = jnp.exp(-cent_loss)
        focal_loss = self.alpha * jnp.power(1 - pt, self.gamma) * cent_loss
        if self.reduction == "mean":
            focal_loss = focal_loss.mean()

        return cosine_loss + self.xent * focal_loss


@dataclasses.dataclass(frozen=True)
class QualityFocalLoss:
    """Quality focal loss (arXiv:2006.04388;
    reference quality_focal_loss.py:5-46)."""

    beta: float = 2.0
    reduction: str = "mean"

    def __call__(self, predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        predictions = predictions.astype(jnp.float32)
        targets = targets.astype(jnp.float32)
        bce = binary_cross_entropy_with_logits(predictions, targets)
        focal_term = jnp.power(jnp.abs(jax.nn.sigmoid(predictions) - targets), self.beta)
        loss = focal_term * bce
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        if self.reduction == "normalized":
            return loss.sum() / focal_term.sum()
        return loss
