"""Focal loss wrappers (reference: pytorch_toolbelt/losses/focal.py:13-165)."""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .functional import focal_loss_with_logits, softmax_focal_loss_with_logits

__all__ = ["BinaryFocalLoss", "CrossEntropyFocalLoss", "FocalLoss"]


@dataclasses.dataclass(frozen=True)
class BinaryFocalLoss:
    """Focal loss for binary / multilabel problems (classes last).

    If targets have one dimension fewer than inputs, they are one-hot encoded
    onto the last axis (reference focal.py:88-107 does the same at axis 1).
    """

    alpha: Optional[float] = None
    gamma: float = 2.0
    ignore_index: Optional[int] = None
    reduction: str = "mean"
    normalized: bool = False
    reduced_threshold: Optional[float] = None
    activation: str = "sigmoid"
    softmax_axis: Optional[int] = None
    class_weights: Optional[Tuple[float, ...]] = None

    def __post_init__(self):
        if self.class_weights is not None:
            object.__setattr__(self, "class_weights", tuple(float(w) for w in self.class_weights))

    def _one_hot_targets(self, targets, num_classes):
        if self.ignore_index is None:
            return jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
        ignored = targets == self.ignore_index
        oh = jax.nn.one_hot(jnp.where(ignored, 0, targets), num_classes, dtype=jnp.float32)
        return jnp.where(ignored[..., None], float(self.ignore_index), oh)

    def __call__(self, inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        if targets.ndim + 1 == inputs.ndim:
            targets = self._one_hot_targets(targets, inputs.shape[-1])
        cw = jnp.asarray(self.class_weights) if self.class_weights is not None else None
        return focal_loss_with_logits(
            inputs,
            targets,
            gamma=self.gamma,
            alpha=self.alpha,
            reduction=self.reduction,
            normalized=self.normalized,
            reduced_threshold=self.reduced_threshold,
            ignore_index=self.ignore_index,
            activation=self.activation,
            softmax_axis=self.softmax_axis,
            class_weights=cw,
            class_axis=-1,
        )


@dataclasses.dataclass(frozen=True)
class CrossEntropyFocalLoss:
    """Multi-class focal loss via softmax; targets are int labels
    (reference focal.py:108-164). Inputs [B, *spatial, C], targets [B, *spatial]."""

    gamma: float = 2.0
    reduction: str = "mean"
    normalized: bool = False
    reduced_threshold: Optional[float] = None
    ignore_index: int = -100
    class_weights: Optional[Tuple[float, ...]] = None

    def __call__(self, inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        cw = jnp.asarray(self.class_weights) if self.class_weights is not None else None
        return softmax_focal_loss_with_logits(
            inputs,
            targets,
            gamma=self.gamma,
            reduction=self.reduction,
            normalized=self.normalized,
            reduced_threshold=self.reduced_threshold,
            ignore_index=self.ignore_index,
            class_weights=cw,
        )


def FocalLoss(*args, **kwargs):
    """Deprecated alias of CrossEntropyFocalLoss (reference focal.py:165)."""
    import warnings

    warnings.warn(
        "FocalLoss is deprecated. Please use CrossEntropyFocalLoss instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    return CrossEntropyFocalLoss(*args, **kwargs)
