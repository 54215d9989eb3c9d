"""Weighted loss composition.

The reference README documents JointLoss/WeightedLoss (README.md:156-164) but
the snapshot's source tree lacks the module; we ship the documented capability.
"""

import dataclasses
from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

__all__ = ["WeightedLoss", "JointLoss"]


@dataclasses.dataclass(frozen=True)
class WeightedLoss:
    """Wrapper that multiplies a loss by a constant weight."""

    loss: Callable
    weight: float = 1.0

    def __call__(self, *args, **kwargs) -> jnp.ndarray:
        return self.loss(*args, **kwargs) * self.weight


@dataclasses.dataclass(frozen=True)
class JointLoss:
    """Weighted sum of two losses, e.g. JointLoss(DiceLoss(...), BinaryFocalLoss(), 1.0, 0.5)."""

    first: Callable
    second: Callable
    first_weight: float = 1.0
    second_weight: float = 1.0

    def __call__(self, *args, **kwargs) -> jnp.ndarray:
        return self.first(*args, **kwargs) * self.first_weight + self.second(*args, **kwargs) * self.second_weight


def sum_of_losses(losses: Sequence[Callable], weights: Sequence[float]) -> Callable:
    """N-ary generalization of JointLoss."""
    losses = tuple(losses)
    weights = tuple(weights)
    if len(losses) != len(weights):
        raise ValueError("losses and weights must have the same length")

    def total(*args, **kwargs):
        return sum(w * l(*args, **kwargs) for l, w in zip(losses, weights))

    return total
