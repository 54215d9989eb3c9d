"""Lovasz hinge / Lovasz-Softmax losses (Berman 2018).

Behavioral parity target: pytorch_toolbelt/losses/lovasz.py:23-204.

TPU-native redesign notes:

* The reference filters out ``ignore_index`` pixels with boolean indexing,
  which produces data-dependent shapes.  Under ``jax.jit`` we instead push
  ignored pixels to the END of the descending error sort (sentinel key) and
  mask them out of the cumulative sums, which yields identical values with
  static shapes.
* The permutation from the sort is integer-valued, so gradients flow only
  through the gathered errors — exactly matching the reference's detached
  ``perm`` (lovasz.py:70-71).
* ``classes='present'`` is data-dependent in the reference; here every class
  is computed and non-present classes are masked out of the average, which is
  algebraically the same.
"""

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

__all__ = ["BinaryLovaszLoss", "LovaszLoss", "binary_lovasz_hinge", "lovasz_softmax"]


def _lovasz_grad_terms(gt_sorted: jnp.ndarray, valid_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors (Alg. 1),
    with a validity mask folded into the cumulative sums.

    Batched: operates along the LAST axis; leading axes are independent
    (class and/or image) problems.
    """
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum((1.0 - gt_sorted) * valid_sorted, axis=-1)
    jaccard = jnp.where(union > 0, 1.0 - intersection / jnp.maximum(union, 1e-12), 0.0)
    return jnp.concatenate([jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1)


def _sort_desc(keys: jnp.ndarray, *values: jnp.ndarray):
    """Sort values by descending keys along the last axis in ONE multi-operand
    lax.sort — much faster on TPU than argsort + gathers (each gather of
    millions of elements costs as much as the sort itself).  Leading axes are
    sorted independently in the same call, so K classes cost one batched sort
    rather than K sequential ones."""
    results = jax.lax.sort((-keys,) + values, dimension=-1, num_keys=1)
    return (-results[0],) + tuple(results[1:])


def _hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    labels = jnp.where(valid, labels, 0).astype(jnp.float32)
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    # ignored pixels sort last (sentinel below any finite error); validity is
    # then recoverable from the sorted keys, saving a sort operand
    errors_masked = jnp.where(valid, errors, -jnp.inf)
    errors_sorted, gt_sorted = _sort_desc(errors_masked, labels)
    valid_sorted = jnp.isfinite(errors_sorted).astype(jnp.float32)
    grad = _lovasz_grad_terms(gt_sorted, valid_sorted)
    return jnp.sum(jax.nn.relu(jnp.where(valid_sorted > 0, errors_sorted, 0.0)) * grad)


def binary_lovasz_hinge(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    per_image: bool = False,
    ignore_index: Optional[Union[int, float]] = None,
) -> jnp.ndarray:
    """Binary Lovasz hinge loss on logits.

    Args:
        logits: [B, *spatial] float logits.
        labels: [B, *spatial] binary ground truth (0 or 1, plus ignore_index).
    """
    bs = logits.shape[0]
    logits = logits.reshape(bs, -1).astype(jnp.float32)
    labels = labels.reshape(bs, -1)
    valid = jnp.ones_like(labels, dtype=bool) if ignore_index is None else labels != ignore_index

    if per_image:
        return jnp.mean(jax.vmap(_hinge_flat)(logits, labels, valid))
    return _hinge_flat(logits.reshape(-1), labels.reshape(-1), valid.reshape(-1))


def _softmax_flat(probas: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray, classes) -> jnp.ndarray:
    """probas [P, C], labels [P] int, valid [P] bool.

    All K requested classes are laid out as one [K, P] problem and sorted in a
    SINGLE batched lax.sort — one kernel of K independent row sorts instead of
    K sequential full-array sorts (the difference between ~2.4 s and ~0.3 s on
    a batch-8 19-class 1024x1024 problem on v5e).
    """
    num_classes = probas.shape[1]
    if classes in ("all", "present"):
        class_list = list(range(num_classes))
    else:
        class_list = list(classes)
        if num_classes == 1 and len(class_list) > 1:
            raise ValueError("Sigmoid output possible only with 1 class")

    class_ids = jnp.asarray(class_list, dtype=labels.dtype)  # [K]
    fg = ((labels[None, :] == class_ids[:, None]) & valid[None, :]).astype(jnp.float32)  # [K, P]
    if num_classes == 1:
        class_pred = jnp.broadcast_to(probas[:, 0][None, :], fg.shape)
    else:
        class_pred = probas.T[jnp.asarray(class_list)] if class_list != list(range(num_classes)) else probas.T

    errors = jnp.abs(fg - class_pred)  # [K, P], >= 0
    errors_masked = jnp.where(valid[None, :], errors, -1.0)  # -1 sorts last
    errors_sorted, fg_sorted = _sort_desc(errors_masked, fg)
    valid_sorted = (errors_sorted >= 0).astype(jnp.float32)
    grad = _lovasz_grad_terms(fg_sorted, valid_sorted)
    losses = jnp.sum(jnp.where(valid_sorted > 0, errors_sorted, 0.0) * grad, axis=-1)  # [K]
    present = (fg.sum(axis=-1) > 0).astype(jnp.float32)

    if classes == "present":
        return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)
    return losses.mean()


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    classes: Union[str, Sequence[int]] = "present",
    per_image: bool = False,
    ignore_index: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-class Lovasz-Softmax loss.

    Args:
        probas: [B, *spatial, C] class probabilities (channels LAST), or
            [B, *spatial] sigmoid output interpreted as C=1.
        labels: [B, *spatial] integer ground truth.
        classes: 'all' | 'present' | explicit list of class ids to average.
    """
    if probas.ndim == labels.ndim:
        probas = probas[..., None]  # sigmoid output -> C=1
    bs = probas.shape[0]
    num_classes = probas.shape[-1]
    probas = probas.reshape(bs, -1, num_classes).astype(jnp.float32)
    labels = labels.reshape(bs, -1)
    valid = jnp.ones_like(labels, dtype=bool) if ignore_index is None else labels != ignore_index

    if per_image:
        fn = lambda p, l, v: _softmax_flat(p, l, v, classes)
        return jnp.mean(jax.vmap(fn)(probas, labels, valid))
    return _softmax_flat(
        probas.reshape(-1, num_classes), labels.reshape(-1), valid.reshape(-1), classes
    )


@dataclasses.dataclass(frozen=True)
class BinaryLovaszLoss:
    per_image: bool = False
    ignore_index: Optional[Union[int, float]] = None

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return binary_lovasz_hinge(logits, target, per_image=self.per_image, ignore_index=self.ignore_index)


@dataclasses.dataclass(frozen=True)
class LovaszLoss:
    per_image: bool = False
    ignore: Optional[int] = None
    classes: Union[str, tuple] = "present"

    def __call__(self, probas: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return lovasz_softmax(
            probas, target, classes=self.classes, per_image=self.per_image, ignore_index=self.ignore
        )
