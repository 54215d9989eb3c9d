"""Shared mode constants + flattening for Dice/Jaccard-style losses."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BINARY_MODE = "binary"
MULTICLASS_MODE = "multiclass"
MULTILABEL_MODE = "multilabel"

__all__ = ["BINARY_MODE", "MULTICLASS_MODE", "MULTILABEL_MODE", "flatten_for_iou"]


def flatten_for_iou(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    mode: str,
    ignore_index: Optional[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bring predictions/targets to [B, N, C] float form for soft IoU scores.

    Mirrors the flatten/one-hot/masking logic of the reference DiceLoss.forward
    (pytorch_toolbelt/losses/dice.py:59-107) in a channels-last layout.

    * binary:     y_pred any shape, y_true same shape -> [B, N, 1]
    * multiclass: y_pred [B, *spatial, C], y_true [B, *spatial] int -> one-hot
    * multilabel: y_pred [B, *spatial, C], y_true same shape
    """
    bs = y_pred.shape[0]

    if mode == BINARY_MODE:
        y_pred = y_pred.reshape(bs, -1, 1)
        y_true = y_true.reshape(bs, -1, 1).astype(y_pred.dtype)
        if ignore_index is not None:
            mask = (y_true != ignore_index).astype(y_pred.dtype)
            y_pred = y_pred * mask
            y_true = y_true * mask
        return y_pred, y_true

    num_classes = y_pred.shape[-1]

    if mode == MULTICLASS_MODE:
        y_pred = y_pred.reshape(bs, -1, num_classes)
        y_true = y_true.reshape(bs, -1)
        if ignore_index is not None:
            mask = y_true != ignore_index
            y_pred = y_pred * mask[..., None]
            y_true_oh = jax.nn.one_hot(jnp.where(mask, y_true, 0), num_classes, dtype=y_pred.dtype)
            y_true_oh = y_true_oh * mask[..., None]
        else:
            y_true_oh = jax.nn.one_hot(y_true, num_classes, dtype=y_pred.dtype)
        return y_pred, y_true_oh

    if mode == MULTILABEL_MODE:
        y_pred = y_pred.reshape(bs, -1, num_classes)
        y_true = y_true.reshape(bs, -1, num_classes).astype(y_pred.dtype)
        if ignore_index is not None:
            mask = (y_true != ignore_index).astype(y_pred.dtype)
            y_pred = y_pred * mask
            y_true = y_true * mask
        return y_pred, y_true

    raise ValueError(f"Unsupported mode {mode}")
