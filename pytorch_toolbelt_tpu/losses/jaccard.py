"""Jaccard (IoU) loss (reference: pytorch_toolbelt/losses/jaccard.py:18-103)."""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ._modes import BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE, flatten_for_iou
from .functional import soft_jaccard_score

__all__ = ["JaccardLoss"]


@dataclasses.dataclass(frozen=True)
class JaccardLoss:
    """Soft Jaccard loss for binary / multiclass / multilabel segmentation.

    Channels-last layout; see DiceLoss. The reference JaccardLoss has no
    ignore_index support, which we keep for parity.
    """

    mode: str
    classes: Optional[Tuple[int, ...]] = None
    log_loss: bool = False
    from_logits: bool = True
    smooth: float = 0.0
    eps: float = 1e-7

    def __post_init__(self):
        assert self.mode in {BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE}
        if self.classes is not None:
            assert self.mode != BINARY_MODE, "Masking classes is not supported with mode=binary"
            object.__setattr__(self, "classes", tuple(self.classes))

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        from . import fused

        if self.from_logits and fused.ENABLED:
            # analytic custom-VJP fast paths (round 5; same derivation
            # pattern as the dice kernels — benchmarks/RESULTS.md roofline)
            if self.mode == MULTICLASS_MODE:
                return fused.fused_multiclass_jaccard(
                    y_pred, y_true, float(self.smooth), float(self.eps),
                    bool(self.log_loss), self.classes,
                )
            if self.mode == BINARY_MODE:
                bs = y_pred.shape[0]
                y_pred = y_pred.reshape(bs, -1, 1)
                y_true = y_true.reshape(bs, -1, 1)
            return fused.fused_sigmoid_jaccard(
                y_pred, y_true, float(self.smooth), float(self.eps),
                bool(self.log_loss), None, self.classes,
            )
        if self.from_logits:
            if self.mode == MULTICLASS_MODE:
                y_pred = jnp.exp(jax.nn.log_softmax(y_pred, axis=-1))
            else:
                y_pred = jnp.exp(jax.nn.log_sigmoid(y_pred))

        y_pred, y_true = flatten_for_iou(y_pred, y_true, self.mode, ignore_index=None)
        dims = (0, 1)

        scores = soft_jaccard_score(y_pred, y_true.astype(y_pred.dtype), self.smooth, self.eps, dims)
        if self.log_loss:
            loss = -jnp.log(jnp.maximum(scores, self.eps))
        else:
            loss = 1.0 - scores

        mask = y_true.sum(dims) > 0
        loss = loss * mask.astype(loss.dtype)

        if self.classes is not None:
            loss = loss[jnp.asarray(self.classes)]

        return loss.mean()
