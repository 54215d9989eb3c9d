"""Dice loss (reference: pytorch_toolbelt/losses/dice.py:18-131)."""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ._modes import BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE, flatten_for_iou
from .functional import soft_dice_score

__all__ = ["DiceLoss", "BINARY_MODE", "MULTICLASS_MODE", "MULTILABEL_MODE"]


@dataclasses.dataclass(frozen=True)
class DiceLoss:
    """Soft Dice loss for binary / multiclass / multilabel segmentation.

    Channels-last: multiclass `y_pred` is [B, *spatial, C], `y_true` is
    [B, *spatial] int.  Classes with no ground-truth pixels contribute zero
    (reference dice.py:120-126).
    """

    mode: str
    classes: Optional[Tuple[int, ...]] = None
    log_loss: bool = False
    from_logits: bool = True
    smooth: float = 0.0
    ignore_index: Optional[int] = None
    eps: float = 1e-7

    def __post_init__(self):
        assert self.mode in {BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE}
        if self.classes is not None:
            assert self.mode != BINARY_MODE, "Masking classes is not supported with mode=binary"
            object.__setattr__(self, "classes", tuple(self.classes))

    def __call__(self, y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
        from . import fused

        if self.mode == MULTICLASS_MODE and self.from_logits and fused.ENABLED:
            # analytic custom-VJP fast path (identical value/grad; ~4x less
            # HBM traffic fwd+bwd — benchmarks/RESULTS.md loss roofline)
            return fused.fused_multiclass_dice(
                y_pred, y_true, float(self.smooth), float(self.eps),
                bool(self.log_loss), self.ignore_index, self.classes,
            )
        if self.from_logits and fused.ENABLED:
            # binary / multilabel sigmoid modes (round-5 fused path); binary
            # flattens to a trailing singleton class axis first
            if self.mode == BINARY_MODE:
                bs = y_pred.shape[0]
                y_pred = y_pred.reshape(bs, -1, 1)
                y_true = y_true.reshape(bs, -1, 1)
            return fused.fused_sigmoid_dice(
                y_pred, y_true, float(self.smooth), float(self.eps),
                bool(self.log_loss), self.ignore_index, self.classes,
            )
        if self.from_logits:
            # log-exp route keeps gradients alive at extreme logits
            # (reference dice.py:69-75)
            if self.mode == MULTICLASS_MODE:
                y_pred = jnp.exp(jax.nn.log_softmax(y_pred, axis=-1))
            else:
                y_pred = jnp.exp(jax.nn.log_sigmoid(y_pred))

        y_pred, y_true = flatten_for_iou(y_pred, y_true, self.mode, self.ignore_index)
        dims = (0, 1)  # reduce batch & positions, keep per-class score

        scores = soft_dice_score(y_pred, y_true.astype(y_pred.dtype), self.smooth, self.eps, dims)
        if self.log_loss:
            loss = -jnp.log(jnp.maximum(scores, self.eps))
        else:
            loss = 1.0 - scores

        # zero contribution of channels with no true pixels
        mask = y_true.sum(dims) > 0
        loss = loss * mask.astype(loss.dtype)

        if self.classes is not None:
            loss = loss[jnp.asarray(self.classes)]

        return loss.mean()
