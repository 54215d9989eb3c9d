"""Model ensembling (parity target:
pytorch_toolbelt/inference/ensembling.py:12-215).

Models are plain callables.  The TPU-native Ensembler can additionally run
all members as ONE vmapped forward over stacked parameter pytrees
(``Ensembler.from_stacked``) — the reference runs members sequentially.

``average_checkpoints`` averages parameter pytrees (the reference averages
torch state-dicts, ensembling.py:166-215).
"""

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from .tta import _deaugment_averaging

__all__ = [
    "ApplySoftmaxTo",
    "ApplySigmoidTo",
    "Ensembler",
    "PickModelOutput",
    "SelectByIndex",
    "average_checkpoints",
]


def _as_key_tuple(output_key) -> tuple:
    return (output_key,) if isinstance(output_key, (str, int)) else tuple(set(output_key))


class ApplySoftmaxTo:
    """Apply temperature-scaled softmax to named outputs of a model callable."""

    def __init__(self, model_fn: Callable, output_key="logits", axis: int = -1, temperature: float = 1):
        self.model_fn = model_fn
        self.output_keys = _as_key_tuple(output_key)
        self.axis = axis
        self.temperature = temperature

    def __call__(self, *args, **kwargs):
        output = self.model_fn(*args, **kwargs)
        output = dict(output) if isinstance(output, dict) else list(output) if isinstance(output, list) else output
        for key in self.output_keys:
            output[key] = jax.nn.softmax(output[key] * self.temperature, axis=self.axis)
        return output


class ApplySigmoidTo:
    """Apply temperature-scaled sigmoid to named outputs of a model callable."""

    def __init__(self, model_fn: Callable, output_key="logits", temperature: float = 1):
        self.model_fn = model_fn
        self.output_keys = _as_key_tuple(output_key)
        self.temperature = temperature

    def __call__(self, *args, **kwargs):
        output = self.model_fn(*args, **kwargs)
        output = dict(output) if isinstance(output, dict) else list(output) if isinstance(output, list) else output
        for key in self.output_keys:
            output[key] = jax.nn.sigmoid(output[key] * self.temperature)
        return output


class Ensembler:
    """Average outputs of several models (tensor / dict / list aware)."""

    def __init__(self, models: Sequence[Callable], reduction: str = "mean", outputs: Optional[Iterable] = None):
        self.models = list(models)
        self.reduction = reduction
        self.return_some_outputs = outputs is not None
        self.outputs = tuple(outputs) if outputs else tuple()

    @classmethod
    def from_stacked(
        cls,
        apply_fn: Callable,
        stacked_params,
        reduction: str = "mean",
        outputs: Optional[Iterable] = None,
    ) -> "Ensembler":
        """TPU-native fast path: all members share one architecture; their
        params are stacked along axis 0 and the forward is vmapped — one
        batched program instead of N sequential forwards."""

        def vmapped(*args, **kwargs):
            outs = jax.vmap(lambda p: apply_fn(p, *args, **kwargs))(stacked_params)
            # emulate list-of-outputs for the reduction path below
            if isinstance(outs, dict):
                n = jax.tree_util.tree_leaves(outs)[0].shape[0]
                return [
                    {k: v[i] for k, v in outs.items()} for i in range(n)
                ]
            return [outs[i] for i in range(outs.shape[0])]

        ensemble = cls(models=[], reduction=reduction, outputs=outputs)
        ensemble._stacked_forward = vmapped
        return ensemble

    _stacked_forward = None

    def __call__(self, *args, **kwargs):
        if self._stacked_forward is not None:
            outputs = self._stacked_forward(*args, **kwargs)
        else:
            outputs = [model(*args, **kwargs) for model in self.models]

        output_is_dict = isinstance(outputs[0], dict)
        output_is_list = isinstance(outputs[0], (list, tuple))

        if self.return_some_outputs:
            keys = self.outputs
        elif output_is_dict:
            keys = outputs[0].keys()
        elif output_is_list:
            keys = list(range(len(outputs[0])))
        else:
            keys = None

        if keys is None:
            return _deaugment_averaging(jnp.stack(outputs), self.reduction)

        averaged = {} if output_is_dict else []
        for key in keys:
            predictions = jnp.stack([output[key] for output in outputs])
            predictions = _deaugment_averaging(predictions, self.reduction)
            if output_is_dict:
                averaged[key] = predictions
            else:
                averaged.append(predictions)
        return averaged


class PickModelOutput:
    """Wrap a model returning dict/list, return only output[key]."""

    def __init__(self, model_fn: Callable, key):
        self.model_fn = model_fn
        self.target_key = key

    def __call__(self, *args, **kwargs):
        return self.model_fn(*args, **kwargs)[self.target_key]


class SelectByIndex:
    """Select output[key] from an already-computed outputs container."""

    def __init__(self, key):
        self.target_key = key

    def __call__(self, outputs):
        return outputs[self.target_key]


def average_checkpoints(params_list: Sequence) -> object:
    """Average a list of parameter pytrees (SWA-style).

    All pytrees must share treedef.  Floating leaves are averaged; integer
    leaves are summed then floor-divided (matching reference
    ensembling.py:207-213).
    """
    if len(params_list) == 0:
        raise ValueError("Need at least one checkpoint")
    num = len(params_list)

    def avg(*leaves):
        first = leaves[0]
        total = leaves[0]
        for leaf in leaves[1:]:
            total = total + leaf
        if jnp.issubdtype(jnp.asarray(first).dtype, jnp.floating):
            return total / num
        return total // num

    return jax.tree_util.tree_map(avg, *params_list)
