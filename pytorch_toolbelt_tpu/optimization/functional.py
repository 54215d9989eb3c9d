"""Optimizer parameter-group machinery over pytrees
(parity target: pytorch_toolbelt/optimization/functional.py:12-251).

The torch reference builds param-group dicts for torch optimizers; the optax
idiom is labels + ``optax.multi_transform``.  ``build_optimizer_param_groups``
assigns every leaf a group label from prefix-matched layerwise LR/WD specs
(with ``_default_``), honoring no-weight-decay-on-bias/norm switches, and
verifies the leaf-count invariant like the reference.
"""

import numbers
from typing import Callable, Dict, Mapping, Optional, Tuple, Union

import jax
import numpy as np
import optax

from ..distributed.mesh import scale_learning_rate_for_ddp  # re-export location parity

__all__ = [
    "build_optimizer_param_groups",
    "make_optimizer",
    "freeze_parameters",
    "count_optimizable_parameters",
    "scale_learning_rate_for_ddp",
]

_NORM_MARKERS = ("BatchNorm", "GroupNorm", "LayerNorm", "InstanceNorm", "Normalization")


def _leaf_path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def build_optimizer_param_groups(
    params,
    learning_rate: Union[float, Mapping[str, float]],
    weight_decay: Union[float, Mapping[str, float]],
    apply_weight_decay_on_bias: bool = True,
    apply_weight_decay_on_norm: bool = True,
):
    """Assign each parameter leaf to a (lr, weight_decay) group.

    Args:
        params: parameter pytree (e.g. variables['params']).
        learning_rate: scalar or {prefix: lr, ..., '_default_': lr} matched
            against dotted leaf paths like 'encoder.Conv_0.kernel'.
        weight_decay: scalar or prefix-dict like learning_rate.

    Returns:
        (labels, groups, defaults):
        labels — pytree of group-name strings (for optax.multi_transform);
        groups — {name: {'lr': float, 'weight_decay': float, 'count': int}};
        defaults — {'lr': ..., 'weight_decay': ...}.
    """
    if isinstance(learning_rate, Mapping) and "_default_" not in learning_rate:
        raise RuntimeError(
            "When using layerwise learning rate, a key _default_ must be present to indicate default LR"
        )
    if isinstance(weight_decay, Mapping) and "_default_" not in weight_decay:
        raise RuntimeError(
            "When using layerwise weight decay, a key _default_ must be present to indicate default LR"
        )

    if isinstance(learning_rate, numbers.Number):
        learning_rate = {"_default_": float(learning_rate)}
    if isinstance(weight_decay, numbers.Number):
        weight_decay = {"_default_": float(weight_decay)}

    default_lr = float(learning_rate["_default_"])
    default_wd = float(weight_decay["_default_"])
    lr_items = [(k, v) for k, v in learning_rate.items() if k != "_default_"]
    wd_items = [(k, v) for k, v in weight_decay.items() if k != "_default_"]

    groups: Dict[str, Dict] = {}
    # Groups are identified by the (lr_index, wd_index) TUPLE — '_'-joined
    # strings can collide when prefixes themselves contain '_' (lr 'a' + wd
    # 'b_c' vs lr 'a_b' + wd 'c'), which would silently train the second set
    # of parameters with the first group's hyperparameters.  Display names
    # are de-duplicated with a numeric suffix when they clash.
    name_by_key: Dict[Tuple[str, str], str] = {}

    def label_for(path, leaf):
        name = _leaf_path_str(path)
        lr_index, lr_value = "default", default_lr
        for prefix, lr in lr_items:
            if name.startswith(prefix):
                lr_index, lr_value = prefix, float(lr)
                break
        wd_index, wd_value = "default", default_wd
        for prefix, wd in wd_items:
            if name.startswith(prefix):
                wd_index, wd_value = prefix, float(wd)
                break

        is_norm = any(m in name for m in _NORM_MARKERS)
        if not apply_weight_decay_on_norm and is_norm:
            wd_index, wd_value = "no_wd_on_norm", 0.0
        elif not apply_weight_decay_on_bias and name.endswith(".bias") and not is_norm:
            wd_index, wd_value = "no_wd_on_bias", 0.0

        key = (lr_index, wd_index)
        group_name = name_by_key.get(key)
        if group_name is None:
            group_name = lr_index if lr_index == wd_index else f"{lr_index}_{wd_index}"
            taken = set(name_by_key.values())
            if group_name in taken:
                suffix = 2
                while f"{group_name}~{suffix}" in taken:
                    suffix += 1
                group_name = f"{group_name}~{suffix}"
            name_by_key[key] = group_name
        entry = groups.setdefault(
            group_name, {"lr": lr_value, "weight_decay": wd_value, "count": 0}
        )
        entry["count"] += int(np.prod(leaf.shape))
        return group_name

    labels = jax.tree_util.tree_map_with_path(label_for, params)

    total = count_optimizable_parameters(params)
    grouped = sum(g["count"] for g in groups.values())
    if total != grouped:
        raise RuntimeError(
            f"Detected mismatch in total number of optimizable parameters ({total}) and "
            f"number of parameters across each groups ({grouped})."
        )

    defaults = {"lr": default_lr, "weight_decay": default_wd}
    return labels, groups, defaults


def make_optimizer(
    params,
    learning_rate: Union[float, Mapping[str, float]],
    weight_decay: Union[float, Mapping[str, float]] = 0.0,
    optimizer_factory: Callable[..., optax.GradientTransformation] = optax.adamw,
    apply_weight_decay_on_bias: bool = True,
    apply_weight_decay_on_norm: bool = True,
    **opt_kwargs,
) -> optax.GradientTransformation:
    """Build an optax optimizer with layerwise LR/WD groups via multi_transform."""
    labels, groups, _ = build_optimizer_param_groups(
        params,
        learning_rate,
        weight_decay,
        apply_weight_decay_on_bias=apply_weight_decay_on_bias,
        apply_weight_decay_on_norm=apply_weight_decay_on_norm,
    )
    transforms = {
        name: optimizer_factory(learning_rate=g["lr"], weight_decay=g["weight_decay"], **opt_kwargs)
        for name, g in groups.items()
    }
    return optax.multi_transform(transforms, labels)


def freeze_parameters(prefixes) -> Callable:
    """Return a label_fn usable with optax.multi_transform /
    optax.masked marking leaves under the given dotted-path prefixes as
    frozen (the functional analogue of reference ``freeze_model``,
    optimization/functional.py:224-251)."""
    if isinstance(prefixes, str):
        prefixes = (prefixes,)
    prefixes = tuple(prefixes)

    def mask_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: any(_leaf_path_str(path).startswith(p) for p in prefixes), params
        )

    return mask_fn


def count_optimizable_parameters(params) -> int:
    return sum(int(np.prod(leaf.shape)) for leaf in jax.tree_util.tree_leaves(params))
