"""Checkpoint save/restore (SURVEY.md §5: the reference offers only weight
averaging + tolerant transfer; the TPU build adds real save/restore built on
orbax, plus RNG capture, keeping the reference's utilities pytree-native).
"""

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_exists"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree (params / train state / dict of arrays) to ``path``."""
    path = os.path.abspath(path)
    _checkpointer().save(path, state, force=force)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree saved with :func:`save_checkpoint`.

    ``target`` (optional) provides the pytree structure/dtypes to restore
    into; without it orbax returns the raw stored tree.
    """
    path = os.path.abspath(path)
    if target is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(path, item=target)
    return _checkpointer().restore(path)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
