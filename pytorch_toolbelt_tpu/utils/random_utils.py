"""Seeding & run-name helpers (parity target: pytorch_toolbelt/utils/random_utils.py:14-56).

JAX has no global RNG — models take explicit PRNGKeys — so ``set_manual_seed``
seeds python/numpy and returns a fresh jax key for the caller to thread.
"""

import random
from typing import Optional

import jax
import numpy as np

from .namesgenerator import get_random_name

__all__ = ["set_manual_seed", "get_random_name", "get_rng_state", "set_rng_state"]


def set_manual_seed(seed: int) -> jax.Array:
    """Seed python and numpy global RNGs; return jax.random.PRNGKey(seed)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def get_rng_state() -> dict:
    return {
        "python": random.getstate(),
        "numpy": np.random.get_state(),
    }


def set_rng_state(state: dict) -> None:
    random.setstate(state["python"])
    np.random.set_state(state["numpy"])
