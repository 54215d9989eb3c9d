"""Shared statistics for the quality studies (VERDICT r4 #6).

The round-3/4 studies reported point estimates from 4-8 scenes and one
seed, against effect sizes (TTA gain ~0.01 mIoU, mode delta ~0.001) well
inside one scene's noise.  This module provides the paired-bootstrap
machinery both studies now use to report mean +/- std and a 95% CI per
cell, pooled over >=16 held-out scenes x >=2 training seeds.

Deltas are PAIRED per (seed, scene): the same scene evaluated under two
modes shares its difficulty, so the bootstrap resamples per-scene
differences, not independent cells — the right test for "does mode A beat
mode B on the same inputs".
"""

import numpy as np

__all__ = ["bootstrap_ci", "summarize_cell", "paired_delta_report"]


def bootstrap_ci(values, n_boot: int = 10000, alpha: float = 0.05, seed: int = 0):
    """Percentile bootstrap CI of the mean of ``values``."""
    values = np.asarray(values, dtype=np.float64)
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, len(values), size=(n_boot, len(values)))
    means = values[idx].mean(axis=1)
    lo, hi = np.percentile(means, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return float(lo), float(hi)


def summarize_cell(name: str, values) -> dict:
    values = np.asarray(values, dtype=np.float64)
    lo, hi = bootstrap_ci(values)
    return {
        "name": name,
        "n": int(len(values)),
        "mean": float(values.mean()),
        "std": float(values.std(ddof=1)) if len(values) > 1 else 0.0,
        "ci95": (lo, hi),
    }


def paired_delta_report(label: str, a, b) -> dict:
    """Paired per-scene delta a - b with bootstrap CI and an explicit
    effect-vs-noise verdict: 'significant' iff the 95% CI excludes 0."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    delta = a - b
    cell = summarize_cell(label, delta)
    lo, hi = cell["ci95"]
    cell["significant"] = bool(lo > 0.0 or hi < 0.0)
    return cell


def print_cell(cell: dict, scale: float = 1.0, unit: str = ""):
    lo, hi = cell["ci95"]
    sig = ""
    if "significant" in cell:
        sig = "  [CI excludes 0]" if cell["significant"] else "  [not distinguishable from 0]"
    print(
        f"  {cell['name']:28s}: {cell['mean'] * scale:+.4f} +/- {cell['std'] * scale:.4f} "
        f"(95% CI [{lo * scale:+.4f}, {hi * scale:+.4f}], n={cell['n']}){sig}{unit}"
    )
