"""Profiling / benchmarking utilities (SURVEY.md §5: the reference has no
profiler hooks; the TPU build makes jax.profiler traces and
block_until_ready timing first-class).
"""

import contextlib
import time
from typing import Callable, Dict, Optional

import jax

__all__ = ["trace", "benchmark", "Timer", "describe_compile"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Plain wall-clock timer. NOTE: jax dispatch is asynchronous — call
    jax.block_until_ready(...) on your outputs inside the block, or use
    :func:`benchmark`, to measure device execution rather than dispatch."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    **kwargs,
) -> Dict[str, float]:
    """Time a device function correctly: warmup (compile) excluded, all
    dispatches synchronized via block_until_ready.

    Returns {'mean_s', 'best_s', 'iters'}.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    if out is not None:
        jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {"mean_s": sum(times) / len(times), "best_s": min(times), "iters": iters}


def describe_compile(fn: Callable, *args, **kwargs) -> Dict[str, Optional[float]]:
    """Lower+compile a jitted function and report cost-analysis numbers
    (FLOPs, bytes accessed) from XLA when available."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    analysis = analysis or {}
    return {
        "flops": analysis.get("flops"),
        "bytes_accessed": analysis.get("bytes accessed"),
        "optimal_seconds": analysis.get("optimal_seconds"),
    }
