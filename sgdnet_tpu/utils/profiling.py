"""Profiling hooks (SURVEY.md §5 rebuild obligation: JAX profiler hooks and
nnz/s + step-time counters).

`trace(dir)` wraps jax.profiler for TensorBoard-compatible device traces;
`time_fn` measures steady-state wall time of a jitted callable (compile
excluded, device-synchronized).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile to `log_dir` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 3, warmup: int = 1, **kwargs):
    """Steady-state seconds per call of `fn` (blocks on the result)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
