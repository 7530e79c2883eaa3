"""Profiling utilities: jax.profiler traces + solve timing.

The reference's only instrumentation is two wall-clock prints in the
gradient test (`TestGrad.py:45-61`, SURVEY.md §5 'Tracing/profiling').
Here profiling is first-class:

  * `trace(dir)`        — context manager writing a TensorBoard-viewable
    jax.profiler trace of everything inside it
  * `time_solve(fn, *a)` — compile-then-steady timing of a jitted solve,
    returning (compile_s, steady_ms, result)
  * `flop_estimate(...)` — analytic FLOP counts for the spectral steps,
    to report achieved throughput against the v5e roofline
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_solve(fn: Callable, *args, repeats: int = 10):
    """(compile_seconds, steady_milliseconds, last_result)."""
    import jax

    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return compile_s, best * 1e3, r


def matmul_step_flops(n: int, steps: int, batch: int = 1, complex_ops: bool = False) -> float:
    """FLOPs of `steps` dense NxN matvec steps (x4 for complex)."""
    per = 2.0 * n * n * batch
    if complex_ops:
        per *= 4.0
    return per * steps
