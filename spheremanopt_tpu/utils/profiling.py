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


# ---------------------------------------------------------------------------
# Roofline accounting (TPU v5e, single chip). These functions record the
# hand arithmetic BASELINE.md previously argued in prose: dominant-term
# FLOP counts and minimum HBM operator/residual traffic per fused
# forward+gradient evaluation, so the bench can emit achieved GB/s /
# GFLOP/s against the chip peaks (VERDICT r2 weak item 3).
# ---------------------------------------------------------------------------

# Public v5e specs: 197 TFLOP/s bf16 MXU, 819 GB/s HBM bandwidth.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_GBPS = 819.0


def passes_for(mode: str) -> int:
    """MXU passes per f32 dot for a precision-mode string (the single
    source of truth for roofline FLOP multipliers). f64/CPU paths
    execute plain dots — callers must pass their EFFECTIVE mode, not
    the config string, when falling back off-TPU."""
    return {"compensated": 3, "high": 3, "highest": 6}.get(mode, 1)


def roofline(ms: float, flops: float, hbm_bytes: float) -> dict:
    """Achieved throughput of one fused fwd+grad against the v5e peaks.

    `flops` counts MXU-pass FLOPs actually executed (multi-pass precision
    modes already multiplied in by the caller); `hbm_bytes` is the
    modelled MINIMUM HBM traffic (loop-invariant operators re-streamed
    per step + trajectory residuals once each way) — a lower bound, so
    achieved_GBps is likewise a lower bound on real traffic."""
    s = ms / 1e3
    return {
        "model_gflops": round(flops / 1e9, 1),
        "model_hbm_gb": round(hbm_bytes / 1e9, 3),
        "achieved_gflops_per_s": round(flops / s / 1e9, 1),
        "achieved_hbm_gbps": round(hbm_bytes / s / 1e9, 1),
        "pct_peak_mxu": round(100.0 * flops / s / V5E_PEAK_BF16_FLOPS, 2),
        "pct_peak_hbm": round(100.0 * (hbm_bytes / s / 1e9) / V5E_HBM_GBPS, 1),
    }


def sh23_cost_model(npts: int, n_steps: int, pad: float = 2.0,
                    bytes_per: int = 4, passes: int = 1):
    """(flops, hbm_bytes) of a fused fwd+grad: per step one (mg x mg)
    real matvec forward and its transpose in the VJP sweep; the step
    matrix M re-streams from HBM both ways (the measured binding cost,
    BASELINE.md round 1); residual vectors stored+reloaded once."""
    mg = int(round(npts * pad))
    flops = 2.0 * (2.0 * mg * mg) * n_steps * passes
    op_bytes = 2.0 * mg * mg * bytes_per * n_steps
    res_bytes = 2.0 * mg * bytes_per * n_steps
    return flops, op_bytes + res_bytes


def shb23_cost_model(n_eff: int, n_steps: int, bytes_per: int = 4,
                     passes: int = 1):
    """Like sh23 but the SBDF1 step applies TWO dense (n x n) grid-space
    propagators (A_lin, A_nl) and the VJP applies both transposes."""
    flops = 2.0 * 2.0 * (2.0 * n_eff * n_eff) * n_steps * passes
    op_bytes = 4.0 * n_eff * n_eff * bytes_per * n_steps
    res_bytes = 2.0 * n_eff * bytes_per * n_steps
    return flops, op_bytes + res_bytes


def kdyn_cost_model(npts: int, n_steps: int, pad: float = 1.5,
                    bytes_per: int = 4, passes: int = 1):
    """Dominant terms of the CNAB1 induction step: six per-axis complex
    DFT einsums (3 inverse to the padded grid, 3 forward back) over the
    3-component field, forward + VJP (2x). The DFT matrices are tiny
    (VMEM-resident); traffic is the field intermediates (~10 complex /
    real (3, mg, mg, *) arrays per step each way) plus the remat
    recompute (counted in the 2x VJP factor: forward is re-executed
    once under jax.checkpoint)."""
    mg = int(round(npts * pad))
    n = npts
    nzr = n // 2 + 1
    # inverse transforms (coeff -> grid), complex x complex = 8 real flops
    inv = 8.0 * 3.0 * (mg * n * n * nzr + mg * mg * n * nzr
                       + mg * mg * mg * nzr)
    fwd_t = inv  # forward transforms mirror the shapes
    per_step = inv + fwd_t
    # fwd + remat-recompute + reverse sweep ~ 3x the per-step transforms
    flops = 3.0 * per_step * n_steps * passes
    field_bytes = 3.0 * mg * mg * mg * bytes_per
    hbm = 3.0 * 10.0 * field_bytes * n_steps
    return flops, hbm


def mixing_cost_model(nx: int, nz: int, n_steps: int, bytes_per: int = 4,
                      passes: int = 1, blocked: bool = True):
    """Dominant term: the batched per-kx tau solve, (kxn, 3nz x 3nz)
    complex applied as real-plane dots (4 real dots of h x h per kx in
    the blocked two-family form). Operator stacks re-stream per step in
    the worst case (XLA pins them in VMEM when they fit — so the
    bandwidth figure is an upper-bound model, flagged in the bench)."""
    kxn = nx // 2 + 1
    m = 3 * nz
    h = m // 2 if blocked else m
    fam = 2 if blocked else 1
    # real-plane packed form: 2 plane-dots x (h x h x 2ch) per family
    per_step = fam * 2.0 * (2.0 * h * h * 2.0) * kxn
    flops = 3.0 * per_step * n_steps * passes   # fwd + recompute + VJP
    op_bytes = fam * 2.0 * h * h * bytes_per * kxn
    hbm = 2.0 * op_bytes * n_steps
    return flops, hbm
