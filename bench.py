"""Benchmark: SH23 (N=256, T=50, dt=0.05) forward+gradient wall-clock.

The unit of work is one (objective, gradient) evaluation pair — the
dominant cost of one optimisation iteration (SURVEY.md section 3.1: each
iteration is 1-3 FWD + 1-2 ADJ full PDE solves). TPU f32 (the axon TPU
rejects f64) vs the CPU baseline `baselines/sh23_numpy.py` — the same
discrete algorithm on numpy/pocketfft, i.e. reference-CPU-Dedalus minus
its Python overhead, making the baseline strictly stronger than the
reference as shipped (which publishes no numbers; BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu_ms>, "unit": "ms", "vs_baseline": <speedup>}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NPTS = 256
N_ITERS = 1000  # T=50, dt=0.05 (ref FWD_Solve_SH23.py __main__)
DT = 0.05
E0 = 0.0725


def bench_baseline_cpu(u0, repeats=3) -> float:
    sys.path.insert(0, "baselines")
    from sh23_numpy import SH23Numpy

    sim = SH23Numpy(npts=NPTS, dt=DT, n_iters=N_ITERS)
    sim.forward(u0)  # warm caches
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        J = sim.forward(u0)
        g = sim.gradient(u0)
        times.append(time.perf_counter() - t0)
    return min(times), float(J), np.asarray(g)


def bench_tpu(u0, repeats=10):
    import jax
    import jax.numpy as jnp

    from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = "float32" if on_tpu else "float64"
    p = SwiftHohenberg(SH23Config(npts=NPTS, n_iters=N_ITERS, dt=DT, e0=E0, dtype=dtype))
    x = [jnp.asarray(u0, p._rdtype)]

    # compile + warm up (fused forward+adjoint, the reference's
    # FWD-then-ADJ-with-shared-trajectory unit of work)
    J, g = p.objective_and_gradient(x)
    jax.block_until_ready((J, g))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        J, g = p.objective_and_gradient(x)
        jax.block_until_ready((J, g))
        times.append(time.perf_counter() - t0)
    return min(times), float(J), np.asarray(g[0])


def main():
    sys.path.insert(0, "baselines")
    from sh23_numpy import generate_ic_like

    u0 = generate_ic_like(npts=NPTS, seed=42, e0=E0)

    cpu_s, J_cpu, g_cpu = bench_baseline_cpu(u0)
    tpu_s, J_tpu, g_tpu = bench_tpu(u0)

    rel_J = abs(J_tpu - J_cpu) / abs(J_cpu)
    rel_g = float(np.linalg.norm(g_tpu - g_cpu) / np.linalg.norm(g_cpu))

    print(
        json.dumps(
            {
                "metric": "SH23 N=256 T=50 fwd+grad wall-clock (1 opt-iter unit)",
                "value": round(tpu_s * 1e3, 3),
                "unit": "ms",
                "vs_baseline": round(cpu_s / tpu_s, 2),
                "detail": {
                    "cpu_baseline_ms": round(cpu_s * 1e3, 3),
                    "J_rel_err_vs_f64_cpu": f"{rel_J:.2e}",
                    "grad_rel_err_vs_f64_cpu": f"{rel_g:.2e}",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
