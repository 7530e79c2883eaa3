"""Riemannian L-BFGS vs the reference's Wolfe+CG on complete workloads.

Runs the full SH23 reference optimisation (N=256, T=50, the
`FWD_Solve_SH23.py __main__` config) and the KDyn two-sphere workload
(24^3, 2000 steps, max_iters=10, `FWD_Solve_KDyn.py:1028-1036`) under
both search directions in the single-jit device driver, and reports
iterations / wall-clock / final J. L-BFGS is beyond the reference
(`Sphere_Grad_Descent.py` has only SD and hybrid FR-PR CG): the
measured win is fewer forward+adjoint solves to the same optimum.

Run: python examples/lbfgs_vs_cg.py [sh23|kdyn]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.utils.platform import apply_platform


def _steady(opt, x0, aux=None):
    """First call compiles; second call is the steady measurement. The
    returned scalar pull makes the timing honest through the tunnel."""
    r = opt(x0) if aux is None else opt(x0, aux=aux)
    k = int(r.iterations)  # value pull = completion barrier
    t0 = time.perf_counter()
    r = opt(x0) if aux is None else opt(x0, aux=aux)
    k = int(r.iterations)
    dt = time.perf_counter() - t0
    return r, k, dt


def run_sh23():
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    on_tpu = apply_platform()
    p = SwiftHohenberg(SH23Config(
        npts=256, n_iters=1000, dt=0.05,
        dtype="float32" if on_tpu else "float64"))
    x0 = p.generate_ic(42)
    for direction in ("cg", "lbfgs"):
        opt = jit_optimise_on_multi_sphere(
            p.objective_and_gradient, p.inner_product, p.radii,
            max_iters=200, alpha0=float(np.pi), line_search="wolfe",
            direction=direction)
        r, k, dt = _steady(opt, x0)
        print(f"sh23  {direction:5s}: iters={k:3d} steady={dt:7.3f}s "
              f"J={float(r.function_values[max(k - 1, 0)]):.6f}")


def run_kdyn():
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)

    on_tpu = apply_platform()
    p = KinematicDynamo(KDynConfig(
        npts=24, n_iters=2000, dt=5e-4,
        dtype="float32" if on_tpu else "float64"))
    x0 = p.generate_ic(42)
    for direction in ("cg", "lbfgs"):
        opt = jit_optimise_on_multi_sphere(
            p.objective_and_gradient, p.inner_product, p.radii,
            max_iters=10, alpha0=100.0, line_search="wolfe",
            direction=direction)
        r, k, dt = _steady(opt, x0)
        print(f"kdyn  {direction:5s}: iters={k:3d} steady={dt:7.3f}s "
              f"J={float(r.function_values[max(k - 1, 0)]):.6f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sh23"
    {"sh23": run_sh23, "kdyn": run_kdyn}[which]()
