"""Riemannian trust-region Newton (RTR) vs the reference's Wolfe+CG.

Runs a complete SH23 optimisation (the `FWD_Solve_SH23.py __main__`
config by default; --npts/--n-iters trim it) under the host CG+Wolfe
driver and under `optim/rtr.py`, and reports outer iterations /
evaluation ledger / wall-clock / final J. RTR is second-order
optimisation the reference lacks (`Sphere_Grad_Descent.py` is SD/CG +
line search only): exact autodiff Hessian-vector products drive a
Steihaug-Toint truncated-CG subproblem, giving locally Q-quadratic
convergence — the residual squares per outer step near the optimum.

On TPU this runs the XLA matmul method in f32 (RTR needs the
forward-linearizable gradient path, so no Pallas); RTR stops cleanly
when the predicted model decrease falls below eps(J) — in f32 that
floor arrives earlier than in the f64 CPU runs.

Run: python examples/rtr_newton_vs_cg.py [--npts 256] [--n-iters 1000]
"""

import argparse
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.optim.rtr import optimise_rtr
from spheremanopt_tpu.utils.platform import apply_platform


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=256)
    ap.add_argument("--n-iters", type=int, default=1000)
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--err-tol", type=float, default=1e-6)
    args = ap.parse_args()

    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)
    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

    on_tpu = apply_platform()
    enable_persistent_cache()   # warm repeats skip the remote compiles
    p = SwiftHohenberg(SH23Config(
        npts=args.npts, n_iters=args.n_iters, dt=0.05,
        dtype="float32" if on_tpu else "float64"))
    x0 = p.generate_ic(42)

    def run_cg():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return optimise_on_multi_sphere(
                x0, p.radii, p.objective, p.gradient, p.inner_product,
                err_tol=args.err_tol, max_iters=args.max_iters,
                alpha_k=float(np.pi), line_search="wolfe", method="cg",
                verbose=False, f_and_g=p.objective_and_gradient)

    def run_tr():
        return optimise_rtr(
            x0, p.radii, p.objective, p.gradient, p.inner_product,
            err_tol=args.err_tol, max_iters=args.max_iters, verbose=False)

    # cold = includes compiles; warm = persistent-cache hits only
    for name, fn in (("cg ", run_cg), ("rtr", run_tr)):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = fn()
            walls.append(time.perf_counter() - t0)
        extra = (f" hvp={r.hvp_evals:3d}" if name == "rtr" else "")
        print(f"{name}: iters={r.iterations:3d} f={r.function_evals:3d} "
              f"g={r.gradient_evals:3d}{extra} cold={walls[0]:7.3f}s "
              f"warm={walls[1]:7.3f}s J={r.function_values[-1]:.8f} "
              f"conv={r.converged}")
        if name == "rtr":
            if not r.converged:
                print(f"rtr stop: {r.message}")
            tail = np.asarray(r.residuals[0])[-4:]
            print("rtr residual tail:",
                  " -> ".join(f"{v:.2e}" for v in tail))


if __name__ == "__main__":
    main()
