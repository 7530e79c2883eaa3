"""Critical magnetic Reynolds number of the optimal kinematic dynamo.

Answers the threshold question behind the reference's dynamo problem
(`FWD_Solve_KDyn.py:7-23`: maximise J = <B_T, B_T> over BOTH the seed
field B_0 and the stirring field U on unit spheres): the smallest Rm at
which the OPTIMAL pair amplifies the magnetic energy over the horizon,
i.e. J_opt(Rm) = <B_T,B_T> crosses <B_0,B_0> = 1. Below Rm_c every
stirring strategy loses energy to diffusion over [0, T]; above it the
optimiser finds a transiently amplifying dynamo.

Each bisection probe is a COMPLETE device-resident Wolfe+CG optimisation
(the reference's whole `mpiexec` workload per Rm, README.md:79-83) — but
ONE compiled executable serves every probe: the Rm-dependent CNAB1
diagonal factors enter as traced operands via
`KinematicDynamo.objective_and_gradient_rm`, so changing Rm costs zero
recompiles (same design as the traced sphere radius in
`sh23_critical_seed.py`).

Usage:
    python examples/kdyn_critical_rm.py                 # full 24^3 config
    python examples/kdyn_critical_rm.py --npts 8 --steps 50 --platform cpu
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

# runnable without installing the package: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=24)
    ap.add_argument("--dt", type=float, default=5e-4)
    ap.add_argument("--steps", type=int, default=2000,
                    help="time steps (T = steps * dt; ref T=1)")
    ap.add_argument("--iters", type=int, default=10,
                    help="optimisation iterations per probe (ref max_iters)")
    ap.add_argument("--alpha", type=float, default=100.0)
    ap.add_argument("--lo", type=float, default=0.5)
    ap.add_argument("--hi", type=float, default=16.0)
    ap.add_argument("--bisections", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    # JAX_PLATFORM_NAME=cpu still initialises the axon TPU plugin, which
    # hangs process startup whenever the tunnel is wedged (measured r3)
    # — honored via the shared in-process force (CLAUDE.md rule 5).
    # x64 follows the RESOLVED platform, not just --platform: a CPU
    # selected via JAX_PLATFORM_NAME or a CPU-only host must not run the
    # 'float64' config silently downcast to f32.
    from spheremanopt_tpu.utils.platform import apply_platform

    on_tpu = apply_platform(args.platform)
    import numpy as np

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig,
        KinematicDynamo,
    )
    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    dtype = "float32" if on_tpu else "float64"
    p = KinematicDynamo(KDynConfig(
        npts=args.npts, n_iters=args.steps, dt=args.dt, dtype=dtype))

    fg, make_ops = p.objective_and_gradient_rm
    opt = jit_optimise_on_multi_sphere(
        fg, p.inner_product, [1.0, 1.0],
        max_iters=args.iters, alpha0=args.alpha, cg=True,
        line_search="wolfe", err_tol=1e-12)
    x0 = [jax.numpy.asarray(x) for x in p.generate_ic(seed=42)]

    history = []

    def j_opt(rm: float) -> float:
        """Best <B_T,B_T> the optimiser reaches at this Rm."""
        t0 = time.perf_counter()
        res = opt(x0, aux=make_ops(rm))
        j = float(np.nanmax(np.asarray(res.function_values)))
        history.append({"rm": rm, "J_opt": j,
                        "wall_s": round(time.perf_counter() - t0, 3)})
        print(f"  Rm = {rm:8.4f}: J_opt = {j:.6f} "
              f"({'growth' if j > 1.0 else 'decay'}) "
              f"[{history[-1]['wall_s']} s]", flush=True)
        return j

    print(f"bracketing on [{args.lo}, {args.hi}] "
          f"(grid {args.npts}^3, T = {args.steps * args.dt}, "
          f"{args.iters} Wolfe+CG iterations per probe)")
    j_lo, j_hi = j_opt(args.lo), j_opt(args.hi)
    if not (j_lo < 1.0 < j_hi):
        raise SystemExit(
            f"bracket invalid: J_opt({args.lo}) = {j_lo:.4f}, "
            f"J_opt({args.hi}) = {j_hi:.4f} — need J<1 at lo, J>1 at hi "
            "(widen --lo/--hi or increase --iters)")

    lo, hi = math.log2(args.lo), math.log2(args.hi)
    for _ in range(args.bisections):
        mid = 0.5 * (lo + hi)
        if j_opt(2.0 ** mid) > 1.0:
            hi = mid
        else:
            lo = mid
    rm_c = 2.0 ** (0.5 * (lo + hi))
    err = 2.0 ** hi - 2.0 ** lo

    out = {
        "metric": "critical Rm for optimal transient dynamo amplification",
        "rm_c": round(rm_c, 5),
        "plus_minus": round(0.5 * err, 5),
        "horizon_T": args.steps * args.dt,
        "grid": f"{args.npts}^3",
        "opt_iters_per_probe": args.iters,
        "n_probes": len(history),
        "total_wall_s": round(sum(h["wall_s"] for h in history), 2),
        "probes": history,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
