"""Minimal-seed critical energy for Swift-Hohenberg by bisection.

The science question behind the reference's SH23 setup (arXiv:2210.17194):
what is the smallest initial energy E0 whose OPTIMAL seed still triggers
the nonlinear patterned state? The reference can only probe single E0
values (one optimisation = hours of CPU-Dedalus); here a full
200-iteration optimisation runs in ~2 s on one TPU chip via the
device-resident driver, so the critical energy can be BISECTED directly:

    E_c in [lo, hi]: at each E0, maximise J(u0) on the sphere <u0,u0>=E0;
    the seed "triggers" iff the optimised J exceeds a threshold far above
    the decaying branch.

Usage:
    python examples/sh23_critical_seed.py [--npts 256] [--t-final 50]
                                          [--bisections 8] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable without installing the package: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npts", type=int, default=256)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--t-final", type=float, default=50.0)
    ap.add_argument("--bisections", type=int, default=8)
    ap.add_argument("--max-iters", type=int, default=60)
    ap.add_argument("--lo", type=float, default=0.005)
    ap.add_argument("--hi", type=float, default=0.08)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    # JAX_PLATFORM_NAME=cpu still initialises the axon TPU plugin, which
    # hangs process startup whenever the tunnel is wedged (measured r3)
    # — honored via the shared in-process force (CLAUDE.md rule 5).
    from spheremanopt_tpu.utils.platform import apply_platform

    on_tpu = apply_platform(args.platform)
    import jax.numpy as jnp
    import numpy as np

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg

    dtype = "float32" if on_tpu else "float64"
    n_iters = int(round(args.t_final / args.dt))

    # One problem instance; the sphere radius enters only through the
    # optimiser, so a single compiled executable serves every E0.
    p = SwiftHohenberg(SH23Config(npts=args.npts, dt=args.dt,
                                  n_iters=n_iters, dtype=dtype))
    x0 = p.generate_ic(seed=42, e0=1.0)

    # Decay branch scale: J for a tiny seed (pure linear decay) sets the
    # "did not trigger" baseline; triggering exceeds it by orders.
    j_tiny = -float(p.objective([x0[0] * jnp.sqrt(1e-8)]))

    # ONE compiled executable with the radius as a traced argument: the
    # whole bisection sweep pays a single compile.
    opt = jit_optimise_on_multi_sphere(
        lambda xs: p._obj_and_grad(xs), p.inner_product, [1.0],
        max_iters=args.max_iters, alpha0=float(np.pi), cg=True,
    )

    def optimal_J(e0: float) -> float:
        r = opt(x0, radii_dyn=[jnp.asarray(e0)])
        k = int(r.iterations)
        return float(r.function_values[max(k - 1, 0)])

    t0 = time.time()
    j_lo, j_hi = optimal_J(args.lo), optimal_J(args.hi)
    # threshold: geometric midpoint between decay-scale J and triggered J
    threshold = 10.0 * max(j_lo, j_tiny * (args.lo / 1e-8))
    print(f"J_opt({args.lo}) = {j_lo:.4f}  J_opt({args.hi}) = {j_hi:.4f}  "
          f"threshold = {threshold:.4f}")
    assert j_hi > threshold > j_lo, (
        "bracket does not straddle the transition; widen [lo, hi]"
    )

    lo, hi = args.lo, args.hi
    history = []
    for i in range(args.bisections):
        mid = 0.5 * (lo + hi)
        j_mid = optimal_J(mid)
        triggered = j_mid > threshold
        history.append({"E0": mid, "J_opt": j_mid, "triggered": bool(triggered)})
        print(f"  bisect {i+1}: E0={mid:.6f}  J_opt={j_mid:.4f}  "
              f"{'TRIGGERED' if triggered else 'decayed'}")
        if triggered:
            hi = mid
        else:
            lo = mid

    e_c = 0.5 * (lo + hi)
    wall = time.time() - t0
    result = {
        "critical_seed_energy": e_c,
        "bracket": [lo, hi],
        "bisections": history,
        "wall_time_s": round(wall, 1),
        "config": {"npts": args.npts, "dt": args.dt, "T": args.t_final,
                   "max_iters_per_optim": args.max_iters},
    }
    print(json.dumps({k: v for k, v in result.items() if k != "bisections"}))
    return result


if __name__ == "__main__":
    main()
