"""Measured value of resolution continuation (utils/regrid) on SH23.

Protocol (all through the single-jit device loop, method='pallas'):
  1. COLD fine study: npts=256 reference workload (max_iters=200,
     Wolfe+CG, alpha0=pi) from the seeded IC.
  2. Coarse study: the SAME physical problem at npts=128 from the
     matching coarse IC.
  3. WARM fine study: regrid the coarse optimum onto the 256-grid
     (spectral zero-pad + sphere renormalisation) and run the fine
     workload from it.

Reported: J trajectory heads, the warm run's starting J vs the cold
run's, and the first iteration at which each run reaches the cold
run's final J (within rel_tol) — the study-cost saving the reference
cannot realise (its restart requires the identical resolution,
FWD_Solve_SH23.py:787-800).

Run on the TPU: `python examples/regrid_warmstart.py`
(CPU check: prepend jax_platforms=cpu via SMO_FORCE_CPU=1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("SMO_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg
from spheremanopt_tpu.utils.regrid import regrid_state

NPTS_FINE = int(os.environ.get("SMO_WS_FINE", "256"))
NPTS_COARSE = int(os.environ.get("SMO_WS_COARSE", "128"))
N_ITERS = int(os.environ.get("SMO_WS_NSTEPS", "50"))
DT, E0 = 0.05, 0.0725
MAX_ITERS = int(os.environ.get("SMO_WS_MAXITERS", "200"))
REL_TOL = 1e-3


def make(npts):
    p = SwiftHohenberg(SH23Config(npts=npts, n_iters=N_ITERS, dt=DT, e0=E0,
                                  dtype="float32", method="pallas"))
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=MAX_ITERS, alpha0=float(np.pi), cg=True,
        line_search="wolfe")
    return p, opt


def run(opt, x0):
    t0 = time.perf_counter()
    r = opt([jnp.asarray(np.asarray(x), jnp.float32) for x in x0])
    jf = np.asarray(r.function_values)
    wall = time.perf_counter() - t0
    k = int(r.iterations)
    return jf[:k], [np.asarray(x) for x in r.x_opt], wall


def iters_to(jf, target):
    hit = np.nonzero(jf >= target)[0]
    return int(hit[0]) + 1 if hit.size else None


def main():
    p_f, opt_f = make(NPTS_FINE)
    p_c, opt_c = make(NPTS_COARSE)

    # cold fine study (first call compiles; the timing below is warm)
    x0_f = p_f.generate_ic(seed=42)
    run(opt_f, x0_f)                         # compile
    j_cold, _, w_cold = run(opt_f, x0_f)

    x0_c = p_c.generate_ic(seed=42)
    run(opt_c, x0_c)                         # compile
    j_coarse, x_coarse, w_coarse = run(opt_c, x0_c)

    x_warm = regrid_state(p_f, x_coarse)
    j_warm, _, w_warm = run(opt_f, x_warm)

    target = float(j_cold[-1]) * (1.0 - REL_TOL)
    out = {
        "cold": {"iters": len(j_cold), "J_final": float(j_cold[-1]),
                 "J_start": float(j_cold[0]), "wall_s": round(w_cold, 4),
                 "iters_to_target": iters_to(j_cold, target)},
        "coarse": {"iters": len(j_coarse), "J_final": float(j_coarse[-1]),
                   "wall_s": round(w_coarse, 4)},
        "warm": {"iters": len(j_warm), "J_final": float(j_warm[-1]),
                 "J_start": float(j_warm[0]), "wall_s": round(w_warm, 4),
                 "iters_to_target": iters_to(j_warm, target)},
        "target_J": target,
        "rel_tol": REL_TOL,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
