"""Batched optimisation sweep: a WHOLE family of sphere-constrained
optimisations in one vmapped executable.

`jax.vmap` over the device-resident driver (optim/jit_driver) runs B
complete strong-Wolfe+CG optimisations — forward solves, adjoint
sweeps, bracketing line searches, retractions — as ONE program whose
every operation is batched onto the MXU. This is a capability class the
reference cannot express at any cost: its optimiser is a Python loop
around MPI-parallel Dedalus solves (one optimisation per `mpiexec`
invocation, `run_Poiseuille_problem.sh:16-17`), so a B-point sweep of
the seed-energy axis costs B full runs. Here the marginal cost of extra
sweep points is a fraction of one run's wall-clock until the chip
saturates.

The sweep axis is the sphere radius E0 (the reference paper's bisection
axis — see examples/sh23_critical_seed.py, which reuses ONE compiled
executable sequentially; this example instead runs the whole sweep
concurrently) plus an independent IC seed per point.

Run: python examples/sh23_batch_sweep.py [B]
"""

import os
import sys
import time

# runnable without installing the package: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg


from spheremanopt_tpu.utils.platform import apply_platform


def main(batch: int = 8) -> None:
    on_tpu = apply_platform()
    dtype = "float32" if on_tpu else "float64"
    if os.environ.get("SMO_SWEEP_TINY") == "1":   # CI/CPU smoke mode
        cfg = SH23Config(dtype=dtype, npts=48, n_iters=50)
        max_iters = 4
    else:
        cfg = SH23Config(dtype=dtype)  # full reference config: N=256, 1001 steps
        max_iters = 30
    p = SwiftHohenberg(cfg)

    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=max_iters, alpha0=float(np.pi), cg=True,
        line_search="wolfe",
    )

    # sweep: E0 spanning the subcritical->triggering range, one seed each
    e0s = jnp.asarray(np.linspace(0.02, 0.10, batch))
    x0s = jnp.stack([p.generate_ic(seed=s)[0] for s in range(batch)])

    batched = jax.jit(jax.vmap(lambda x, r: opt([x], radii_dyn=[r])))

    # timing rule (CLAUDE.md): end every timed region with a host VALUE
    # pull — block_until_ready can return early through the TPU tunnel
    t0 = time.perf_counter()
    res = batched(x0s, e0s)
    float(jnp.sum(res.function_values))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = batched(x0s, e0s)
    jf = np.asarray(res.function_values)
    t_batch = time.perf_counter() - t0

    # sequential reference: same compiled single-run executable
    r0 = opt([x0s[0]], radii_dyn=[e0s[0]])  # compile
    float(jnp.sum(r0.function_values))
    t0 = time.perf_counter()
    for i in range(batch):
        r = opt([x0s[i]], radii_dyn=[e0s[i]])
        float(jnp.sum(r.function_values))
    t_seq = time.perf_counter() - t0

    print(f"batch={batch} x {max_iters} Wolfe+CG iterations "
          f"(SH23 N={cfg.npts}, {cfg.n_iters} steps/solve)")
    print(f"  batched: {t_batch:.2f}s total = {t_batch / batch:.3f}s per "
          f"optimisation  (first call {t_compile:.1f}s)")
    print(f"  sequential (same executable, one at a time): {t_seq:.2f}s "
          f"= {t_seq / batch:.3f}s per optimisation")
    print(f"  throughput gain: {t_seq / t_batch:.2f}x")
    for i in range(batch):
        k = int(res.iterations[i])
        print(f"  E0={float(e0s[i]):.4f}  J_final={jf[i, max(k - 1, 0)]:+.5f}"
              f"  iters={k}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
