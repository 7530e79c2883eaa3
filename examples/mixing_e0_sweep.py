"""Batched mixing study: mix-norm attainable vs perturbation energy E0.

The reference paper's mixing question — how much mixing a perturbation
of energy E0 can buy — is answered there one `mpiexec -np 4` run per E0
(`run_Poiseuille_problem.sh:16-17`, `FWD_Solve_Poiseuille.py:1746-1750`).
Here the WHOLE E0 sweep runs as one vmapped device-loop executable:
B complete strong-Wolfe+CG optimisations (1000-step Boussinesq forward
+ adjoint solves per line-search trial) batched onto the chip.

The operator stacks are threaded ONCE as an unbatched vmap operand
(in_axes=None — embedding them as constants is rejected by the compile
tunnel), so each step reads them once for the whole batch. Measured
(v5e, B=8, full reference config): batched 6.9 s vs sequential 7.9 s
per optimisation — +15% throughput plus one-dispatch amortisation, NOT
the ~Bx an MXU-lane argument predicts ((3nz,384)@(384,2) uses 2 of 128
lanes): consistent with the KDyn batched-scaling finding (BASELINE.md)
that these scan bodies sit at a per-element VMEM-traffic floor, which
batching multiplies. The capability value is the study-in-one-program:
the whole mix-norm-vs-E0 curve from one compile + one dispatch.

Run: python examples/mixing_e0_sweep.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing
from spheremanopt_tpu.utils.platform import apply_platform


def main(batch: int = 8) -> None:
    on_tpu = apply_platform()
    dtype = "float32" if on_tpu else "float64"
    if on_tpu:
        from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()
    if os.environ.get("SMO_SWEEP_TINY") == "1":   # CI/CPU smoke mode
        cfg = MixingConfig(dtype=dtype, nx=16, nz=16, n_iters=16,
                           prep_steps=4)
        max_iters = 3
    else:
        # full reference config: 256x128, 1000 steps, s=1 mix-norm
        cfg = MixingConfig(dtype=dtype)
        max_iters = 10
    p = OptimalMixing(cfg)

    fg, ops = p.objective_and_gradient_aux
    opt = jit_optimise_on_multi_sphere(
        fg, p.inner_product, p.radii,
        max_iters=max_iters, alpha0=100.0, cg=True, line_search="wolfe",
    )

    # sweep: E0 around the reference's 0.02 (one IC seed per point so
    # rows are independent studies, like the critical-seed example)
    e0s = jnp.asarray(np.geomspace(0.005, 0.08, batch), p._rdtype)
    x0s = jnp.stack([p.generate_ic(seed=s)[0] for s in range(batch)])

    batched = jax.jit(jax.vmap(
        lambda x, r, a: opt([x], radii_dyn=[r], aux=a),
        in_axes=(0, 0, None)))

    # timing rule (CLAUDE.md): end every timed region with a host VALUE
    # pull — block_until_ready can return early through the TPU tunnel
    t0 = time.perf_counter()
    res = batched(x0s, e0s, ops)
    float(jnp.sum(res.function_values))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = batched(x0s, e0s, ops)
    jf = np.asarray(res.function_values)
    t_batch = time.perf_counter() - t0

    # sequential reference: same compiled single-run executable
    r0 = opt([x0s[0]], radii_dyn=[e0s[0]], aux=ops)  # compile
    float(jnp.sum(r0.function_values))
    t0 = time.perf_counter()
    for i in range(batch):
        r = opt([x0s[i]], radii_dyn=[e0s[i]], aux=ops)
        float(jnp.sum(r.function_values))
    t_seq = time.perf_counter() - t0

    print(f"batch={batch} x {max_iters} Wolfe+CG iterations "
          f"(mixing {cfg.nx}x{cfg.nz}, {cfg.n_iters} steps/solve, s={cfg.s})")
    print(f"  batched: {t_batch:.2f}s total = {t_batch / batch:.3f}s per "
          f"optimisation  (first call {t_compile:.1f}s)")
    print(f"  sequential (same executable, one at a time): {t_seq:.2f}s "
          f"= {t_seq / batch:.3f}s per optimisation")
    print(f"  throughput gain: {t_seq / t_batch:.2f}x")
    # function_values records -J (reference reporting convention); the
    # s=1 objective IS the mix-norm (a minimisation), so print -values
    print("  E0        mix-norm(0) -> mix-norm(T_opt)")
    for i in range(batch):
        k = int(res.iterations[i])
        print(f"  {float(e0s[i]):.5f}  {-jf[i, 0]:.6f} -> "
              f"{-jf[i, max(k - 1, 0)]:.6f}  (iters={k})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
