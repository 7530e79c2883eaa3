"""Multi-device sharded optimisation of the Boussinesq mixing problem.

The SECOND configuration the reference runs distributed
(`mpiexec -np 4 python3 FWD_Solve_Poiseuille.py`, README.md:106-110;
Dedalus decomposes the Fourier-x direction over ranks). Here the grid
state is decomposed over the mesh's x axis under GSPMD, the per-kx tau
solves parallelise over the coefficient axis, and the COMPLETE
Wolfe/Armijo + SD/CG optimisation runs as one executable with sharded
state end-to-end. The per-kx operator stacks ride the device driver's
aux-operand path (too large to embed as program constants) replicated
over the mesh.

Runs anywhere: on a CPU host it forces an N-virtual-device mesh so the
sharded code paths execute exactly as they would across N TPU chips.

Usage:
    python examples/mixing_sharded_optimisation.py [--devices 8]
        [--nx 32] [--nz 16] [--steps 20] [--iters 5] [--ls wolfe]
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
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--nx", type=int, default=32,
                    help="Fourier-x modes; 1.5*nx must divide --devices")
    ap.add_argument("--nz", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--s", type=int, choices=[0, 1], default=1)
    ap.add_argument("--ls", choices=["wolfe", "armijo"], default="wolfe")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()

    # device-count forcing must happen before the jax backend initialises
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()
    import jax

    # JAX_PLATFORM_NAME=cpu still initialises the axon TPU plugin, which
    # hangs process startup whenever the tunnel is wedged (measured r3)
    # — honored via the shared in-process force (CLAUDE.md rule 5).
    from spheremanopt_tpu.utils.platform import apply_platform

    apply_platform(args.platform, x64=None)
    if args.platform is None and len(jax.devices()) < args.devices:
        # The backend is initialised the moment jax.devices() runs, so a
        # jax_platforms update here would be a silent no-op — restart the
        # script with the platform forced instead (the --platform branch
        # above runs BEFORE any backend touch, so the re-exec'd process
        # genuinely lands on the N-virtual-device CPU mesh).
        os.execv(sys.executable,
                 [sys.executable, sys.argv[0], *sys.argv[1:],
                  "--platform", "cpu"])

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.parallel.mesh import make_mesh
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    p = OptimalMixing(MixingConfig(nx=args.nx, nz=args.nz,
                                   n_iters=args.steps, prep_steps=5,
                                   s=args.s, dtype="float32"))
    mesh = make_mesh(args.devices)
    fg, ops = p.objective_and_gradient_aux
    rep = NamedSharding(mesh, P())
    ops = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), rep), ops)
    x0 = p.generate_ic(seed=3)
    x0 = [jax.device_put(np.asarray(x0[0]),
                         NamedSharding(mesh, P(None, "x", None)))]

    opt = jit_optimise_on_multi_sphere(
        fg, p.inner_product, p.radii,
        max_iters=args.iters, alpha0=10.0, cg=True, err_tol=1e-12,
        line_search=args.ls,
    )
    t0 = time.time()
    res = opt(x0, None, ops)
    jax.block_until_ready(res.x_opt)
    wall = time.time() - t0

    k = int(res.iterations)
    print(json.dumps({
        "devices": args.devices,
        "mesh": str(mesh),
        "grid": f"{p.mgx}x{p.mgz}",
        "objective": "mix-norm (s=1)" if args.s == 1 else "KE (s=0)",
        "line_search": args.ls,
        "iterations": k,
        "J_trajectory": [round(float(v), 8) for v in res.function_values[:k]],
        "final_sharding": str(res.x_opt[0].sharding),
        "wall_s": round(wall, 2),
    }, indent=2))


if __name__ == "__main__":
    main()
