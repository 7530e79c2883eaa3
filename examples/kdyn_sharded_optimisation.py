"""Multi-device sharded optimisation of the kinematic dynamo.

The TPU analogue of the reference's only distributed run mode
(`mpiexec -np 4 python3 FWD_Solve_KDyn.py`, README.md:79-83), but with
the COMPLETE optimisation — forward scans, fused adjoints, strong-Wolfe
or Armijo line searches, CG directions, retractions — compiled into one
executable whose state stays spatially sharded over a
`jax.sharding.Mesh` end-to-end (no allgather round-trips; the reference
replicates full fields on every rank per iteration).

Runs anywhere: on a CPU host it forces an 8-virtual-device mesh so the
sharded code paths execute exactly as they would across 8 TPU chips.

Usage:
    python examples/kdyn_sharded_optimisation.py [--devices 8]
        [--npts 16] [--steps 50] [--iters 10] [--ls wolfe]
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
    ap.add_argument("--npts", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ls", choices=["wolfe", "armijo"], default="wolfe")
    ap.add_argument("--mesh-shape", default=None, metavar="PX,PY",
                    help="2-D PENCIL decomposition instead of the 1-D "
                         "slab (KDynConfig.mesh_shape)")
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
        # single-chip host (e.g. the one-TPU tunnel): fall back to the
        # virtual CPU mesh so the sharded paths still execute. The
        # backend is initialised the moment jax.devices() runs, so a
        # jax_platforms update here would be a silent no-op — restart
        # with the platform forced (the --platform branch above runs
        # BEFORE any backend touch).
        os.execv(sys.executable,
                 [sys.executable, sys.argv[0], *sys.argv[1:],
                  "--platform", "cpu"])

    import numpy as np

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.parallel.mesh import make_mesh, shard_fields
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig,
        KinematicDynamo,
    )

    kw = dict(npts=args.npts, n_iters=args.steps, dt=1e-3, dtype="float32")
    if args.mesh_shape:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from spheremanopt_tpu.parallel.mesh import make_mesh2d

        px, py = (int(v) for v in args.mesh_shape.split(","))
        p = KinematicDynamo(KDynConfig(transform="distributed",
                                       mesh_shape=(px, py), **kw))
        mesh = make_mesh2d(px, py)
        sh = NamedSharding(mesh, P(None, "x", "y", None))
        x0 = [jax.device_put(np.asarray(x), sh) for x in p.generate_ic(seed=3)]
    else:
        p = KinematicDynamo(KDynConfig(**kw))
        mesh = make_mesh(args.devices)
        x0 = p.generate_ic(seed=3)
        x0 = shard_fields(mesh, [np.asarray(x) for x in x0], sharded_dim=1)

    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=args.iters, alpha0=100.0, cg=True, err_tol=1e-12,
        line_search=args.ls,
    )
    t0 = time.time()
    res = opt(x0)
    jax.block_until_ready(res.x_opt)
    wall = time.time() - t0

    k = int(res.iterations)
    print(json.dumps({
        "devices": args.devices,
        "mesh": str(mesh),
        "grid": f"{p.mg}^3",
        "line_search": args.ls,
        "iterations": k,
        "J_trajectory": [round(float(v), 8) for v in res.function_values[:k]],
        "final_sharding": str(res.x_opt[0].sharding),
        "wall_s": round(wall, 2),
    }, indent=2))


if __name__ == "__main__":
    main()
