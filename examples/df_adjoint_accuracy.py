"""Reproduce the r5 double-float-adjoint accuracy tables (BASELINE.md).

The df64 engines (mixing_df, kdyn_df) emulate an f64 FORWARD on f32
hardware; jax.grad of that forward still runs the reverse sweep in f32,
flooring the chaotic problems' gradients (mixing 5.9e-4, kdyn 1.05e-5
at their reference configs). `df_adjoint=True` evaluates the same
discrete adjoint with DF cotangent pairs through exact transposed Ozaki
contractions — measured on-chip: mixing 5.38e-8, kdyn 4.24e-8.

This script reproduces the CPU separation tables against in-process
f64 truth at small configs (minutes), or — with SMO_ON_CHIP=1 on the
TPU — the on-chip rows against the pinned truth files.

Usage:
    python examples/df_adjoint_accuracy.py [--problem mixing|kdyn]
        [--n-iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", choices=["mixing", "kdyn"],
                    default="mixing")
    ap.add_argument("--n-iters", type=int, default=100,
                    help="horizon; the DF-adjoint's win over the f32 "
                         "reverse sweep grows with it")
    args = ap.parse_args()

    import jax

    if os.environ.get("SMO_ON_CHIP") != "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    if args.problem == "mixing":
        from spheremanopt_tpu.problems.optimal_mixing import (
            MixingConfig as Cfg,
            OptimalMixing as Prob,
        )

        kw = dict(nx=32, nz=16, n_iters=args.n_iters, dt=1e-2,
                  prep_steps=5, s=1)
    else:
        from spheremanopt_tpu.problems.kinematic_dynamo import (
            KDynConfig as Cfg,
            KinematicDynamo as Prob,
        )

        kw = dict(npts=8, n_iters=args.n_iters, dt=2e-3, rm=1.0)

    p64 = Prob(Cfg(dtype="float64", **kw))
    x0 = [np.asarray(a, np.float64) for a in p64.generate_ic(seed=3)]
    g64 = [np.asarray(g, np.float64) for g in p64.gradient(x0)]
    x32 = [jnp.asarray(a, jnp.float32) for a in x0]

    def rel(a, b):
        return float(np.linalg.norm(np.asarray(a, np.float64) - b)
                     / np.linalg.norm(b))

    rows = []
    for label, extra in [("df64 (jax.grad, f32 reverse)", {}),
                         ("df64 + DF-ADJOINT", {"df_adjoint": True})]:
        t0 = time.time()
        p = Prob(Cfg(dtype="float32", solve_precision="df64",
                     **extra, **kw))
        g = p.gradient(x32)
        rels = [f"{rel(gi, gt):.3e}" for gi, gt in zip(g, g64)]
        rows.append((label, rels, time.time() - t0))

    print(f"\n{args.problem} {kw} — gradient rel-err vs f64 truth:")
    for label, rels, wall in rows:
        print(f"  {label:34s} {' / '.join(rels)}   ({wall:.0f}s incl. "
              "build+compile)")
    print("\nReference on-chip rows (BASELINE.md r5, reference configs "
          "vs pinned truths):")
    print("  mixing 256x128 x 1000: 5.86e-4 (plain) -> 5.38e-8 (adjoint)")
    print("  kdyn   24^3   x 2000: 1.05e-5 (plain) -> 4.24e-8 (adjoint)")


if __name__ == "__main__":
    main()
