"""512x256 optimal-mixing study under the df64 gradient path.

Reproduces the round-4 BASELINE.md result: at double the reference
resolution the f32 Wolfe search cannot bracket past iteration 2 (the
measured 8.5e-2 f32 gradient floor — chaotic amplification through the
1000-step reverse sweep), while the f64-emulated forward
(`solve_precision="df64"`, ops/doublefloat + problems/mixing_df) runs
the full 10-iteration Wolfe+CG study: mix-norm 0.0269 -> 0.01238 in
493 s on one v5e chip (~40 s per accepted iteration; one-time costs:
~3 min f64 operator assembly + Ozaki splits at this resolution — the
parity-split builder, BASELINE.md r4 — disk-cached, plus the
first-compile through the tunnel).

Run (TPU):  python examples/mixing512_df64_study.py
Run (CPU):  SMO_PLATFORM=cpu python examples/mixing512_df64_study.py
            (slow; for wiring checks use --small)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="64x32 wiring check instead of the full study")
    ap.add_argument("--max-iters", type=int, default=10)
    ap.add_argument("--n-bits", type=int, default=48,
                    help="df64 Ozaki slice coverage; 32 is ~1.73x "
                         "faster at identical gradient accuracy "
                         "(BASELINE.md r4 n_bits sweep)")
    ap.add_argument("--df-adjoint", action="store_true",
                    help="hand-rolled DOUBLE-FLOAT adjoint (r5): DF "
                         "cotangent pairs through exact transposed "
                         "Ozaki contractions — gradient at the "
                         "f32-output class (~5e-8 vs truth at 256x128) "
                         "for ~2x the fused-call cost")
    ap.add_argument("--out", default="runs/mixing512_df64_study.npz")
    args = ap.parse_args()

    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache
    from spheremanopt_tpu.utils.platform import apply_platform

    apply_platform(os.environ.get("SMO_PLATFORM"), x64=None)
    enable_persistent_cache()

    import numpy as np

    from spheremanopt_tpu import optimise_on_multi_sphere
    from spheremanopt_tpu.problems.optimal_mixing import (MixingConfig,
                                                          OptimalMixing)

    nx, nz = (64, 32) if args.small else (512, 256)
    t0 = time.time()
    p = OptimalMixing(MixingConfig(nx=nx, nz=nz, dt=5e-3, n_iters=1000,
                                   s=1, dtype="float32",
                                   solve_precision="df64",
                                   df_n_bits=args.n_bits,
                                   df_adjoint=args.df_adjoint))
    print(f"problem built: {time.time() - t0:.1f}s", flush=True)
    x0 = p.generate_ic(seed=42)

    def cb(k, result):
        print(f"iter {k}: mix-norm={-result.function_values[-1]:.8f} "
              f"alpha={result.step_sizes[-1]:.4g}", flush=True)

    t0 = time.time()
    res = optimise_on_multi_sphere(
        x0, p.radii, p.objective_f64, p.gradient, p.inner_products,
        max_iters=args.max_iters, alpha_k=100.0, line_search="wolfe",
        cg=True, f_and_g=p.objective_and_gradient, callback=cb,
        verbose=False)
    print(f"{res.iterations} iterations in {time.time() - t0:.1f}s; "
          f"mix-norm {-res.function_values[0]:.6f} -> "
          f"{-res.function_values[-1]:.6f}", flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out,
             function_values=np.asarray(res.function_values),
             step_sizes=np.asarray(res.step_sizes),
             iterations=res.iterations)
    print("saved", args.out)


if __name__ == "__main__":
    main()
