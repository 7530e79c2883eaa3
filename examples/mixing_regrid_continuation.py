"""Coarse->fine mixing study via spectral resolution continuation.

The round-4 flagship workflow for `utils/regrid`: run the reference-
resolution 256x128 df64 mixing study, re-express its optimum on the
512x256 grid (`regrid_state`: rfft pad in x, Chebyshev coefficient pad
in z, sphere renormalisation), and continue the fine study warm. The
cold 512x256 study is the measured r4 baseline
(`runs/r4_mixing512_df64_nb32_postfix.npz`, BASELINE.md: mix-norm
0.0269 -> 0.0124 in 10 Wolfe+CG iterations); the warm study should
reach the same mix-norm class in a fraction of the fine-resolution
iterations, since the coarse study's descent happened at ~4x cheaper
per-iteration cost. The reference cannot run this protocol at all —
its restart requires the identical resolution
(`FWD_Solve_SH23.py:787-800`).

Run (TPU):  python examples/mixing_regrid_continuation.py
Run (CPU):  SMO_PLATFORM=cpu python examples/mixing_regrid_continuation.py --small
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def study(p, x0, max_iters, label):
    import numpy as np

    from spheremanopt_tpu import optimise_on_multi_sphere

    def cb(k, result):
        print(f"[{label}] iter {k}: "
              f"mix-norm={-result.function_values[-1]:.8f} "
              f"alpha={result.step_sizes[-1]:.4g}", flush=True)

    t0 = time.time()
    res = optimise_on_multi_sphere(
        x0, p.radii, p.objective_f64, p.gradient, p.inner_products,
        max_iters=max_iters, alpha_k=100.0, line_search="wolfe",
        cg=True, f_and_g=p.objective_and_gradient, callback=cb,
        verbose=False)
    wall = time.time() - t0
    print(f"[{label}] {res.iterations} iterations in {wall:.1f}s; "
          f"mix-norm {-res.function_values[0]:.6f} -> "
          f"{-res.function_values[-1]:.6f}", flush=True)
    return res, wall, [np.asarray(x) for x in res.x_opt]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="64x32 -> 128x64 wiring check")
    ap.add_argument("--coarse-iters", type=int, default=10)
    ap.add_argument("--fine-iters", type=int, default=5)
    ap.add_argument("--n-bits", type=int, default=32)
    ap.add_argument("--out", default="runs/mixing_regrid_continuation.json")
    args = ap.parse_args()

    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache
    from spheremanopt_tpu.utils.platform import apply_platform

    apply_platform(os.environ.get("SMO_PLATFORM"), x64=None)
    enable_persistent_cache()

    import numpy as np

    from spheremanopt_tpu.problems.optimal_mixing import (MixingConfig,
                                                          OptimalMixing)
    from spheremanopt_tpu.utils.regrid import regrid_state

    (cx, cz), (fx, fz) = (((64, 32), (128, 64)) if args.small
                          else ((256, 128), (512, 256)))
    n_steps = 100 if args.small else 1000

    def build(nx, nz):
        t0 = time.time()
        p = OptimalMixing(MixingConfig(nx=nx, nz=nz, dt=5e-3, n_iters=n_steps,
                                       s=1, dtype="float32",
                                       solve_precision="df64",
                                       df_n_bits=args.n_bits))
        print(f"{nx}x{nz} problem built: {time.time() - t0:.1f}s",
              flush=True)
        return p

    p_c = build(cx, cz)
    res_c, wall_c, x_c = study(p_c, p_c.generate_ic(seed=42),
                               args.coarse_iters, f"{cx}x{cz}")

    p_f = build(fx, fz)
    x_warm = regrid_state(p_f, x_c)
    print(f"regridded optimum: {[tuple(np.shape(x)) for x in x_c]} -> "
          f"{[tuple(np.shape(x)) for x in x_warm]}; "
          f"J_fine(start) = {float(p_f.objective_f64(x_warm)):.8f} "
          f"(coarse final {float(res_c.function_values[-1]):.8f})",
          flush=True)
    res_f, wall_f, _ = study(p_f, x_warm, args.fine_iters, f"{fx}x{fz} warm")

    out = {
        "coarse": {"nx": cx, "nz": cz, "iters": int(res_c.iterations),
                   "wall_s": round(wall_c, 1),
                   "mixnorm": [-float(v) for v in res_c.function_values]},
        "warm_fine": {"nx": fx, "nz": fz, "iters": int(res_f.iterations),
                      "wall_s": round(wall_f, 1),
                      "mixnorm": [-float(v) for v in res_f.function_values]},
        "cold_fine_reference": "runs/r4_mixing512_df64_nb32_postfix.npz",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("saved", args.out)


if __name__ == "__main__":
    main()
