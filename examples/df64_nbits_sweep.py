"""df64 accuracy/cost frontier: sweep `df_n_bits` at the reference config.

The df64 engine's cost is dominated by slice-pair MXU passes
(~q(q+1)/2 einsums per operator apply, q = ceil(n_bits / b) — see
ops/doublefloat.make_ozaki_apply), so `df_n_bits` is a direct dial
between forward precision and wall time. This script measures, per
n_bits, the fused fwd+grad time and the J/gradient rel-err against the
pinned f64 CPU truth (`baselines/mixing256_truth.npz`, same seed-42 IC
stream as bench.py::bench_mixing) — the table BASELINE.md cites.

Run (TPU):  python examples/df64_nbits_sweep.py
Run (CPU):  SMO_PLATFORM=cpu python examples/df64_nbits_sweep.py --small
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="32x16 wiring check (in-process f64 truth)")
    ap.add_argument("--bits", type=int, nargs="+", default=[48, 40, 32])
    ap.add_argument("--batched", type=int, nargs="+", default=[0],
                    help="df_batched_einsums values to sweep (0/1)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache
    from spheremanopt_tpu.utils.platform import apply_platform

    apply_platform(os.environ.get("SMO_PLATFORM"), x64=None)
    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np

    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    if args.small:
        kw = dict(nx=32, nz=16, n_iters=30, dt=5e-3, prep_steps=10)
        import jax

        jax.config.update("jax_enable_x64", True)
        p64 = OptimalMixing(MixingConfig(dtype="float64", **kw))
        x32 = np.asarray(p64.generate_ic(seed=3)[0]).astype(np.float32)
        J64 = float(p64.objective([jnp.asarray(x32.astype(np.float64))]))
        g64 = np.asarray(
            p64.gradient([jnp.asarray(x32.astype(np.float64))])[0])
    else:
        kw = dict()
        truth = np.load(os.path.join(os.path.dirname(__file__), "..",
                                     "baselines", "mixing256_truth.npz"))
        x32 = np.asarray(truth["x0"], np.float32)
        J64 = float(truth["J"])
        g64 = np.asarray(truth["g"], np.float64)

    gn = np.linalg.norm(g64)
    rows = []
    for bat in args.batched:
        for nb in args.bits:
            p = OptimalMixing(MixingConfig(dtype="float32", s=1,
                                           solve_precision="df64",
                                           df_n_bits=nb,
                                           df_batched_einsums=bool(bat),
                                           **kw))
            x = [jnp.asarray(x32)]
            J, g = p.objective_and_gradient(x)   # compile + first run
            _ = float(J)   # SYNC before t0 (block_until_ready lies on
            #                axon — the host pull is the only fence)
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                J, g = p.objective_and_gradient(x)
            _ = float(J)                          # sync
            ms = (time.perf_counter() - t0) * 1e3 / args.repeats
            row = {
                "n_bits": nb,
                "batched": bool(bat),
                "q_slices": int(p._dfe._oS.re.slices_np.shape[0]),
                "ms": round(ms, 1),
                "rel_J": float(abs(float(J) - J64) / abs(J64)),
                "rel_g": float(np.linalg.norm(
                    np.asarray(g[0], np.float64) - g64) / gn),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            del p

    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
