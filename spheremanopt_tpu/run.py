"""CLI entry point: configure and run any problem's optimisation.

The reference's "CLI" is `mpiexec -np N python3 FWD_Solve_*.py` with
hard-coded constants in `__main__` blocks plus a shell orchestration
script (`run_Poiseuille_problem.sh` — components 'CLI/run script' in
SURVEY.md). Here every problem is runnable with config overrides:

    python -m spheremanopt_tpu.run sh23 --max-iters 20 --out-dir Test/
    python -m spheremanopt_tpu.run kdyn --cost Final --cg --ls wolfe
    python -m spheremanopt_tpu.run mixing --s 1 --nx 64 --nz 32
    python -m spheremanopt_tpu.run pca --dim 100
    python -m spheremanopt_tpu.run sh23 --test-grad      # Taylor test only

Outputs per run directory: optimisation progress checkpoint
(DAL_PROGRESS.npz), per-iteration diagnostics archives, convergence plot,
energy-series plot, and a text log — the reference's DAL_PROGRESS.h5 /
File_Manips / plot_figure_* pipeline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="spheremanopt_tpu.run", description=__doc__)
    ap.add_argument("problem",
                    choices=["pca", "sh23", "shb23", "kdyn", "mixing",
                             "doctor"],
                    help="problem to run, or 'doctor' for an environment "
                         "health report (CPU/TPU probes, caches, native IO)")
    ap.add_argument("--out-dir", default="runs/latest")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dtype", default=None, help="float32|float64 (default: auto)")
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    # optimiser knobs (reference kwargs, `Sphere_Grad_Descent.py:692`)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--err-tol", type=float, default=None)
    ap.add_argument("--alpha", type=float, default=None)
    ap.add_argument("--ls", choices=["wolfe", "armijo"], default="wolfe")
    ap.add_argument("--sd", action="store_true", help="steepest descent (no CG)")
    ap.add_argument("--direction", choices=["sd", "cg", "lbfgs", "rtr"],
                    default=None,
                    help="search direction (default: cg, or sd with --sd; "
                         "lbfgs = Riemannian L-BFGS and rtr = trust-region "
                         "Newton with autodiff Hessian-vector products, "
                         "both beyond the reference)")
    ap.add_argument("--lbfgs-memory", type=int, default=8,
                    help="curvature-pair history length for --direction lbfgs")
    ap.add_argument("--tr-delta0", type=float, default=None,
                    help="rtr: initial trust radius (default: sphere "
                         "scale / 4)")
    ap.add_argument("--tr-max-cg", type=int, default=50,
                    help="rtr: cap on truncated-CG iterations per "
                         "subproblem")
    ap.add_argument("--shards", type=int, default=0,
                    help="kdyn: 1-D slab distributed-FFT over this many "
                         "devices (transform='distributed')")
    ap.add_argument("--mesh-shape", default=None, metavar="PX,PY",
                    help="kdyn: 2-D PENCIL decomposition over a PX x PY "
                         "process mesh (overrides --shards)")
    ap.add_argument("--remat", choices=["step", "nested", "offload", "none"],
                    default=None,
                    help="kdyn trajectory-memory policy: per-step HBM "
                         "remat | sqrt(N) nested | pinned-host offload "
                         "| store-all (default: step)")
    ap.add_argument("--test-grad", action="store_true", help="Taylor test, then exit")
    ap.add_argument("--test-grad-eps", type=float, default=1e-4,
                    help="largest Taylor-test epsilon (halved n_tests-1 "
                         "times; the reference's TestGrad epsilon knob — "
                         "raise it when toy configs put |J(x+eps d)-J(x)| "
                         "at roundoff)")
    ap.add_argument("--adjoint", choices=["discrete", "continuous"], default="discrete")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--resume", default=None,
                    help="warm-start from a DAL_PROGRESS checkpoint "
                         "(.npz, or a reference-format DAL_PROGRESS.h5)")
    ap.add_argument("--regrid", action="store_true",
                    help="with --resume: spectrally re-express the "
                         "saved state on THIS config's grid (coarse->"
                         "fine study continuation, utils/regrid)")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of the run here")
    ap.add_argument("--archive-every", type=int, default=0,
                    help="archive optimisation state every N iterations "
                         "(0 = off). Default mode is light: J/residual/"
                         "step histories + current iterate, zero extra "
                         "solves (the reference File_Manips analogue)")
    ap.add_argument("--archive-full", action="store_true",
                    help="archive full field/spectra diagnostics per "
                         "iteration; captured FROM the optimisation's own "
                         "solves when the problem has a fused-diagnostics "
                         "form (all methods incl. pallas — zero extra "
                         "solves), else re-runs diagnostics()")
    ap.add_argument("--diag-stride", type=int, default=None,
                    help="energy-series cadence of the fused archives "
                         "(sh23/shb23; any >= 1 — a short final chunk is "
                         "handled; the reference records scalar_data "
                         "every 20 iters)")
    ap.add_argument("--h5", action="store_true",
                    help="also export the reference ecosystem's h5 "
                         "artifacts (DAL_PROGRESS.h5 + scalar_data_s1.h5 "
                         "+ CheckPoints_s1.h5, dataset names per the "
                         "reference source) into --out-dir")
    ap.add_argument("--no-archive", action="store_true",
                    help="(deprecated alias for --archive-every 0)")
    ap.add_argument("--solve-steps", type=int, default=None,
                    help="forward-solve mode: advance the PDE state this "
                         "many steps (no optimisation) and save it; "
                         "restartable via --state-in/--state-out")
    ap.add_argument("--state-in", default=None,
                    help="resume the forward solve from this saved state")
    ap.add_argument("--state-out", default=None,
                    help="where to save the advanced PDE state "
                         "(default <out-dir>/pde_state.npz)")
    ap.add_argument("--device-loop", action="store_true",
                    help="run the whole optimisation inside one jit "
                         "(optim.jit_driver: SD/CG with strong-Wolfe or "
                         "Armijo per --ls; no host round-trips)")
    # problem-size overrides
    ap.add_argument("--npts", type=int, default=None)
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--nz", type=int, default=None)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--n-iters", type=int, default=None)
    ap.add_argument("--dim", type=int, default=100, help="PCA dimension")
    ap.add_argument("--cost", choices=["Final", "Integrated"], default="Final")
    ap.add_argument("--method", default=None,
                    choices=["matmul", "fft", "xla", "pallas"],
                    help="step-method override (sh23: matmul|fft|pallas; "
                         "shb23: matmul|pallas; kdyn: xla|pallas)")
    ap.add_argument("--s", type=int, choices=[0, 1], default=1, help="mixing objective")
    ap.add_argument("--precision", default=None,
                    choices=["bfloat16", "compensated", "compensated2",
                             "default", "high", "highest", "df64"],
                    help="f32 solve precision: mixing -> MixingConfig."
                         "solve_precision; kdyn -> matmul_precision "
                         "(default|high|compensated|highest) or the "
                         "df64 engine. 'df64' is the f64-emulated "
                         "accuracy mode (problems/mixing_df, kdyn_df): "
                         "~144x more accurate mixing gradients at ~11x "
                         "the solve time (BASELINE.md r4)")
    ap.add_argument("--df-n-bits", type=int, default=None,
                    help="df64 only: Ozaki slice coverage of the f64 "
                         "operators. 32 is ~1.73x faster than the "
                         "48-bit default at identical gradient "
                         "accuracy (BASELINE.md r4 n_bits sweep)")
    ap.add_argument("--df-adjoint", action="store_true",
                    help="df64 only (mixing + kdyn): hand-rolled "
                         "DOUBLE-FLOAT adjoint — DF cotangent pairs "
                         "through exact transposed Ozaki contractions, "
                         "breaking the f32-reverse-sweep gradient "
                         "floors (mixing 5.9e-4 -> 5.4e-8 measured "
                         "on-chip) down to the f32-output class; the "
                         "deepest-accuracy mode, ~2x the df64 fused "
                         "call")
    return ap


_METHODS = {"sh23": ("matmul", "fft", "pallas"),
            "shb23": ("matmul", "pallas"),
            "kdyn": ("xla", "pallas")}


def make_problem(args):
    import jax

    if args.method is not None:
        allowed = _METHODS.get(args.problem, ())
        if args.method not in allowed:
            raise SystemExit(
                f"--method {args.method} not supported for {args.problem}"
                + (f" (choose from {', '.join(allowed)})" if allowed
                   else " (no method variants)"))
    if getattr(args, "direction", None) == "rtr":
        # RTR's Hessian-vector products linearize the gradient in
        # forward mode; paths whose primitives carry no JVP rule
        # (Pallas kernels, df64 Ozaki ops — custom_vjp reverse rules
        # only) cannot provide that. Instead of a hard reject, AUTO-
        # SUBSTITUTE the pure-autodiff XLA objective — the SAME
        # discretisation (trajectory parity pinned by
        # tests/test_run_rtr_substitute.py), just the linearizable
        # compute path — so the measured-best optimiser runs from the
        # default TPU CLI configs (VERDICT r4 item 6).
        if args.method == "pallas":
            sub = "xla" if args.problem == "kdyn" else "matmul"
            print(f"[{args.problem}] --direction rtr: the Pallas "
                  "kernels define reverse (custom_vjp) rules only — "
                  f"substituting the equivalent method={sub!r} XLA "
                  "objective for the HVP-linearizable trust-region "
                  "path (same discretisation)", flush=True)
            args.method = sub
        if getattr(args, "precision", None) == "df64":
            print(f"[{args.problem}] --direction rtr: the df64 Ozaki "
                  "ops define reverse (custom_vjp) rules only — "
                  "substituting the standard-precision objective for "
                  "the trust-region path (same discretisation; RTR's "
                  "rho acceptance needs no df64 Wolfe bracketing)",
                  flush=True)
            args.precision = None
            args.df_adjoint = False   # rides the df64 engine being dropped
        # --device-loop composes with rtr: optim/jit_rtr.py compiles the
        # whole trust-region loop (radius updates, rho acceptance, early
        # exit) into one executable
    if getattr(args, "df_adjoint", False):
        # single post-parse validation (was duplicated per problem
        # branch AND silently ignored for sh23/shb23/pca — a user would
        # believe they measured the DF-adjoint gradient when they had
        # not)
        if args.problem not in ("mixing", "kdyn"):
            raise SystemExit(
                "--df-adjoint applies to the df64 engines (mixing, "
                f"kdyn) — {args.problem} has no df64 mode (its f32 "
                "gradients are already at the 1e-6 class)")
        if args.precision != "df64":
            raise SystemExit("--df-adjoint requires --precision df64 "
                             "(it is the df64 engine's reverse-sweep "
                             "mode)")
    if args.method is not None:
        if args.problem == "kdyn" and args.method == "pallas":
            # validated capability, NOT a production path: Mosaic compile
            # of the whole CNAB1 induction kernel is infeasible at
            # production n_steps (measured 958 s / OOM — PARITY dead-end
            # ledger). Kept for small-n kernel validation only.
            print("[kdyn] WARNING: method=pallas is experimental — "
                  "compile-infeasible at production n_steps (use the "
                  "default xla method; see PARITY.md dead-end ledger)",
                  flush=True)

    # shared in-process platform force (CLAUDE.md rule 5); x64 is
    # resolved below from the dtype decision, not blanket-enabled
    from spheremanopt_tpu.utils.platform import apply_platform

    on_tpu = apply_platform(args.platform, x64=None)
    # persistent compile cache: repeat CLI runs skip the ~20-40 s/program
    # remote TPU compiles (measured; harmless on CPU)
    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

    # archive-flag normalisation: --archive-full alone previously
    # archived NOTHING (the default --archive-every is 0), and
    # --no-archive was parsed but never read
    if args.no_archive:
        args.archive_every = 0
        args.archive_full = False
    elif args.archive_full and args.archive_every == 0:
        args.archive_every = 1

    enable_persistent_cache()
    # Production default on TPU: the VMEM-resident kernel paths measure
    # faster than the XLA scans end-to-end (SH23 1.7x, SHB23 2.4x in the
    # device loop; BASELINE.md r3) at the same f32 accuracy class. The
    # one-time Mosaic compile is absorbed by the persistent cache.
    # Opt out with --method matmul. (--archive-full fused capture works
    # on BOTH methods: the kernels carry diag variants that store the
    # energy series from the same VMEM pass, J bitwise-unchanged.)
    if on_tpu and args.method is None and args.dtype in (None, "float32") \
            and args.problem in ("sh23", "shb23") \
            and getattr(args, "direction", None) != "rtr":
        args.method = "pallas"
        if not args.quiet:
            print(f"[{args.problem}] method=pallas (TPU default; "
                  "--method matmul opts out)")
    # Pallas kernels are f32-only; on CPU the default would be f64 and
    # the problem constructor would reject it — pick f32 unless the user
    # explicitly asked otherwise.
    dtype = args.dtype or ("float32" if (on_tpu or args.method == "pallas")
                           else "float64")
    if dtype == "float64" and not on_tpu:
        jax.config.update("jax_enable_x64", True)

    if args.problem == "pca":
        from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix

        p = PCAProblem(random_spd_matrix(args.dim, seed=args.seed))
        x0 = None
        defaults = dict(alpha=1.0, max_iters=2000)
        return p, x0, defaults

    if args.problem == "sh23":
        from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg

        kw = dict(dtype=dtype, adjoint=args.adjoint)
        for name, val in [("npts", args.npts), ("dt", args.dt),
                          ("n_iters", args.n_iters), ("method", args.method),
                          ("diag_stride", args.diag_stride)]:
            if val is not None:
                kw[name] = val
        p = SwiftHohenberg(SH23Config(**kw))
        import numpy as np

        return p, None, dict(alpha=np.pi, max_iters=200)

    if args.problem == "shb23":
        from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
            SHB23Config,
            SwiftHohenbergBounded,
        )

        kw = dict(dtype=dtype, adjoint=args.adjoint)
        for name, val in [("npts", args.npts), ("dt", args.dt),
                          ("n_iters", args.n_iters), ("method", args.method),
                          ("diag_stride", args.diag_stride)]:
            if val is not None:
                kw[name] = val
        p = SwiftHohenbergBounded(SHB23Config(**kw))
        return p, None, dict(alpha=1.0, max_iters=50, err_tol=1e-5)

    if args.problem == "kdyn":
        from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo

        kw = dict(dtype=dtype, cost=args.cost, adjoint=args.adjoint)
        for name, val in [("npts", args.npts), ("dt", args.dt),
                          ("n_iters", args.n_iters), ("method", args.method)]:
            if val is not None:
                kw[name] = val
        if args.precision is not None:
            # same flag as mixing: 'df64' selects the f64-emulated
            # engine (problems/kdyn_df); the f32 pass-count names map
            # onto KDynConfig.matmul_precision
            if args.precision == "df64":
                kw["solve_precision"] = "df64"
                if args.df_n_bits is not None:
                    kw["df_n_bits"] = args.df_n_bits
            elif args.precision in ("default", "high", "compensated",
                                    "highest"):
                kw["matmul_precision"] = args.precision
            else:
                raise SystemExit(
                    f"--precision {args.precision!r} has no kdyn "
                    "mapping (use default|high|compensated|highest|"
                    "df64)")
        if args.df_adjoint:   # validated centrally in make_problem
            kw["df_adjoint"] = True
        if args.remat is not None:
            kw["remat"] = False if args.remat == "none" else args.remat
        if args.mesh_shape is not None:
            px, py = (int(v) for v in args.mesh_shape.split(","))
            kw["transform"] = "distributed"
            kw["mesh_shape"] = (px, py)
        elif args.shards:
            kw["transform"] = "distributed"
            kw["n_shards"] = args.shards
        p = KinematicDynamo(KDynConfig(**kw))
        return p, None, dict(alpha=100.0, max_iters=10)

    from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing

    kw = dict(dtype=dtype, s=args.s, adjoint=args.adjoint)
    if args.precision == "default":
        # 'default' is a kdyn matmul_precision name only; reject it here
        # like the kdyn branch rejects its unsupported names
        raise SystemExit("--precision default has no mixing mapping "
                         "(use bfloat16|compensated|compensated2|high|"
                         "highest|df64)")
    for name, val in [("nx", args.nx), ("nz", args.nz), ("dt", args.dt),
                      ("n_iters", args.n_iters),
                      ("solve_precision", args.precision),
                      ("df_n_bits", args.df_n_bits)]:
        if val is not None:
            kw[name] = val
    if args.df_adjoint:   # validated centrally in make_problem
        kw["df_adjoint"] = True
    p = OptimalMixing(MixingConfig(**kw))
    return p, None, dict(alpha=100.0, max_iters=200)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.problem == "doctor":
        # pure diagnostics: no backend init in THIS process (a wedged
        # tunnel must not hang the tool that reports wedged tunnels)
        from spheremanopt_tpu.utils.doctor import run_doctor

        rep = run_doctor()
        return 0 if rep["cpu_ok"] else 1
    os.makedirs(args.out_dir, exist_ok=True)

    t0 = time.time()
    problem, x0, defaults = make_problem(args)
    if args.resume:
        # accepts the native .npz OR a reference-format DAL_PROGRESS.h5
        # (warm-start directly from an existing reference study's output)
        from spheremanopt_tpu.io.checkpoint import load_progress_any

        loaded = load_progress_any(args.resume)
        # reference DAL_PROGRESS.h5 states are FLAT Dedalus vectors
        # (Field_to_Vec); reshape to this problem's layout, loudly
        from spheremanopt_tpu.utils.regrid import reshape_flat_state

        try:
            x0 = reshape_flat_state(problem, loaded.x_opt)
        except ValueError as e:
            raise SystemExit(f"--resume {args.resume}: {e}")
        print(f"[resume] warm-starting from iteration {loaded.iterations}")
        if args.regrid:
            # coarse->fine continuation: re-express the saved state on
            # THIS config's grid (utils/regrid; the reference restart
            # requires matching resolution, FWD_Solve_SH23.py:787-800)
            from spheremanopt_tpu.utils.regrid import regrid_state

            shapes_in = [tuple(getattr(x, "shape", ())) for x in x0]
            x0 = regrid_state(problem, x0)
            print(f"[resume] regridded {shapes_in} -> "
                  f"{[tuple(x.shape) for x in x0]}")
    elif args.regrid:
        raise SystemExit("--regrid requires --resume <state file>")
    elif x0 is None:
        if args.problem == "pca":
            import numpy as np

            x0 = [np.random.RandomState(args.seed).rand(args.dim)]
        else:
            x0 = problem.generate_ic(seed=args.seed)
    radii = getattr(problem, "radii", [1.0])
    print(f"[{args.problem}] setup {time.time()-t0:.1f}s; spheres={list(radii)}")

    if args.solve_steps is not None:
        # pure forward-solve mode with PDE-state restart: the reference's
        # `IVP_FWD.load_state(filename)` continuation (FWD_Solve_SH23.py:459-460)
        import numpy as np

        import jax.numpy as jnp

        from spheremanopt_tpu.io.checkpoint import load_pde_state, save_pde_state

        if args.state_in:
            state_np, step0, _ = load_pde_state(args.state_in)
            state = {k: jnp.asarray(v) for k, v in state_np.items()}
        else:
            state, step0 = problem.initial_state(x0), 0
        state = problem.advance_state(state, args.solve_steps)
        step1 = step0 + args.solve_steps
        out_path = args.state_out or os.path.join(args.out_dir, "pde_state.npz")
        save_pde_state(out_path, {k: np.asarray(v) for k, v in state.items()},
                       step1, meta={"problem": args.problem})
        fields = problem.state_fields(state)
        norms = {k: float(np.linalg.norm(np.asarray(v))) for k, v in fields.items()}
        print(json.dumps({"mode": "forward-solve", "problem": args.problem,
                          "from_step": step0, "to_step": step1,
                          "state_path": out_path, "field_norms": norms}))
        return 0

    if args.test_grad:
        from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test

        if args.problem == "pca":
            import numpy as np

            dx0 = [np.random.RandomState(args.seed + 1).rand(args.dim)]
        else:
            dx0 = problem.generate_ic(seed=args.seed + 1)
        # df64 engines: the f32 scalar `objective` rounds to ~ulp(J),
        # which swamps Taylor increments — test against the
        # pair-resolution objective (same routing as the optimise path)
        obj_fn = (problem.objective_f64
                  if getattr(problem, "_dfe", None) is not None
                  else problem.objective)
        r = adjoint_gradient_test(
            x0, dx0, obj_fn, problem.gradient, problem.inner_product,
            epsilon=args.test_grad_eps,
            save_path=os.path.join(args.out_dir, "eps_TestR_TestR2_h_h2.npy"),
        )
        if args.adjoint == "continuous":
            # a continuous adjoint plateaus at discretisation error, so
            # the order-2 fit is not the criterion — but the gamma1 check
            # alone never consults the gradient at all. Require the
            # SECOND remainder to beat the first by a solid margin at the
            # largest eps: |J(X+eps dX) - J(X) - eps<dX,g>| << |J(X+eps
            # dX) - J(X)| holds only when g is (approximately) right.
            ok = (abs(r.gamma1 - 1.0) < 0.1
                  and r.remainder2[0] < 0.1 * r.remainder1[0])
        else:
            ok = abs(r.gamma1 - 1.0) < 0.1 and abs(r.gamma2 - 2.0) < 0.1
            if not ok and abs(r.gamma2 - 2.0) < 0.05:
                # order-2 remainder convergence IS the gradient check
                # (the repo's order-2.000 standard); gamma1 only tests
                # that eps*<dX,dJ> dominates the first difference. A
                # near-flat direction (tiny slope, toy configs) makes
                # |J(X+eps dX)-J(X)| curvature-dominated and gamma1
                # drifts toward 2 with the gradient still exact — the
                # test PASSES on the gamma2 criterion; the note points
                # at the eps dial for a clean gamma1 too.
                ok = True
                print("note: remainder order is exactly 2 (gradient "
                      "verified); gamma1 is off because the first "
                      "difference is curvature-dominated at these eps "
                      "— raise --test-grad-eps to rescale")
        print(f"gradient test {'PASSED' if ok else 'FAILED'}")
        return 0 if ok else 1

    from spheremanopt_tpu.io.timeseries import (
        FusedArchiver,
        IterationArchiver,
        LightArchiver,
    )
    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
    from spheremanopt_tpu.optim.plotting import plot_optimisation

    if args.device_loop:
        if args.direction == "lbfgs" and args.ls != "wolfe":
            raise SystemExit("--direction lbfgs needs --ls wolfe in the "
                             "device loop")
        import numpy as np

        from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere

        f_and_g = getattr(problem, "objective_and_gradient", None)
        if f_and_g is None:
            def f_and_g(xs):
                return problem.objective(xs), problem.gradient(xs)

        # problems with large operator stacks provide an (f(ops, xs), ops)
        # pair so the stacks enter the driver jit as operands, not as
        # program constants (the compile tunnel caps program-body size)
        aux = None
        pair = getattr(problem, "objective_and_gradient_aux", None)
        if pair is not None and pair[1] is not None:
            f_and_g, aux = pair

        if args.direction == "rtr":
            from spheremanopt_tpu.optim.jit_rtr import jit_optimise_rtr

            if aux is None:
                f_rtr, g_rtr = problem.objective, problem.gradient
            else:
                # derive the split callables from the aux-operand fused
                # pair; XLA dead-code-eliminates the unused output
                fg_aux = f_and_g
                f_rtr = lambda a, xs: fg_aux(a, xs)[0]   # noqa: E731
                g_rtr = lambda a, xs: fg_aux(a, xs)[1]   # noqa: E731
            opt = jit_optimise_rtr(
                f_rtr, g_rtr, problem.inner_product, radii,
                max_iters=args.max_iters if args.max_iters is not None
                else defaults["max_iters"],
                err_tol=args.err_tol if args.err_tol is not None
                else defaults.get("err_tol", 1e-6),
                delta0=args.tr_delta0,
                max_cg=args.tr_max_cg,
            )
        else:
            opt = jit_optimise_on_multi_sphere(
                f_and_g, problem.inner_product, radii,
                max_iters=args.max_iters if args.max_iters is not None else defaults["max_iters"],
                alpha0=float(args.alpha if args.alpha is not None else defaults["alpha"]),
                err_tol=args.err_tol if args.err_tol is not None else defaults.get("err_tol", 1e-6),
                cg=not args.sd,
                line_search=args.ls,
                direction=args.direction,
                lbfgs_memory=args.lbfgs_memory,
            )
        t0 = time.time()
        r = opt(x0, aux=aux)
        k = int(r.iterations)
        wall = time.time() - t0
        summary = {
            "problem": args.problem,
            "driver": "device-resident (single jit)",
            "iterations": k,
            # k == 0 (first line search failed / already converged):
            # history slot 0 holds zero-INITIALISED values, not results
            "J_final": float(r.function_values[k - 1]) if k > 0 else None,
            "residuals_final": (np.asarray(r.residuals[k - 1]).tolist()
                                if k > 0 else None),
            "wall_time_total_s": round(wall, 3),
        }
        if hasattr(r, "converged"):   # JitRTRResult extras
            summary["converged"] = bool(r.converged)
            summary["trust_region_trials"] = int(r.trials)
            summary["hvp_evals"] = int(r.hvp_evals)
        with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary))
        plot_optimisation(
            [list(np.asarray(r.residuals[:k, i])) for i in range(len(radii))],
            list(np.asarray(r.function_values[:k])),
            save_path=os.path.join(args.out_dir, "convergence.pdf"),
        )
        if args.h5:
            # the h5 shim consumes the host OptimiseResult shape; adapt
            # the device-loop record (histories are padded past k). The
            # device loop doesn't count line-search trials, so
            # Function/Gradient_Evals record the accepted-iterate count
            # (a lower bound) — use the host driver when exact trial
            # counts matter.
            import types

            from spheremanopt_tpu.io.h5compat import export_run_h5

            xs = [np.asarray(x) for x in r.x_opt]
            adapted = types.SimpleNamespace(
                iterations=k, x_opt=xs, n_components=len(xs),
                function_evals=k, gradient_evals=k,
                residuals=[np.asarray(r.residuals[:k, i])
                           for i in range(len(radii))],
                step_sizes=np.asarray(r.step_sizes[:k]),
                function_values=np.asarray(r.function_values[:k]),
            )
            diag_h5 = (problem.diagnostics(r.x_opt)
                       if hasattr(problem, "diagnostics") else {})
            paths = export_run_h5(args.out_dir, args.problem, adapted,
                                  diag_h5)
            from spheremanopt_tpu.io.dedalus_export import export_dedalus_h5

            paths.update(export_dedalus_h5(args.out_dir, args.problem,
                                           problem, adapted, diag_h5))
            if not args.quiet:
                print("h5 exports:", json.dumps(paths))
        return 0

    callback = None
    obj_fn = problem.objective
    fg_fn = getattr(problem, "objective_and_gradient", None)
    if getattr(problem, "_dfe", None) is not None:
        # df64 mixing: the host line search consumes J at pair
        # resolution (the f32 scalar rounds to ~ulp(J) ~ 4e-9, which
        # can swamp fine Wolfe comparisons the accuracy mode exists for)
        obj_fn = problem.objective_f64
    if args.archive_every > 0:
        if args.archive_full and (
                getattr(problem, "_dfe", None) is not None
                or args.direction == "rtr"):
            # paths the fused archiver cannot ride: it substitutes
            # obj_fn/fg_fn with the COMPENSATED-machinery aux forms,
            # which would silently downgrade a df64 gradient path, and
            # the RTR driver never calls obj_fn/fg_fn at all (its
            # solves live inside the fused step kernel) — re-run
            # diagnostics per archive instead. Checked BEFORE the
            # fused-archiver branch unconditionally: a df64 problem
            # without `diagnostics` must fail loudly here, not fall
            # through to FusedArchiver's silent downgrade.
            if not hasattr(problem, "diagnostics"):
                raise SystemExit(
                    "--archive-full needs problem.diagnostics on the "
                    "df64/rtr paths (the fused archiver would silently "
                    "downgrade them)")
            archiver = IterationArchiver("diag", problem.diagnostics,
                                         args.out_dir)
        elif args.archive_full and getattr(problem, "has_fused_diagnostics",
                                           False):
            # full diagnostics captured from the optimisation's own
            # solves — zero extra forward runs (vs IterationArchiver,
            # which re-runs diagnostics() per archive)
            archiver = FusedArchiver("diag", problem, args.out_dir)
            obj_fn, fg_fn = archiver.f, archiver.f_and_g
        elif args.archive_full and hasattr(problem, "diagnostics"):
            archiver = IterationArchiver("diag", problem.diagnostics,
                                         args.out_dir)
        else:
            archiver = LightArchiver("progress", args.out_dir)

        def callback(k, result, _every=args.archive_every):
            if k % _every == 0:
                archiver(k, result)

    # CLI value wins when the user passed one; else the problem default
    err_tol = args.err_tol if args.err_tol is not None else defaults.get("err_tol", 1e-6)
    if args.direction == "rtr":
        from spheremanopt_tpu.optim.rtr import optimise_rtr

        # trust-region Newton: no line search (--ls/--alpha unused);
        # the problem's pure-autodiff triple feeds the HVP linearization
        res = optimise_rtr(
            x0,
            radii,
            problem.objective,
            problem.gradient,
            problem.inner_product,
            err_tol=err_tol,
            max_iters=args.max_iters if args.max_iters is not None
            else defaults["max_iters"],
            delta0=args.tr_delta0,
            max_cg=args.tr_max_cg,
            verbose=not args.quiet,
            callback=callback,
            checkpoint_path=os.path.join(args.out_dir, "DAL_PROGRESS.npz"),
            log_path=os.path.join(args.out_dir, "optimize_result.txt"),
        )
    else:
        res = optimise_on_multi_sphere(
            x0,
            radii,
            obj_fn,
            problem.gradient,
            problem.inner_product,
            err_tol=err_tol,
            max_iters=args.max_iters if args.max_iters is not None
            else defaults["max_iters"],
            alpha_k=args.alpha if args.alpha is not None
            else defaults["alpha"],
            line_search=args.ls,
            cg=not args.sd,
            method=args.direction,
            lbfgs_memory=args.lbfgs_memory,
            verbose=not args.quiet,
            callback=callback,
            checkpoint_path=os.path.join(args.out_dir, "DAL_PROGRESS.npz"),
            log_path=os.path.join(args.out_dir, "optimize_result.txt"),
            f_and_g=fg_fn,
        )

    if callback is not None and hasattr(archiver, "flush"):
        archiver.flush()   # drain async archive writes before reading

    plot_optimisation(res, save_path=os.path.join(args.out_dir, "convergence.pdf"))
    from spheremanopt_tpu.io.figures import PROBLEM_FIGURES, plot_energy_series

    if args.problem in PROBLEM_FIGURES:
        # the reference's per-problem figure assembly (plot_figure_*.py)
        PROBLEM_FIGURES[args.problem](problem, res.x_opt, args.out_dir)
    elif hasattr(problem, "diagnostics"):
        diag = problem.diagnostics(res.x_opt)
        plot_energy_series(diag, os.path.join(args.out_dir, "energy_series.pdf"))

    if args.h5:
        # h5 migration shim: the reference ecosystem's DAL_PROGRESS.h5 /
        # scalar_data / CheckPoints files, name-for-name (io/h5compat)
        from spheremanopt_tpu.io.h5compat import export_run_h5

        diag_h5 = (problem.diagnostics(res.x_opt)
                   if hasattr(problem, "diagnostics") else {})
        paths = export_run_h5(args.out_dir, args.problem, res, diag_h5)
        from spheremanopt_tpu.io.dedalus_export import export_dedalus_h5

        paths.update(export_dedalus_h5(args.out_dir, args.problem,
                                       problem, res, diag_h5))
        if not args.quiet:
            print("h5 exports:", json.dumps(paths))

    cfg_dict = None
    if hasattr(problem, "cfg"):
        import dataclasses

        cfg_dict = dataclasses.asdict(problem.cfg)
    summary = {
        "problem": args.problem,
        "config": cfg_dict,
        "iterations": res.iterations,
        "converged": res.converged,
        "message": res.message,
        "J_final": res.function_values[-1] if res.function_values else None,
        "residuals_final": [r[-1] for r in res.residuals if r],
        "wall_time_total_s": round(sum(res.wall_times), 3),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
