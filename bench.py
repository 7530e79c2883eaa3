"""Benchmark: SH23 (N=256, T=50, dt=0.05) forward+gradient wall-clock.

The unit of work is one (objective, gradient) evaluation pair — the
dominant cost of one optimisation iteration (SURVEY.md section 3.1: each
iteration is 1-3 FWD + 1-2 ADJ full PDE solves). TPU f32 (the axon TPU
rejects f64) vs the CPU baseline `baselines/sh23_numpy.py` — the same
discrete algorithm on numpy/pocketfft, i.e. reference-CPU-Dedalus minus
its Python overhead, making the baseline strictly stronger than the
reference as shipped (which publishes no numbers; BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu_ms>, "unit": "ms", "vs_baseline": <speedup>}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NPTS = 256
N_ITERS = 1000  # T=50, dt=0.05 (ref FWD_Solve_SH23.py __main__)
DT = 0.05
E0 = 0.0725


def _enable_compile_cache():
    """Persistent on-disk XLA compilation cache: repeat bench runs (and
    the retry child) skip the ~20-40 s/program remote compiles."""
    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()




def chained_value_ms(f_and_g, x_list, n, warm=2):
    """Honest device timing on this platform: block_until_ready can
    return before compute finishes (measured), so each trial is chained
    by a value dependency and the loop ends with a host value pull."""
    import jax

    def run_chain(x, n):
        t0 = time.perf_counter()
        for _i in range(n):
            J, g = f_and_g(x)
            x = [xi + 0.0 * gi for xi, gi in zip(x, g)]
        _ = float(x[0].sum())  # value pull: cannot resolve early
        return (time.perf_counter() - t0) / n * 1e3

    x = list(x_list)
    for _ in range(warm):
        J, g = f_and_g(x)
        _ = float(J)
    run_chain(x, max(2, n // 2))      # full warm pass (compiles the chain
                                      # add-op and drains slow first calls)
    return min(run_chain(x, n) for _ in range(2))


def _tpu_healthy(timeout_s: int = 90) -> bool:
    """Probe the axon tunnel with a trivial dispatch in a short-timeout
    subprocess. After heavy process churn the remote terminal WEDGES:
    trivial dispatches hang for ~20-45 min, then self-recover (measured;
    CLAUDE.md platform rule 6). A hung probe means nothing TPU-side can
    proceed, so callers should wait, not burn their budget compiling
    into a dead tunnel."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             # persistent cache: repeat probes in a _wait_for_tpu polling
             # loop must not repay the ~20-40 s remote compile each time
             # (best-effort: a probe must never fail on the import itself)
             "try:\n"
             "    from spheremanopt_tpu.utils.jaxcache import "
             "enable_persistent_cache\n"
             "    enable_persistent_cache()\n"
             "except Exception:\n"
             "    pass\n"
             "import jax, jax.numpy as jnp\n"
             "print(float(jax.jit(lambda x: (x*x).sum())"
             "(jnp.ones((128,128)))))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return out.returncode == 0 and "16384" in out.stdout
    except Exception:
        return False


def _wait_for_tpu(t_start: float, budget_s: float, reserve_s: float = 420.0,
                  max_wait_s: float = None, state: dict = None):
    """Block until the tunnel answers a trivial dispatch, the budget
    (minus `reserve_s` for the remaining work) runs out, or `max_wait_s`
    of in-call waiting elapses. Returns True if healthy.

    `max_wait_s` is the per-row wedge cap (VERDICT r4 weak item 3: one
    wedge must not starve every later row). `state` carries a shared
    {"wedged": bool} across calls: once a probe has failed, subsequent
    probes use a short timeout (a healthy warm tunnel answers in
    seconds; only a wedged one eats the full window), so later rows
    skip fast instead of each paying a 90 s hung probe."""
    t_wait0 = time.perf_counter()
    probe_timeout = 30 if (state or {}).get("wedged") else 90
    while True:
        if _tpu_healthy(timeout_s=probe_timeout):
            if state is not None:
                state["wedged"] = False
            return True
        if state is not None:
            state["wedged"] = True
        probe_timeout = 30
        # give up BEFORE sleeping when another sleep+probe cycle cannot
        # fit inside max_wait_s — otherwise the intended one-cheap-probe
        # fast skip (row_wait=45 while known-wedged) actually costs
        # probe(30) + sleep(45) + probe(30) ~ 105 s per row
        if max_wait_s is not None and \
                time.perf_counter() - t_wait0 + 45.0 >= max_wait_s:
            return False
        if budget_s - (time.perf_counter() - t_start) < reserve_s:
            return False
        time.sleep(45)


# Pinned CPU denominators (same policy as MIXING_CPU_FULL_MS /
# KDYN24_CPU_FULL_MS): these are full runs, not extrapolations, but the
# live min-of-N still breathed ~2x with machine load across otherwise
# identical bench runs (SH23 recorded 93.6 / 113.1 / 179.9 ms). Pinned
# to the MINIMUM of clean measurements — biased AGAINST the reported
# speedup — with the live run kept as a 10x probe guard + accuracy
# reference. SH23: 93.6 ms (r3 rehearsal artifact, min-of-3);
# SHB23: 807.8 ms (idle min-of-6, 2026-08-17).
SH23_CPU_FULL_MS = 93.6
SHB23_CPU_FULL_MS = 807.8


# COMMITTED at the repo root (VERDICT r4 next-round item 1a: the old
# runs/bench_last_good.json lived in a gitignored directory, so the
# driver's fresh checkout had nothing to degrade to). Refreshed per-ROW
# whenever a row measures cleanly — the store converges even when every
# individual run is partially wedged.
LAST_GOOD_PATH = "/root/repo/BENCH_LAST_GOOD.json"


def _lg_stamp() -> dict:
    import datetime
    import subprocess
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd="/root/repo").stdout.strip()
    except Exception:
        rev = "?"
    return {"measured_at": datetime.datetime.now().isoformat(
                timespec="seconds"),
            "git_rev": rev}


def _lg_load_store() -> dict:
    try:
        with open(LAST_GOOD_PATH) as fh:
            return json.load(fh)
    except Exception:
        return {}


def _lg_write_store(store: dict) -> None:
    try:
        with open(LAST_GOOD_PATH, "w") as fh:
            json.dump(store, fh, indent=1, sort_keys=True)
    except Exception:
        pass  # persistence is best-effort; never fail a run over it


def _lg_update_rows(updates: dict) -> None:
    """Merge freshly-measured per-row value dicts into the committed
    store ({name: {prefixed-key: value}})."""
    if not updates:
        return
    store = _lg_load_store()
    store.setdefault(
        "note", "per-row last-known-good bench values; a wedged row in "
                "a later run degrades to these (clearly labelled) "
                "instead of to nulls. Refreshed by bench.py whenever a "
                "row measures cleanly.")
    rows = store.setdefault("rows", {})
    stamp = _lg_stamp()
    for name, vals in updates.items():
        rows[name] = {**stamp, "values": vals}
    _lg_write_store(store)


def _lg_row(name: str) -> dict:
    """`{name}_last_good` detail fragment for a degraded row — the most
    recent clean measurement of THAT row with provenance; empty if the
    store has none."""
    r = _lg_load_store().get("rows", {}).get(name)
    if not r:
        return {}
    return {name + "_last_good": {
        "note": "stale-but-real: most recent clean measurement of this "
                "row (current run degraded by a tunnel wedge/budget)",
        **r}}


def _save_last_good(rec: dict) -> None:
    """Persist a fully-clean bench record (no _error/_skipped rows) so a
    later run that lands in a tunnel-wedge window can degrade to
    stale-but-real numbers with provenance instead of nulls."""
    store = _lg_load_store()
    store.update(_lg_stamp(), record=rec)
    _lg_write_store(store)


def _load_last_good() -> dict:
    """detail-fragment carrying the most recent complete run (plus the
    per-row store), labelled as such — empty if none exists."""
    lg = _lg_load_store()
    if not lg:
        return {}
    out = {}
    if lg.get("record"):
        out["last_known_good"] = {
            "note": "most recent COMPLETE bench run on this machine; "
                    "current run degraded by a tunnel wedge",
            "measured_at": lg.get("measured_at"),
            "git_rev": lg.get("git_rev"),
            "value_ms": lg.get("record", {}).get("value"),
            "vs_baseline": lg.get("record", {}).get("vs_baseline"),
            "detail": lg.get("record", {}).get("detail"),
        }
    if lg.get("rows"):
        out["last_known_good_rows"] = lg["rows"]
    return out


def _guard_probe(probe_ms: float, pinned_ms: float, name: str) -> float:
    if not (pinned_ms / 10 < probe_ms < pinned_ms * 10):
        raise RuntimeError(
            f"{name} CPU probe {probe_ms:.1f} ms is >10x off the pinned "
            f"measurement {pinned_ms:.1f} ms — baseline code changed; "
            "re-measure in full")
    return pinned_ms


def bench_baseline_cpu(u0, repeats=3) -> float:
    sys.path.insert(0, "baselines")
    from sh23_numpy import SH23Numpy

    sim = SH23Numpy(npts=NPTS, dt=DT, n_iters=N_ITERS)
    J = sim.forward(u0)  # warm caches (and the reported J value)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        # gradient() runs the forward (store=True) internally, so this
        # times exactly 1 forward + 1 reverse sweep — the same unit as
        # the TPU side's fused value_and_grad (no double-counted fwd)
        g = sim.gradient(u0)
        times.append(time.perf_counter() - t0)
    cpu_s = _guard_probe(min(times) * 1e3, SH23_CPU_FULL_MS, "sh23") / 1e3
    return cpu_s, float(J), np.asarray(g)


def bench_tpu(u0, repeats=10):
    import jax
    import jax.numpy as jnp

    from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg

    import os

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # f64 configs need x64
    dtype = "float32" if on_tpu else "float64"
    # SMO_BENCH_PALLAS=1 benches the VMEM-resident kernel path (adds a
    # one-time ~4 min Mosaic compile); default is the XLA scan path
    method = "pallas" if (on_tpu and os.environ.get("SMO_BENCH_PALLAS") == "1") else "matmul"
    p = SwiftHohenberg(SH23Config(npts=NPTS, n_iters=N_ITERS, dt=DT, e0=E0,
                                  dtype="float32" if method == "pallas" else dtype,
                                  method=method))
    x = [jnp.asarray(u0, p._rdtype)]

    # fused forward+adjoint = the reference's FWD-then-ADJ unit of work
    ms = chained_value_ms(p.objective_and_gradient, x, n=max(repeats, 10))
    J, g = p.objective_and_gradient(x)
    return ms / 1e3, float(J), np.asarray(g[0])


def bench_sh23_pallas(u0, repeats=10):
    """SH23 VMEM-resident kernel path (`method="pallas"`,
    ops/pallas/fused_two_matrix.py): both propagator matrices pinned in
    VMEM across the whole forward AND reverse sweep — the XLA scan
    restreams them from HBM every step, which is its measured binding
    constraint (BASELINE.md). The one-time ~4 min Mosaic compile is
    eliminated across processes by the persistent compile cache, which
    makes this path viable as the production bench default."""
    import jax.numpy as jnp

    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config,
        SwiftHohenberg,
    )

    p = SwiftHohenberg(SH23Config(npts=NPTS, n_iters=N_ITERS, dt=DT, e0=E0,
                                  dtype="float32", method="pallas"))
    x = [jnp.asarray(u0, jnp.float32)]
    ms = chained_value_ms(p.objective_and_gradient, x, n=repeats)
    J, g = p.objective_and_gradient(x)
    return ms, float(J), np.asarray(g[0])


def bench_shb23_pallas(repeats=10):
    """SHB23 VMEM-resident kernel path (same two-matrix kernel)."""
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config,
        SwiftHohenbergBounded,
    )

    p = SwiftHohenbergBounded(SHB23Config(dtype="float32", method="pallas"))
    x0 = p.generate_ic(seed=42)
    ms = chained_value_ms(p.objective_and_gradient, x0, n=repeats)
    J, _ = p.objective_and_gradient(x0)
    return ms, float(J)


# KDyn 24^3 CPU fused fwd+grad (hand-rolled adjoint), MEASURED IN FULL
# (2000 steps, twice on an idle machine: 35.6 / 40.4 s, min taken —
# 2026-08-17). See the pinned-denominator rationale at
# MIXING_CPU_FULL_MS.
KDYN24_CPU_FULL_MS = 35_600.0


def bench_kdyn(repeats_tpu=5, repeats_cpu=1):
    """KDyn 24^3, Rm=1, dt=5e-4, 2000 steps, Cost='Final' — the second
    north-star config (BASELINE.md). Unit: fused fwd+grad (both spheres).

    Two precision modes are timed (matmul_precision): "high" is the
    framework default (native 3-pass MXU transforms, J rel-err ~9e-5 —
    measured to dominate both "highest" and the hand-rolled compensated
    split, BASELINE.md r3); "default" is the single-pass bf16 fast mode
    (rel-err ~4.5e-3).
    """
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "baselines")
    from kdyn_numpy import KDynNumpy

    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig,
        KinematicDynamo,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # f64 configs need x64
    dtype = "float32" if on_tpu else "float64"
    # project_gradients=False: the numpy baseline computes the exact
    # (unprojected) gradient, so compare like with like
    p = KinematicDynamo(
        KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype=dtype,
                   project_gradients=False)
    )
    truth = np.load("baselines/kdyn24_truth.npz")
    # The integration runs from the PINNED IC (the accuracy reference's
    # exact input): generating on-device would fold ~4e-5 of IC noise
    # into every accuracy row (the jitted IC pipeline's MXU arithmetic
    # differs from CPU f32 — measured r3). generate_ic still runs as a
    # pipeline sanity check: it must land in the pinned IC's
    # neighbourhood or the IC algorithm/seed changed.
    b_np = np.asarray(truth["b0"], np.float64)
    u_np = np.asarray(truth["u0"], np.float64)
    # CPU baseline FIRST: numpy-only, so it spends no healthy-tunnel
    # minutes (the wedge makes TPU-active windows the scarce resource).
    # PINNED full measurement (mirrors the mixing denominator): the live
    # 100-step x20 extrapolation both understated the full run (35.6 s
    # measured in full vs 27.8 s extrapolated — the 2000-step store-all
    # trajectory has worse cache behaviour than x20 of 100 steps) and
    # inflated 2.5x when the machine was busy (r3 rehearsal recorded
    # 68.7 s with concurrent CPU work). The live probe only guards
    # against the baseline code itself changing.
    sub = KDynNumpy(npts=24, dt=5e-4, n_iters=100)
    sub.gradient(b_np, u_np)  # BLAS warm-up + first-touch pages
    times = []
    for _ in range(max(2, repeats_cpu)):
        t0 = time.perf_counter()
        sub.gradient(b_np, u_np)
        times.append(time.perf_counter() - t0)
    probe_s = min(times) * (2000 / 100)
    cpu_s = _guard_probe(probe_s * 1e3, KDYN24_CPU_FULL_MS, "kdyn") / 1e3

    p_ic = p if dtype == "float32" else KinematicDynamo(
        KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype="float32",
                   project_gradients=False))  # f32 stream (the truth's)
    x0_gen = p_ic.generate_ic(seed=42)
    if not (np.allclose(np.asarray(x0_gen[0], np.float64), truth["b0"],
                        rtol=0, atol=5e-4)
            and np.allclose(np.asarray(x0_gen[1], np.float64), truth["u0"],
                            rtol=0, atol=5e-4)):
        raise RuntimeError(
            "generate_ic(seed=42) diverged from the pinned truth IC; "
            "regenerate with baselines/make_kdyn24_truth.py")
    x0 = [jnp.asarray(truth["b0"], p._rdtype),
          jnp.asarray(truth["u0"], p._rdtype)]

    # Accuracy reference: pinned f64 truth (jax-CPU-f64 fused fwd+grad at
    # the seed-42 f32 IC, cross-validated vs the hand-rolled numpy
    # adjoint to 1e-14 — baselines/make_kdyn24_truth.py). Recomputing it
    # live cost ~54 s of numpy per bench run.
    J_cpu = float(truth["J"])
    g_b = np.asarray(truth["gb"], np.float64)


    def one(pp, repeats=None):
        n = repeats if repeats is not None else repeats_tpu
        tpu_s = chained_value_ms(pp.objective_and_gradient, x0, n=n) / 1e3
        J, g = pp.objective_and_gradient(x0)
        rel_J = abs(float(J) - J_cpu) / abs(J_cpu)
        rel_g = float(
            np.linalg.norm(np.asarray(g[0], np.float64) - g_b) / np.linalg.norm(g_b)
        )
        return tpu_s, rel_J, rel_g

    tpu_s, rel_J, rel_g = one(p)  # the KDynConfig default mode
    from spheremanopt_tpu.utils import profiling as prof

    # effective mode: the f64 CPU fallback executes plain dots
    kd_mode = p.cfg.matmul_precision if dtype == "float32" else "f64"
    rl = prof.roofline(tpu_s * 1e3, *prof.kdyn_cost_model(
        24, 2000, passes=prof.passes_for(kd_mode)))
    fast = {}
    if on_tpu:
        p_fast = KinematicDynamo(
            KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype=dtype,
                       project_gradients=False, matmul_precision="default")
        )
        t_f, rj_f, rg_f = one(p_fast)
        fast = {"fast_s": t_f, "fast_rel_J": rj_f, "fast_rel_g": rg_f}
        # df64 accuracy row: the f64-emulated forward (problems/kdyn_df,
        # the mixing escape hatch generalised) vs the same pinned f64
        # truth — expected to break the f32 "high" ~1e-4 class on J and
        # to land the gradient at the f32-reverse-sweep floor
        del p_fast
        p_df = KinematicDynamo(
            KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype=dtype,
                       project_gradients=False, solve_precision="df64")
        )
        t_d, rj_d, rg_d = one(p_df, repeats=2)
        fast["df64_s"] = t_d
        fast["df64_rel_J"] = rj_d
        fast["df64_rel_g"] = rg_d
        # df64 + hand-rolled DF adjoint (KDyn generalisation of the
        # mixing DF-cotangent sweep, r5): grad rel-err vs the pinned
        # f64 truth must break the ~1e-5 f32-reverse floor
        del p_df
        p_adj = KinematicDynamo(
            KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype=dtype,
                       project_gradients=False, solve_precision="df64",
                       df_adjoint=True))
        t_a, rj_a, rg_a = one(p_adj, repeats=2)
        fast["df64adj_s"] = t_a
        fast["df64adj_rel_J"] = rj_a
        fast["df64adj_rel_g"] = rg_a
    # NOTE: KDyn method="pallas" is deliberately NOT benched: Mosaic
    # compile of the 22-einsum unaligned step body measures ~16 min per
    # program through the compile helper (OOM-SIGKILL at 2000 steps) —
    # see BASELINE.md round-2 notes. The XLA scan is the production path.
    return tpu_s, cpu_s, rel_J, rel_g, fast, kd_mode, rl


def bench_shb23(repeats=10):
    """SHB23 Discrete config (N=512, dt=0.01, T=20): TPU fwd+grad ms."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "baselines")

    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config,
        SwiftHohenbergBounded,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # f64 configs need x64
    dtype = "float32" if on_tpu else "float64"
    p = SwiftHohenbergBounded(SHB23Config(dtype=dtype))
    x0 = p.generate_ic(seed=42)
    ms = chained_value_ms(p.objective_and_gradient, x0, n=repeats)
    # CPU baseline: same propagator algorithm on numpy/BLAS
    from shb23_numpy import SHB23Numpy

    sim = SHB23Numpy()
    u0 = np.asarray(x0[0], np.float64)
    sim.gradient(u0)   # warm BLAS threads / page-fault the buffers
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sim.gradient(u0)
        times.append(time.perf_counter() - t0)
    cpu_ms = _guard_probe(min(times) * 1e3, SHB23_CPU_FULL_MS, "shb23")

    from spheremanopt_tpu.utils import profiling as prof

    # npts=512 IS the effective (dealias-enlarged) grid, so the two
    # propagators are (512 x 512)
    rl = prof.roofline(ms, *prof.shb23_cost_model(p.cfg.npts, p.cfg.n_iters))
    return ms / 1e3, cpu_ms, rl


# Mixing CPU fused fwd+grad, MEASURED IN FULL once (1000 steps, 726.7 s,
# BASELINE.md "mixing CPU baseline measured in full") — the live 50-step
# extrapolation below varies up to 3.6x run-to-run (BLAS warm-up and
# first-touch page faults amplified x20), which made the recorded
# vs_baseline unstable across otherwise-identical bench runs (r3 runs
# A/B: 6968 vs 1935). The pinned full measurement is the denominator;
# the live probe only guards against the baseline code itself changing.
MIXING_CPU_FULL_MS = 726_700.0


def _mixing_cpu_baseline_ms():
    """Authoritative pinned full-run CPU baseline, sanity-checked by a
    live 50-step probe (order-of-magnitude only; see MIXING_CPU_FULL_MS).
    CPU-only — callable before any TPU work."""
    sys.path.insert(0, "baselines")
    from mixing_numpy import MixingNumpy

    truth = np.load("baselines/mixing256_truth.npz")
    sub_steps = 50
    sim = MixingNumpy(n_iters=sub_steps)
    t0 = time.perf_counter()
    sim.gradient(np.asarray(truth["x0"], np.float64))
    probe_ms = (time.perf_counter() - t0) * 1e3 * (1000 / sub_steps)
    return _guard_probe(probe_ms, MIXING_CPU_FULL_MS, "mixing")


def bench_mixing(repeats=3, cpu_ms=None):
    """Mixing reference config (256x128, dt=5e-3, T=5, s=1): TPU fwd+grad ms.

    Times the default error-compensated f32 solve mode (J rel-err
    5.4e-5 vs f64 over 1000 steps) and the bf16 fast mode (5.6e-2).
    Accuracy is reported against the pinned f64-CPU J for the seed-42
    linear-prep IC (BASELINE.md; breaks visibly if generate_ic changes).
    """
    import jax
    import jax.numpy as jnp

    from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing

    # Pinned f64 truth at the seed-42 F32 IC (the stream this bench
    # integrates; the r2 pin 0.03860067... was the f64-IC value and
    # put 4.5e-5 of IC-mismatch noise into every accuracy row) —
    # baselines/make_mixing256_truth.py. IC equality asserted below.
    truth = np.load("baselines/mixing256_truth.npz")
    J64 = float(truth["J"])
    g64 = np.asarray(truth["g"], np.float64)

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # f64 configs need x64
    dtype = "float32" if on_tpu else "float64"
    p = OptimalMixing(MixingConfig(dtype=dtype, s=1))
    p_ic = p if dtype == "float32" else OptimalMixing(
        MixingConfig(dtype="float32", s=1))
    import jax.numpy as jnp

    # integrate from the PINNED IC (see bench_kdyn: on-device IC
    # generation carries MXU arithmetic noise vs the CPU truth's input);
    # generate_ic runs as a loose-tolerance pipeline sanity check
    # tolerance: the on-device IC prep (100 compensated bf16-pass
    # solves) lands 6.1e-3 max-abs from the CPU f32 IC (measured r3);
    # 3e-2 still catches any algorithm/seed change (those diverge O(1))
    x0_gen = np.asarray(p_ic.generate_ic(seed=42)[0], np.float64)
    if not np.allclose(x0_gen, truth["x0"], rtol=0, atol=3e-2):
        raise RuntimeError(
            "mixing generate_ic(seed=42) diverged from the pinned "
            "truth IC; regenerate with baselines/make_mixing256_truth.py")
    x0 = [jnp.asarray(truth["x0"], p._rdtype)]
    ms = chained_value_ms(p.objective_and_gradient, x0, n=repeats)
    # J/grad from the fused call: p.objective() would compile a SECOND
    # program (~60-90 s through the tunnel) for a value the fused one
    # already computed — the extra compiles pushed the subprocess past
    # its bench-budget slice (measured TimeoutExpired in the r2 rehearsal)
    J_fused, g_fused = p.objective_and_gradient(x0)
    rel_J = abs(float(J_fused) - J64) / abs(J64)
    rel_g = float(np.linalg.norm(np.asarray(g_fused[0], np.float64) - g64)
                  / np.linalg.norm(g64))
    fast = {}
    if on_tpu:
        p_fast = OptimalMixing(MixingConfig(dtype=dtype, s=1,
                                            solve_precision="bfloat16"))
        ms_f = chained_value_ms(p_fast.objective_and_gradient, x0, n=repeats)
        J_ff, _ = p_fast.objective_and_gradient(x0)
        fast = {"fast_ms": ms_f,
                "fast_rel_J": abs(float(J_ff) - J64) / abs(J64)}
        # df64 accuracy row (VERDICT r4 item 1 done-criterion: gradient
        # rel-err vs the pinned f64 truth, measured ON-CHIP): the
        # f64-emulated forward must break the measured ~8.5e-2 f32
        # gradient floor
        del p_fast
        p_df = OptimalMixing(MixingConfig(dtype=dtype, s=1,
                                          solve_precision="df64"))
        ms_d = chained_value_ms(p_df.objective_and_gradient, x0, n=repeats)
        J_d, g_d = p_df.objective_and_gradient(x0)
        fast["df64_ms"] = ms_d
        fast["df64_rel_J"] = abs(float(J_d) - J64) / abs(J64)
        fast["df64_rel_g"] = float(
            np.linalg.norm(np.asarray(g_d[0], np.float64) - g64)
            / np.linalg.norm(g64))
        # df64 + hand-rolled DF adjoint (df_adjoint=True): the reverse
        # sweep carries DF cotangent pairs — the VERDICT r4 item 4
        # done-criterion measurement: grad rel-err vs the pinned f64
        # truth ON-CHIP must break the 5.9e-4 f32-reverse floor down to
        # the <=1e-6 class (f32 output rounding)
        del p_df
        p_adj = OptimalMixing(MixingConfig(dtype=dtype, s=1,
                                           solve_precision="df64",
                                           df_adjoint=True))
        ms_a = chained_value_ms(p_adj.objective_and_gradient, x0, n=2)
        J_a, g_a = p_adj.objective_and_gradient(x0)
        fast["df64adj_ms"] = ms_a
        fast["df64adj_rel_J"] = abs(float(J_a) - J64) / abs(J64)
        fast["df64adj_rel_g"] = float(
            np.linalg.norm(np.asarray(g_a[0], np.float64) - g64)
            / np.linalg.norm(g64))
    if cpu_ms is None:
        cpu_ms = _mixing_cpu_baseline_ms()

    from spheremanopt_tpu.utils import profiling as prof

    # effective mode (p._smode): f64 CPU fallback executes one exact dot
    rl = prof.roofline(ms, *prof.mixing_cost_model(
        p.cfg.nx, p.cfg.nz, p.cfg.n_iters,
        passes=prof.passes_for(p._smode)))
    return ms / 1e3, cpu_ms, rel_J, rel_g, fast, rl


def bench_kdyn48(repeats=3, n_iters=500):
    """Scale demo (VERDICT round-1 item 10): KDyn at 48^3 with the
    pencil-decomposed distributed FFT in the production step path vs the
    matmul transforms, single chip (the same code scales over an ICI
    mesh via n_shards; multi-chip correctness is pinned by
    tests/test_parallel.py on the 8-device CPU mesh)."""
    import jax
    import jax.numpy as jnp

    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig,
        KinematicDynamo,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)  # f64 configs need x64
    dtype = "float32" if on_tpu else "float64"
    out = {}
    x0 = None
    for tname in ("matmul", "distributed"):
        p = KinematicDynamo(KDynConfig(npts=48, n_iters=n_iters, dt=5e-4,
                                       dtype=dtype, transform=tname,
                                       n_shards=1,
                                       project_gradients=False))
        if x0 is None:
            x0 = p.generate_ic(seed=42)
        ms = chained_value_ms(p.objective_and_gradient, x0, n=repeats)
        out[tname + "_ms"] = ms
        out[tname + "_J"] = float(p.objective(x0))
    return out


# CPU baselines precomputed by main() BEFORE any TPU work, shared with
# subprocess fallback children via this npz (CLAUDE.md rule 6: healthy-
# tunnel minutes are the scarce resource — children must not redo numpy
# baseline work inside their capped TPU window).
PRE_PATH = "/tmp/smo_bench_pre.npz"


def _runner_order(on_tpu: bool):
    """Secondary-bench order, budget- and wedge-aware: mixing first (the
    longest-compiling and most informative secondary), then the cheap
    SHB23, then the four end-to-end workload rows (the VERDICT-priority
    artifacts — ahead of the pallas kernel rows since a mid-secondaries
    wedge starves everything after it; measured twice in r4: one run
    lost the workload rows waiting out a wedge at kdyn48, a second lost
    them to a wedge at sh23_pallas), then the near-free pallas headline
    candidates, and LAST the 48^3 scale row — the most wedge-prone
    (biggest compile + longest run)."""
    runners = ["mixing_256x128", "shb23_512"]
    if on_tpu:
        runners += ["sh23_workload", "kdyn_workload", "shb23_workload",
                    "mixing_workload", "sh23_rtr_workload",
                    "kdyn_rtr_workload", "mixing_rtr_workload",
                    "mixing_df64_workload",
                    "sh23_pallas", "shb23_pallas"]
    return runners + ["kdyn48_scale"]


def _secondary(name, pre):
    """One secondary bench. The SAME code object serves the in-process
    happy path and the subprocess fallback (no duplicated code strings
    to drift); `pre` carries every precomputed CPU baseline."""
    if name == "mixing_256x128":
        t, c, rj, rg, fast, rl = bench_mixing(
            cpu_ms=float(pre["mixing_cpu_ms"]))
        return {"tpu_ms": t * 1e3, "cpu_ms": c, "rel_J": rj, "rel_g": rg,
                "roofline": rl, **fast}
    if name == "shb23_512":
        t, c, rl = bench_shb23()
        return {"tpu_ms": t * 1e3, "cpu_ms": c, "roofline": rl}
    if name == "kdyn48_scale":
        return bench_kdyn48()
    if name == "sh23_pallas":
        J_cpu = float(pre["sh23_J_cpu"])
        g_cpu = np.asarray(pre["sh23_g_cpu"], np.float64)
        t, J, g = bench_sh23_pallas(np.asarray(pre["u0"], np.float64))
        return {"ms": t, "rel_J": abs(J - J_cpu) / abs(J_cpu),
                "rel_g": float(np.linalg.norm(g - g_cpu)
                               / np.linalg.norm(g_cpu))}
    if name == "shb23_pallas":
        t, _J = bench_shb23_pallas()
        return {"ms": t}
    if name == "sh23_workload":
        return bench_sh23_workload()
    if name == "sh23_rtr_workload":
        return bench_sh23_rtr_workload()
    if name == "kdyn_rtr_workload":
        return bench_kdyn_rtr_workload()
    if name == "mixing_rtr_workload":
        return bench_mixing_rtr_workload()
    if name == "mixing_df64_workload":
        return bench_mixing_df64_workload()
    if name == "kdyn_workload":
        return bench_kdyn_workload()
    if name == "shb23_workload":
        return bench_shb23_workload()
    if name == "mixing_workload":
        return bench_mixing_workload()
    raise ValueError(f"unknown secondary bench {name!r}")


def bench_sh23_workload(repeats=3):
    """COMPLETE SH23 reference optimisation (the ref `__main__` config:
    max_iters=200, Wolfe+CG, alpha0=pi) as ONE device-loop executable
    (optim/jit_driver, method='pallas', early convergence exit). This is
    the end-to-end number a reference user experiences: wall-clock for
    the whole optimisation, not one fwd+grad unit."""
    import jax
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    p = SwiftHohenberg(SH23Config(npts=NPTS, n_iters=N_ITERS, dt=DT, e0=E0,
                                  dtype="float32", method="pallas"))
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=200, alpha0=float(np.pi), cg=True, line_search="wolfe")
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]
    r = opt(x0)
    _ = float(jnp.sum(r.function_values))   # compile + drain
    best = None
    for _i in range(repeats):
        t0 = time.perf_counter()
        r = opt(x0)
        jf = np.asarray(r.function_values)  # value pull ends the timing
        dt_s = time.perf_counter() - t0
        best = dt_s if best is None else min(best, dt_s)
    k = int(r.iterations)
    return {"total_s": best, "iterations": k,
            "J_final": float(jf[k - 1]) if k > 0 else None}


def bench_sh23_rtr_workload(repeats=2):
    """Trust-region Newton at the same full SH23 reference config (host
    driver, XLA matmul method, f32): the second-order workload row.
    Measured to reach a BETTER optimum than the reference's own
    Wolfe+CG on this workload — CG stalls via its line-search
    early-return (in f64 too), RTR converges to the J floor
    (BASELINE.md r4-late; optim/rtr.py)."""
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.rtr import optimise_rtr
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    p = SwiftHohenberg(SH23Config(npts=NPTS, n_iters=N_ITERS, dt=DT, e0=E0,
                                  dtype="float32", method="matmul"))
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]

    def run():
        return optimise_rtr(x0, p.radii, p.objective, p.gradient,
                            p.inner_product, err_tol=1e-6, max_iters=50,
                            verbose=False)

    r = run()   # compile (persistent cache absorbs the XLA programs)
    best = None
    for _i in range(repeats):
        t0 = time.perf_counter()
        r = run()
        dt_s = time.perf_counter() - t0
        best = dt_s if best is None else min(best, dt_s)
    out = {"total_s": best, "iterations": r.iterations,
           # None (not a fabricated 0.0) when no iterate was accepted
           "J_final": (float(r.function_values[-1])
                       if r.function_values else None),
           "hvp_evals": r.hvp_evals}

    # device-resident RTR: the WHOLE trust-region loop as one executable
    # (optim/jit_rtr.py) — same trajectory class (J/iterations match the
    # host driver on-chip), minus every per-trial host round-trip.
    # Measured steady 0.080 s for the complete workload vs 2.5 s host.
    from spheremanopt_tpu.optim.jit_rtr import jit_optimise_rtr

    opt = jit_optimise_rtr(p.objective, p.gradient, p.inner_product,
                           p.radii, err_tol=1e-6, max_iters=50)
    rd = opt(x0)
    _ = float(jnp.sum(rd.function_values))   # compile + drain
    dbest = None
    for _i in range(max(repeats, 3)):
        t0 = time.perf_counter()
        rd = opt(x0)
        jf = np.asarray(rd.function_values)
        dt_s = time.perf_counter() - t0
        dbest = dt_s if dbest is None else min(dbest, dt_s)
    kd = int(rd.iterations)
    out["device_total_s"] = dbest
    out["device_iterations"] = kd
    # history slots past the last accepted iterate are zero padding —
    # report None rather than the pad value when kd == 0
    out["device_J_final"] = float(jf[kd - 1]) if kd > 0 else None
    return out


def _time_device_loop(opt, x0, aux=None, repeats=2):
    """Compile + warm one device-loop optimisation, then time best-of-N
    (value pull on the histories ends each timing)."""
    import jax.numpy as jnp

    kw = {} if aux is None else {"aux": aux}
    r = opt(x0, **kw)
    _ = float(jnp.sum(r.function_values))   # compile + drain
    best = None
    for _i in range(repeats):
        t0 = time.perf_counter()
        r = opt(x0, **kw)
        jf = np.asarray(r.function_values)
        dt_s = time.perf_counter() - t0
        best = dt_s if best is None else min(best, dt_s)
    k = int(r.iterations)
    out = {"total_s": best, "iterations": k,
           "J_final": float(jf[k - 1]) if k > 0 else None}
    if hasattr(r, "trials"):   # JitRTRResult extras
        out["converged"] = int(bool(r.converged))
        out["trials"] = int(r.trials)
        out["hvp_evals"] = int(r.hvp_evals)
    return out


def bench_kdyn_workload():
    """COMPLETE KDyn reference optimisation (ref `FWD_Solve_KDyn.py:1066`:
    max_iters=10, alpha_k=100, Wolfe+CG; 24^3 x 2000 'Final' cost) as one
    device-loop executable — the end-to-end number a reference user
    experiences (VERDICT r3 item 2)."""
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)

    p = KinematicDynamo(KDynConfig(npts=24, n_iters=2000, dt=5e-4,
                                   dtype="float32",
                                   project_gradients=False))
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=10, alpha0=100.0, cg=True, line_search="wolfe")
    x0 = [jnp.asarray(np.asarray(x), jnp.float32)
          for x in p.generate_ic(seed=42)]
    return _time_device_loop(opt, x0)


def bench_shb23_workload():
    """COMPLETE SHB23 reference optimisation (ref `FWD_Solve_SHB23.py:997`:
    max_iters=50, err_tol=1e-5, alpha_k=1, Wolfe+CG; N=512 x 2000) through
    the pallas device loop."""
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config, SwiftHohenbergBounded)

    p = SwiftHohenbergBounded(SHB23Config(dtype="float32", method="pallas"))
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=50, err_tol=1e-5, alpha0=1.0, cg=True,
        line_search="wolfe")
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]
    return _time_device_loop(opt, x0)


def bench_mixing_workload():
    """COMPLETE mixing reference optimisation (ref
    `FWD_Solve_Poiseuille.py:1778`: err_tol=1e-6, max_iters=200,
    alpha_k=100, Wolfe+CG; 256x128 x 1000 s=1) through the device loop,
    operator stacks as jit operands (closure stacks trip the tunnel's
    HTTP 413 — see OptimalMixing.objective_and_gradient_aux)."""
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    p = OptimalMixing(MixingConfig(dtype="float32", s=1))
    fg, ops = p.objective_and_gradient_aux
    opt = jit_optimise_on_multi_sphere(
        fg, p.inner_product, p.radii,
        max_iters=200, err_tol=1e-6, alpha0=100.0, cg=True,
        line_search="wolfe")
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]
    return _time_device_loop(opt, x0, aux=ops)


def bench_kdyn_rtr_workload(repeats=2):
    """Trust-region Newton at the KDyn reference workload config
    (`FWD_Solve_KDyn.py:1066`: 24^3 x 2000 steps, max_iters=10) through
    the DEVICE-RESIDENT RTR loop (optim/jit_rtr) — the problem family
    where the reference's own CG+Wolfe stalls via its line-search
    early-return while RTR keeps converging
    (tests/test_rtr_pde.py::test_rtr_kdyn_converges_where_wolfe_stalls).
    J_final is directly comparable to kdyn_workload_J_final (same -J
    history convention; VERDICT r4 item 2 done-criterion: strictly
    better)."""
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.jit_rtr import jit_optimise_rtr
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)

    p = KinematicDynamo(KDynConfig(npts=24, n_iters=2000, dt=5e-4,
                                   dtype="float32",
                                   project_gradients=False))
    # MEASURED FINDING (r5, on-chip): this workload's gain objective is
    # UNBOUNDED over the control sphere — concentrating u raises the
    # induction growth rate without limit, and the discrete objective
    # rewards marching into the CNAB1 CFL-instability region (uncapped
    # RTR reaches gain 3.5e9; rho_max=100 alone slows it to 3.9e6; the
    # reference's 10-iteration Wolfe+CG study result is line-search-
    # regularised, not an optimum). So "J_final strictly better than
    # CG's" is a step-size race here, not an optimisation-quality
    # metric. The row records the PRINCIPLED configuration: trust
    # radius capped at 0.25x the sphere scale (the measured largest cap
    # whose 10-iteration trajectory stays on the physical branch —
    # delta_max sweep, BASELINE.md r5) + the model-breakdown guard.
    scale = float(np.sqrt(sum(float(r) for r in p.radii)))
    opt = jit_optimise_rtr(p.objective, p.gradient, p.inner_product,
                           p.radii, err_tol=1e-6, max_iters=10,
                           rho_max=100.0, delta_max=0.25 * scale)
    x0 = [jnp.asarray(np.asarray(x), jnp.float32)
          for x in p.generate_ic(seed=42)]
    out = _time_device_loop(opt, x0, repeats=repeats)
    out["regularisation"] = {
        "note": "delta_max=0.25*sphere_scale + rho_max=100 — the gain "
                "objective is unbounded (see bench_kdyn_rtr_workload "
                "docstring / BASELINE.md r5); uncapped RTR measured "
                "gain 3.5e9 through the CFL hole"}
    return out


def bench_mixing_rtr_workload(repeats=2):
    """Trust-region Newton at the mixing reference workload config
    (`FWD_Solve_Poiseuille.py:1778`: 256x128 x 1000 steps, err_tol=1e-6,
    max_iters=200, s=1) through the device RTR loop, operator stacks as
    aux jit operands (parity-tested:
    tests/test_jit_rtr.py::test_device_rtr_matches_host_on_mixing_aux_pde).
    The f32 CG+Wolfe workload row terminates early via the non-finite
    line-search guard at this config; RTR's rho acceptance has no
    bracketing to poison — J_final comparable to
    mixing_workload_J_final."""
    import jax.numpy as jnp

    from spheremanopt_tpu.optim.jit_rtr import jit_optimise_rtr
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    p = OptimalMixing(MixingConfig(dtype="float32", s=1))
    fg, ops = p.objective_and_gradient_aux
    f_rtr = lambda a, xs: fg(a, xs)[0]   # noqa: E731
    g_rtr = lambda a, xs: fg(a, xs)[1]   # noqa: E731
    opt = jit_optimise_rtr(f_rtr, g_rtr, p.inner_product, p.radii,
                           err_tol=1e-6, max_iters=200)
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]
    return _time_device_loop(opt, x0, aux=ops, repeats=repeats)


def bench_mixing_df64_workload():
    """A mixing workload row that COMPLETES the reference config
    (VERDICT r4 item 3): host Wolfe+CG on the df64 (n_bits=32) gradient
    path — the configuration the 512x256 study proved completes 10/10
    iterations where the f32 path's Wolfe guard terminates at 6-9
    (BASELINE.md r4). Reference config shape
    `FWD_Solve_Poiseuille.py:1746-1778` at 256x128 x 1000 steps, s=1,
    alpha0=100, max_iters=10 (the study class: mix-norm -> ~0.0124).
    One timed pass — a complete multi-minute optimisation, not a
    best-of-N microbench."""
    import warnings

    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    p = OptimalMixing(MixingConfig(dtype="float32", s=1,
                                   solve_precision="df64", df_n_bits=32))
    x0 = p.generate_ic(seed=42)
    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = optimise_on_multi_sphere(
            x0, p.radii, p.objective_f64, p.gradient, p.inner_product,
            err_tol=1e-6, max_iters=10, alpha_k=100.0,
            line_search="wolfe", cg=True, verbose=False,
            f_and_g=p.objective_and_gradient)
    wall = time.perf_counter() - t0
    return {"total_s": wall, "iterations": r.iterations,
            "J_final": (float(r.function_values[-1])
                        if r.function_values else None),
            "completed_ref_iters": int(r.iterations >= 10)}


def main():
    t_start = time.perf_counter()
    # soft budget: secondaries are skipped when insufficient time remains
    # so the headline JSON always prints (driver timeouts vary)
    budget_s = float(__import__("os").environ.get("SMO_BENCH_BUDGET", "1500"))
    _enable_compile_cache()
    sys.path.insert(0, "baselines")
    from sh23_numpy import generate_ic_like

    from spheremanopt_tpu.utils import profiling as prof

    u0 = generate_ic_like(npts=NPTS, seed=42, e0=E0)

    cpu_s, J_cpu, g_cpu = bench_baseline_cpu(u0)
    mixing_cpu_ms = _mixing_cpu_baseline_ms()   # numpy-only, pre-TPU
    # a wedged tunnel would hang the first dispatch for ~20-45 min;
    # wait it out rather than compiling into it (budget-capped)
    if not _wait_for_tpu(t_start, budget_s, reserve_s=300.0):
        # budget exhausted waiting: emit a degraded-but-valid line
        # rather than hanging into the driver's kill — carrying the most
        # recent COMPLETE run (clearly labelled with its provenance) so
        # a wedge at bench time degrades to stale-but-real numbers, not
        # to nulls
        print(json.dumps({
            "metric": "SH23 N=256 T=50 fwd+grad wall-clock (1 opt-iter unit)",
            "value": None, "unit": "ms", "vs_baseline": None,
            "detail": {"error": "tunnel wedged; budget exhausted waiting",
                       "sh23_cpu_baseline_ms": round(cpu_s * 1e3, 3),
                       **_load_last_good()},
        }))
        return
    tpu_s, J_tpu, g_tpu = bench_tpu(u0)

    rel_J = abs(J_tpu - J_cpu) / abs(J_cpu)
    rel_g = float(np.linalg.norm(g_tpu - g_cpu) / np.linalg.norm(g_cpu))
    sh23_rl = prof.roofline(tpu_s * 1e3,
                            *prof.sh23_cost_model(NPTS, N_ITERS))

    kd_tpu, kd_cpu, kd_rel_J, kd_rel_g, kd_fast, kd_mode, kd_rl = bench_kdyn()

    # headline record: promoted to the pallas kernel path post-secondaries
    # when it measures faster at matching accuracy (both are production
    # methods; the method used is recorded)
    headline = {"ms": tpu_s * 1e3, "vs": cpu_s / tpu_s,
                "method": "matmul (XLA scan)"}

    def emit(extra, final=False):
        rec = {
            "metric": "SH23 N=256 T=50 fwd+grad wall-clock (1 opt-iter unit)",
            "value": round(headline["ms"], 3),
            "unit": "ms",
            "vs_baseline": round(headline["vs"], 2),
            "detail": {
                "sh23_method": headline["method"],
                "sh23_matmul_ms": round(tpu_s * 1e3, 3),
                "sh23_cpu_baseline_ms": round(cpu_s * 1e3, 3),
                "sh23_J_rel_err_vs_f64_cpu": f"{rel_J:.2e}",
                "sh23_grad_rel_err_vs_f64_cpu": f"{rel_g:.2e}",
                "kdyn24_fwd_grad_ms": round(kd_tpu * 1e3, 3),
                "kdyn24_cpu_baseline_ms": round(kd_cpu * 1e3, 3),
                "kdyn24_vs_baseline": round(kd_cpu / kd_tpu, 2),
                "kdyn24_J_rel_err": f"{kd_rel_J:.2e}",
                "kdyn24_grad_rel_err": f"{kd_rel_g:.2e}",
                "kdyn24_precision_mode": kd_mode,
                "sh23_roofline": sh23_rl,
                "kdyn24_roofline": kd_rl,
                **{f"kdyn24_{k[:-2] + '_ms' if k.endswith('_s') else k}":
                   (round(v * 1e3, 3) if k.endswith("_s") else f"{v:.2e}")
                   for k, v in kd_fast.items()},
                **extra,
            },
        }
        print(json.dumps(rec), flush=True)
        if final:
            _save_last_good(rec)

    # provisional line: if a wedge or the driver's timeout kills this
    # process mid-secondaries, the headline work is not lost (the
    # parent/driver takes the LAST complete line)
    emit({"secondaries": "in progress"})
    # headline measurements into the per-row store immediately (a later
    # wedge-degraded run carries them as headline LKG)
    _lg_update_rows({"headline": {
        "sh23_matmul_ms": round(tpu_s * 1e3, 3),
        "sh23_vs_baseline": round(cpu_s / tpu_s, 2),
        "sh23_J_rel_err_vs_f64_cpu": f"{rel_J:.2e}",
        "kdyn24_fwd_grad_ms": round(kd_tpu * 1e3, 3),
        "kdyn24_vs_baseline": round(kd_cpu / kd_tpu, 2),
        "kdyn24_J_rel_err": f"{kd_rel_J:.2e}",
        **{f"kdyn24_{k[:-2] + '_ms' if k.endswith('_s') else k}":
           (round(v * 1e3, 3) if k.endswith("_s") else f"{v:.2e}")
           for k, v in kd_fast.items()},
    }})

    # Secondary benches. Happy path: run them IN-PROCESS — with the
    # persistent compile cache warm there is almost nothing to compile,
    # and every extra process is another tunnel device-init (the wedge
    # correlates with process churn; measured r3: the wedge struck
    # mid-bench in 3 of 4 multi-process runs). If an in-process bench
    # throws, the process may be contaminated (platform rule: a process
    # that hits UNIMPLEMENTED does not recover), so every remaining
    # bench falls back to the SUBPROCESS path with one retry; full child
    # stderr goes to /tmp/smo_bench_<name>.stderr, tail in the JSON.
    import os
    import subprocess

    pre = {"mixing_cpu_ms": mixing_cpu_ms, "u0": u0,
           "sh23_J_cpu": J_cpu, "sh23_g_cpu": g_cpu}
    np.savez(PRE_PATH, **pre)  # hand the same baselines to fallback children

    extra = {}
    on_tpu = __import__("jax").devices()[0].platform != "cpu"
    runners = _runner_order(on_tpu)

    def _record(name, r):
        r = dict(r)
        extra.pop(name + "_error", None)
        extra.pop(name + "_skipped", None)
        extra.pop(name + "_last_good", None)
        fresh = {}
        if "tpu_ms" in r:
            tpu_ms = r.pop("tpu_ms")
            cpu_ms = r.pop("cpu_ms")
            fresh[name + "_fwd_grad_ms"] = round(tpu_ms, 3)
            fresh[name + "_vs_baseline"] = round(cpu_ms / tpu_ms, 2)
        for k, v in r.items():
            # None passes through as JSON null (e.g. a workload row's
            # J_final when zero iterates were accepted — the RTR rows'
            # guards make that reachable; round(float(None)) would
            # TypeError and poison the whole run as 'contaminated')
            fresh[f"{name}_{k}"] = (
                v if isinstance(v, dict) or v is None
                else f"{v:.2e}" if "rel" in k
                else round(float(v), 4))
        extra.update(fresh)
        # refresh the committed per-row last-good store as soon as the
        # row measures cleanly (NOT only on fully-clean runs: the store
        # must converge even when every run is partially wedged)
        _lg_update_rows({name: fresh})

    def _mark_skipped(name, reason):
        if name + "_error" not in extra:
            extra[name + "_skipped"] = reason
        # attach the most recent clean measurement of THIS row, with
        # provenance, so the degraded artifact still carries real values
        # (VERDICT r4 item 1b: every degraded row, not just the
        # pre-headline path)
        extra.update(_lg_row(name))

    tstate = {"wedged": False}
    contaminated = False

    def _try_row(name):
        """One full attempt at a row: in-process unless the process is
        contaminated, then the subprocess fallback with one retry.
        Returns True when the row was recorded."""
        nonlocal contaminated
        if not contaminated:
            try:
                _record(name, _secondary(name, pre))
                # progressive emit: a wedge/timeout later in the loop
                # must not lose the secondaries already measured (the
                # driver takes the LAST complete line)
                emit(extra)
                return True
            except Exception as e:
                contaminated = True
                with open(f"/tmp/smo_bench_{name}.stderr", "a") as fh:
                    fh.write(f"--- in-process attempt failed: {e!r}\n")
        child = (
            "import sys, json; sys.path.insert(0, 'baselines'); "
            "import numpy as np; import bench; "
            "bench._enable_compile_cache(); "
            f"pre = dict(np.load(bench.PRE_PATH)); "
            f"print('RES', json.dumps(bench._secondary({name!r}, pre)))")
        err_path = f"/tmp/smo_bench_{name}.stderr"
        for attempt in (1, 2):
            remaining = budget_s - (time.perf_counter() - t_start)
            if remaining < 300:
                _mark_skipped(name, f"budget ({int(remaining)}s left)")
                return False
            if not _wait_for_tpu(t_start, budget_s, reserve_s=360.0,
                                 max_wait_s=240.0, state=tstate):
                _mark_skipped(name, "tunnel wedged")
                return False
            remaining = budget_s - (time.perf_counter() - t_start)
            try:
                out = subprocess.run(
                    [sys.executable, "-c", child],
                    capture_output=True, text=True,
                    # cap per attempt: a wedge mid-child must not eat the
                    # whole budget (warm-cache children finish in <200 s)
                    timeout=min(620, remaining - 30), cwd=".",
                )
                with open(err_path, "a") as fh:
                    fh.write(f"--- attempt {attempt} rc={out.returncode}\n"
                             + out.stderr)
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("RES")]
                if line:
                    _record(name, json.loads(line[0][4:]))
                    emit(extra)
                    return True
                tail = out.stderr.strip()[-300:]
                extra[name + "_error"] = f"(see {err_path}) {tail}"
            except Exception as e:
                with open(err_path, "a") as fh:
                    fh.write(f"--- attempt {attempt} exception: {e}\n")
                extra[name + "_error"] = str(e)[:300]
        extra.update(_lg_row(name))   # exhausted attempts: degrade to LKG
        return False

    for name in runners:
        remaining = budget_s - (time.perf_counter() - t_start)
        if remaining < 120:
            _mark_skipped(name, f"budget ({int(remaining)}s left)")
            continue
        # per-row wedge-wait cap (one wedge must not starve later rows);
        # once the tunnel is known-wedged later rows probe-and-skip fast
        row_wait = 45.0 if tstate["wedged"] else 240.0
        if not _wait_for_tpu(t_start, budget_s, reserve_s=120.0,
                             max_wait_s=row_wait, state=tstate):
            _mark_skipped(name, "tunnel wedged")
            continue
        _try_row(name)

    # final retry pass: a wedge that cleared before the budget ran out
    # must not leave rows skipped (VERDICT r4 item 1c). Skipped rows are
    # retried in order while budget remains; _error rows stay (they
    # failed ON a healthy tunnel — retrying them is the existing
    # 2-attempt logic's job, not the wedge pass's).
    retry = [n for n in runners if n + "_skipped" in extra]
    if retry:
        emit(extra)   # persist the pre-retry state first
    for name in retry:
        remaining = budget_s - (time.perf_counter() - t_start)
        if remaining < 240:
            break
        if not _wait_for_tpu(t_start, budget_s, reserve_s=180.0,
                             max_wait_s=remaining - 200.0, state=tstate):
            break
        if _try_row(name):
            emit(extra)

    # promote the VMEM-resident kernel path to the headline when it
    # measured faster at matching accuracy (<1e-4 vs the f64 CPU J —
    # the matmul path itself sits at ~1e-6)
    try:
        pl_ms = float(extra["sh23_pallas_ms"])
        pl_rel = float(extra["sh23_pallas_rel_J"])
        if pl_ms < headline["ms"] and pl_rel < 1e-4:
            headline.update(ms=pl_ms, vs=cpu_s * 1e3 / pl_ms,
                            method="pallas (VMEM-resident kernel)")
    except (KeyError, ValueError):
        pass
    if "shb23_pallas_ms" in extra and "shb23_512_fwd_grad_ms" in extra:
        shb_cpu = (float(extra["shb23_512_fwd_grad_ms"])
                   * float(extra["shb23_512_vs_baseline"]))
        extra["shb23_pallas_vs_baseline"] = round(
            shb_cpu / float(extra["shb23_pallas_ms"]), 2)

    # a run counts as last-known-good only when no row degraded
    clean = not any(k.endswith(("_error", "_skipped")) for k in extra)
    emit(extra, final=clean)


def _main_with_retry():
    """The axon tunnel sporadically fails with transient INTERNAL /
    UNIMPLEMENTED errors and a failed process does not recover; run the
    benchmark in child processes and retry once on failure."""
    import os
    import subprocess

    if os.environ.get("SMO_BENCH_CHILD") == "1":
        main()
        return
    env = dict(os.environ, SMO_BENCH_CHILD="1")
    # the child's kill timeout must track the soft budget (a raised
    # SMO_BENCH_BUDGET with a fixed 1650 s cap killed run-1 of the r5
    # watcher mid-secondaries and silently restarted everything)
    child_timeout = float(os.environ.get("SMO_BENCH_BUDGET", "1500")) + 150
    last_err = ""
    partial = None
    for attempt in range(2):
        try:
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True,
                text=True, timeout=child_timeout,
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if out.returncode == 0 and lines:
                print(lines[-1])
                return
            if lines:
                partial = lines[-1]  # provisional emit from a killed child
            last_err = (out.stderr.strip().splitlines() or ["?"])[-1][:200]
        except subprocess.TimeoutExpired as e:
            # the child's provisional emit (printed right after the
            # headline work) survives in the captured partial stdout
            stdout = e.stdout or b""
            if isinstance(stdout, bytes):
                stdout = stdout.decode(errors="replace")
            lines = [l for l in stdout.splitlines() if l.startswith("{")]
            if lines:
                partial = lines[-1]
            last_err = "benchmark child timed out"
    if partial is not None:
        try:
            d = json.loads(partial)
            d.setdefault("detail", {})["partial"] = (
                f"headline only; child did not finish ({last_err})")
            print(json.dumps(d))
            return
        except Exception:
            pass
    print(json.dumps({
        "metric": "SH23 N=256 T=50 fwd+grad wall-clock (1 opt-iter unit)",
        "value": None, "unit": "ms", "vs_baseline": None,
        "detail": {"error": f"both attempts failed: {last_err}",
                   **_load_last_good()},
    }))


if __name__ == "__main__":
    _main_with_retry()
