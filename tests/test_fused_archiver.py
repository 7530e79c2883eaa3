"""Fused diagnostics capture: full per-iteration archives at ZERO extra
PDE solves.

The reference's scalar_data/CheckPoints handlers ride the SAME Dedalus
FWD solve the cost uses, and `File_Manips` merely copies files per
iteration (`FWD_Solve_SH23.py:478-483,731-746`). `FusedArchiver`
reproduces that property: the problems' `objective_and_diagnostics` /
`objective_gradient_and_diagnostics` emit the diagnostics payload as an
aux output of the very solve the optimiser runs, and the archiver caches
it by the (exact) accepted objective value.

Covered here:
  * J/gradient parity: the aux-output objectives match the plain ones
    (bitwise-class f64 agreement) on all four PDE problems and both
    KDyn costs / both mixing s modes;
  * series parity: the fused KE/ME series equals a `diagnostics()`
    re-run at the same point;
  * the zero-extra-solve property: a full optimisation with the archiver
    wired never calls `diagnostics()` (cache hits on every iteration);
  * the CLI `--archive-full` path produces full-diagnostics archives.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from spheremanopt_tpu.io.timeseries import FusedArchiver
from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.kinematic_dynamo import (
    KDynConfig,
    KinematicDynamo,
)
from spheremanopt_tpu.problems.optimal_mixing import (
    MixingConfig,
    OptimalMixing,
)
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg
from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
    SHB23Config,
    SwiftHohenbergBounded,
)


def _problem_cases():
    return [
        ("sh23-fft", SwiftHohenberg(
            SH23Config(npts=32, n_iters=30, method="fft"))),
        ("sh23-matmul", SwiftHohenberg(
            SH23Config(npts=32, n_iters=30, method="matmul"))),
        ("shb23", SwiftHohenbergBounded(
            SHB23Config(npts=48, n_iters=30))),
        ("kdyn-final", KinematicDynamo(
            KDynConfig(npts=12, n_iters=20, dt=1e-3, cost="Final"))),
        ("kdyn-integrated", KinematicDynamo(
            KDynConfig(npts=12, n_iters=20, dt=1e-3, cost="Integrated"))),
        ("mixing-s1", OptimalMixing(
            MixingConfig(nx=32, nz=24, n_iters=20, dt=5e-3, s=1))),
        ("mixing-s0", OptimalMixing(
            MixingConfig(nx=32, nz=24, n_iters=20, dt=5e-3, s=0))),
    ]


@pytest.mark.parametrize("name,problem",
                         _problem_cases(), ids=lambda v: v if isinstance(v, str) else "")
def test_fused_objective_matches_plain(name, problem):
    """Aux-output objective == plain objective (J and gradient), and the
    fused series == a diagnostics() re-run at the same point."""
    x = problem.generate_ic(seed=3)
    assert problem.has_fused_diagnostics

    J_plain, g_plain = problem.objective_and_gradient(x)
    J_d, diag = problem.objective_and_diagnostics(x)
    J_gd, g_d, diag2 = problem.objective_gradient_and_diagnostics(x)

    np.testing.assert_allclose(float(J_d), float(J_plain), rtol=1e-14)
    np.testing.assert_allclose(float(J_gd), float(J_plain), rtol=1e-14)
    for a, b in zip(g_plain, g_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-12, atol=1e-15)

    full = problem.diagnostics(x)
    series_keys = [k for k in ("kinetic_energy", "magnetic_energy",
                               "buoyancy_energy") if k in full]
    assert series_keys
    for k in series_keys:
        assert k in diag and k in diag2
        np.testing.assert_allclose(np.asarray(diag[k]), np.asarray(full[k]),
                                   rtol=1e-12, atol=1e-300,
                                   err_msg=f"{name}:{k}")
    np.testing.assert_allclose(np.asarray(diag["sim_time"]),
                               np.asarray(full["sim_time"]))


@pytest.mark.parametrize("make", [
    lambda k: SwiftHohenberg(
        SH23Config(npts=32, n_iters=30, method="matmul", diag_stride=k)),
    lambda k: SwiftHohenbergBounded(
        SHB23Config(npts=48, n_iters=30, diag_stride=k)),
], ids=["sh23", "shb23"])
def test_diag_stride_subsamples_series(make):
    """diag_stride=k: J unchanged (op-identical chunked scan), the fused
    series equals the per-step series subsampled every k (the reference
    records scalar_data every 20 iters, `FWD_Solve_SH23.py:478-481`)."""
    p1, pk = make(1), make(6)
    x = p1.generate_ic(seed=3)

    J1, d1 = p1.objective_and_diagnostics(x)
    Jk, dk = pk.objective_and_diagnostics(x)
    np.testing.assert_allclose(float(Jk), float(J1), rtol=1e-14)

    np.testing.assert_allclose(np.asarray(dk["kinetic_energy"]),
                               np.asarray(d1["kinetic_energy"])[::6],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dk["sim_time"]),
                               np.asarray(d1["sim_time"])[::6])

    # gradient path unchanged too
    _, gk, _ = pk.objective_gradient_and_diagnostics(x)
    _, g1 = p1.objective_and_gradient(x)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(g1[0]),
                               rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("make", [
    lambda k: SwiftHohenberg(
        SH23Config(npts=32, n_iters=30, method="matmul", diag_stride=k)),
    lambda k: SwiftHohenbergBounded(
        SHB23Config(npts=48, n_iters=30, diag_stride=k)),
], ids=["sh23", "shb23"])
def test_diag_stride_non_dividing(make):
    """diag_stride need not divide n_iters (the reference's every-N
    handler cadence has no such constraint, FWD_Solve_SH23.py:499-503):
    a short final chunk records its start energy, the final step is
    always last, sim_time matches, J unchanged."""
    from spheremanopt_tpu.solvers.scan_utils import strided_steps

    p1, pk = make(1), make(7)            # 30 % 7 == 2
    x = p1.generate_ic(seed=3)

    J1, d1 = p1.objective_and_diagnostics(x)
    Jk, dk = pk.objective_and_diagnostics(x)
    np.testing.assert_allclose(float(Jk), float(J1), rtol=1e-14)

    steps = strided_steps(30, 7)
    np.testing.assert_array_equal(steps, [0, 7, 14, 21, 28, 30])
    np.testing.assert_allclose(np.asarray(dk["kinetic_energy"]),
                               np.asarray(d1["kinetic_energy"])[steps],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dk["sim_time"]),
                               np.asarray(d1["sim_time"])[steps])

    # gradient path unchanged too
    _, gk, _ = pk.objective_gradient_and_diagnostics(x)
    _, g1 = p1.objective_and_gradient(x)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(g1[0]),
                               rtol=1e-12, atol=1e-15)


def test_diag_stride_validation():
    with pytest.raises(ValueError, match="diag_stride"):
        SwiftHohenberg(SH23Config(npts=32, n_iters=30, diag_stride=0))
    with pytest.raises(ValueError, match="diag_stride"):
        SwiftHohenbergBounded(SHB23Config(npts=48, n_iters=30,
                                          diag_stride=-1))


def test_fused_archiver_zero_extra_solves(tmp_path):
    """A full optimisation with FusedArchiver wired archives complete
    diagnostics every iteration without EVER re-running the forward."""
    problem = SwiftHohenberg(SH23Config(npts=32, n_iters=30, method="fft"))
    x0 = problem.generate_ic(seed=3)

    calls = {"diagnostics": 0}
    orig = problem.diagnostics
    problem.diagnostics = lambda xs: (calls.__setitem__(
        "diagnostics", calls["diagnostics"] + 1) or orig(xs))

    arch = FusedArchiver("diag", problem, str(tmp_path))
    res = optimise_on_multi_sphere(
        x0, problem.radii, arch.f, problem.gradient, problem.inner_product,
        max_iters=4, alpha_k=1.0, f_and_g=arch.f_and_g, callback=arch,
        verbose=False,
    )
    assert res.iterations >= 2
    # paths lists only LANDED files (async writes append from the
    # done-callback) — flush() before counting
    arch.flush()
    assert len(arch.paths) == res.iterations
    assert calls["diagnostics"] == 0
    assert arch.fallback_recomputes == 0

    # the archived payload at the final iterate matches a fresh re-run
    with np.load(arch.paths[-1]) as data:
        archived = data["kinetic_energy"]
    fresh = orig(res.x_opt)
    np.testing.assert_allclose(archived, np.asarray(fresh["kinetic_energy"]),
                               rtol=1e-12)


def test_fused_archiver_fallback_on_cache_miss(tmp_path):
    """A callback fired without a matching cached J (e.g. resume paths)
    falls back to one diagnostics() re-run instead of failing."""
    problem = SwiftHohenberg(SH23Config(npts=32, n_iters=30, method="fft"))
    x0 = problem.generate_ic(seed=3)
    arch = FusedArchiver("diag", problem, str(tmp_path))

    class R:
        function_values = [-0.123456]   # never evaluated through arch.f
        x_opt = x0

    arch(1, R())
    assert arch.fallback_recomputes == 1
    arch.flush()   # paths appends only when the async write lands
    assert len(arch.paths) == 1
    assert os.path.exists(arch.paths[0])


def test_pallas_config_has_fused_diagnostics():
    """The pallas method now carries a fused-diagnostics kernel form
    (VERDICT r3 item 3: --archive-full no longer re-solves): J is
    BITWISE the plain kernel objective and the captured series matches
    the re-running diagnostics()."""
    p = SwiftHohenberg(SH23Config(npts=32, n_iters=10, dtype="float32",
                                  method="pallas"))
    assert p.has_fused_diagnostics
    x0 = p.generate_ic(seed=3)
    J, diag = p.objective_and_diagnostics(x0)
    assert float(J) == float(p.objective(x0))   # op-identical kernels
    full = p.diagnostics(x0)
    np.testing.assert_allclose(np.asarray(diag["kinetic_energy"]),
                               np.asarray(full["kinetic_energy"]),
                               rtol=2e-5)
    # fused (J, grad, diag): gradient bitwise the production fused form
    Jg, g, diag2 = p.objective_gradient_and_diagnostics(x0)
    J2, g2 = p.objective_and_gradient(x0)
    assert float(Jg) == float(J2)
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(g2[0]))
    # nested-remat KDyn carries the fused form too (the per-step
    # energy series rides the sqrt(N)-chunked scan; op-identity is
    # pinned by tests/test_kdyn.py::test_aux_objective_op_identical...)
    k = KinematicDynamo(KDynConfig(npts=12, n_iters=8, dt=1e-3,
                                   remat="nested"))
    assert k.has_fused_diagnostics

    # non-dividing stride on the kernel path: the static subsample picks
    # chunk starts + the final step (strided_steps semantics)
    from spheremanopt_tpu.solvers.scan_utils import strided_steps

    p3 = SwiftHohenberg(SH23Config(npts=32, n_iters=10, dtype="float32",
                                   method="pallas", diag_stride=3))
    J3, d3 = p3.objective_and_diagnostics(x0)
    assert float(J3) == float(J)
    steps = strided_steps(10, 3)
    np.testing.assert_array_equal(steps, [0, 3, 6, 9, 10])
    np.testing.assert_array_equal(
        np.asarray(d3["kinetic_energy"]),
        np.asarray(diag["kinetic_energy"])[steps])
    np.testing.assert_allclose(np.asarray(d3["sim_time"]),
                               np.asarray(diag["sim_time"])[steps])


def test_pallas_fused_archiver_zero_extra_solves(tmp_path):
    """End-to-end: a pallas-method optimisation with FusedArchiver never
    re-solves and archives the kernel-captured payloads."""
    problem = SwiftHohenberg(SH23Config(npts=32, n_iters=20,
                                        dtype="float32", method="pallas"))
    x0 = problem.generate_ic(seed=3)
    calls = {"diagnostics": 0}
    orig = problem.diagnostics
    problem.diagnostics = lambda xs: (calls.__setitem__(
        "diagnostics", calls["diagnostics"] + 1) or orig(xs))
    arch = FusedArchiver("diag", problem, str(tmp_path))
    res = optimise_on_multi_sphere(
        x0, problem.radii, arch.f, problem.gradient, problem.inner_product,
        max_iters=3, alpha_k=1.0, f_and_g=arch.f_and_g, callback=arch,
        verbose=False,
    )
    assert res.iterations >= 2
    assert calls["diagnostics"] == 0
    assert arch.fallback_recomputes == 0
    arch.flush()
    with np.load(arch.paths[-1]) as data:
        assert data["kinetic_energy"].shape == (21,)
        assert "u_final" in data.files


def test_cli_archive_full_uses_fused_capture(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--npts", "32", "--n-iters", "30", "--max-iters", "2",
         "--archive-every", "1", "--archive-full", "--quiet",
         "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    archives = sorted((tmp_path / "run").glob("diag_iter_*.npz"))
    assert archives
    with np.load(archives[-1]) as data:
        assert "kinetic_energy" in data.files
        assert "u_final" in data.files
        assert data["kinetic_energy"].shape == (31,)
