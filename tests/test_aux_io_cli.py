"""Auxiliary subsystem tests: continuous adjoints, diagnostics/time-series
io, figures, iteration archiver, CLI entry point."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg
from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
    SHB23Config,
    SwiftHohenbergBounded,
)


def test_sh23_continuous_adjoint_converges_to_discrete():
    """|g_cnts - g_disc| = O(dt): halving dt halves the gap (the
    reference documents Continuous-mode gradients as first-order)."""
    gaps = []
    for dt, n in [(0.05, 40), (0.025, 80)]:
        pd = SwiftHohenberg(SH23Config(npts=32, n_iters=n, dt=dt, adjoint="discrete"))
        pc = SwiftHohenberg(SH23Config(npts=32, n_iters=n, dt=dt, adjoint="continuous"))
        x0 = pd.generate_ic(seed=42, e0=1.0)
        gd, gc = pd.gradient(x0)[0], pc.gradient(x0)[0]
        gaps.append(float(jnp.linalg.norm(gd - gc) / jnp.linalg.norm(gd)))
    assert gaps[1] < 0.65 * gaps[0], gaps


def test_kdyn_continuous_matches_projected_discrete():
    """The reference's continuous adjoint solves with div nu = 0, so its
    dJ/dU equals the Leray projection of the exact gradient (our default
    project_gradients=True reproduces this); dJ/dB converges at O(dt)."""
    pd = KinematicDynamo(KDynConfig(npts=12, n_iters=50, dt=5e-4, adjoint="discrete"))
    pc = KinematicDynamo(KDynConfig(npts=12, n_iters=50, dt=5e-4, adjoint="continuous"))
    x0 = pd.generate_ic(seed=42)
    gd, gc = pd.gradient(x0), pc.gradient(x0)
    rel_b = float(jnp.linalg.norm(gd[0] - gc[0]) / jnp.linalg.norm(gd[0]))
    rel_u = float(jnp.linalg.norm(gd[1] - gc[1]) / jnp.linalg.norm(gd[1]))
    assert rel_b < 5e-3, rel_b
    assert rel_u < 5e-3, rel_u


def test_kdyn_gradient_projection_flag():
    p_proj = KinematicDynamo(KDynConfig(npts=12, n_iters=20, dt=1e-3))
    p_raw = KinematicDynamo(
        KDynConfig(npts=12, n_iters=20, dt=1e-3, project_gradients=False)
    )
    x0 = p_proj.generate_ic(seed=42)
    g_proj = p_proj.gradient(x0)
    g_raw = p_raw.gradient(x0)
    # projected gradient is divergence-free; raw one is not
    k = jnp.asarray(p_proj._k)
    div_p = float(jnp.abs(jnp.sum(k * p_proj.to_coeff(g_proj[1]), axis=0)).max())
    div_r = float(jnp.abs(jnp.sum(k * p_raw.to_coeff(g_raw[1]), axis=0)).max())
    assert div_p < 1e-10
    assert div_r > 1e-3
    # projection only removes the compressible part
    gp2 = p_proj.to_grid(p_proj._leray(p_proj.to_coeff(g_raw[1])))
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(g_proj[1]), atol=1e-9)


def test_shb23_continuous_adjoint_close_to_discrete():
    pd = SwiftHohenbergBounded(SHB23Config(npts=96, n_iters=60, adjoint="discrete"))
    pc = SwiftHohenbergBounded(SHB23Config(npts=96, n_iters=60, adjoint="continuous"))
    x0 = pd.generate_ic(seed=42)
    gd, gc = pd.gradient(x0)[0], pc.gradient(x0)[0]
    rel = float(jnp.linalg.norm(gd - gc) / jnp.linalg.norm(gd))
    assert rel < 0.05, rel


def test_diagnostics_and_io_roundtrip(tmp_path):
    p = SwiftHohenberg(SH23Config(npts=32, n_iters=20))
    x0 = p.generate_ic(seed=1)
    diag = p.diagnostics(x0)
    assert len(diag["kinetic_energy"]) == p.cfg.n_iters + 1
    assert np.isclose(
        float(diag["kinetic_energy"][0]), float(p.inner_product(x0[0], x0[0])),
        rtol=1e-10,
    )

    from spheremanopt_tpu.io.timeseries import (
        load_scalar_series,
        save_scalar_series,
    )

    path = save_scalar_series(
        str(tmp_path / "scalars"), diag["sim_time"], ke=diag["kinetic_energy"]
    )
    loaded = load_scalar_series(path)
    np.testing.assert_allclose(loaded["ke"], diag["kinetic_energy"])


def test_figures_render(tmp_path):
    p = SwiftHohenberg(SH23Config(npts=32, n_iters=20))
    diag = p.diagnostics(p.generate_ic(seed=1))
    from spheremanopt_tpu.io.figures import (
        plot_energy_series,
        plot_profile,
        plot_spectrum,
    )
    from spheremanopt_tpu.optim.plotting import plot_optimisation

    assert os.path.exists(plot_energy_series(diag, str(tmp_path / "e.png")))
    assert os.path.exists(
        plot_profile(diag, "u_final", "x_grid", str(tmp_path / "p.png"))
    )
    assert os.path.exists(plot_spectrum(diag["u_hat_final"], str(tmp_path / "s.png")))
    assert os.path.exists(
        plot_optimisation([[1.0, 0.5, 0.1]], [1.0, 2.0, 3.0], str(tmp_path / "c.png"))
    )


def test_cli_end_to_end(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform", "cpu",
         "--npts", "32", "--n-iters", "30", "--max-iters", "2", "--quiet",
         "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "run" / "summary.json").exists()
    assert (tmp_path / "run" / "DAL_PROGRESS.npz").exists()
    assert (tmp_path / "run" / "convergence.pdf").exists()


def test_cli_test_grad_mode(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform", "cpu",
         "--npts", "32", "--n-iters", "30", "--test-grad",
         "--out-dir", str(tmp_path / "tg")],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PASSED" in out.stdout
    assert (tmp_path / "tg" / "eps_TestR_TestR2_h_h2.npy").exists()


def test_cli_resume_flow(tmp_path):
    """--resume warm-starts from a previous run's DAL_PROGRESS.npz."""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    base = [sys.executable, "-m", "spheremanopt_tpu.run", "sh23",
            "--platform", "cpu", "--npts", "32", "--n-iters", "30", "--quiet"]
    out1 = subprocess.run(
        base + ["--max-iters", "2", "--out-dir", str(tmp_path / "a")],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out1.returncode == 0, out1.stderr[-1500:]
    out2 = subprocess.run(
        base + ["--max-iters", "1", "--out-dir", str(tmp_path / "b"),
                "--resume", str(tmp_path / "a" / "DAL_PROGRESS.npz")],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out2.returncode == 0, out2.stderr[-1500:]
    assert "warm-starting from iteration 2" in out2.stdout
    import json as _json

    s1 = _json.loads(open(tmp_path / "a" / "summary.json").read())
    s2 = _json.loads(open(tmp_path / "b" / "summary.json").read())
    # resumed run continues improving from where run a stopped
    assert s2["J_final"] >= s1["J_final"] - 1e-9


def test_cli_device_loop(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform", "cpu",
         "--npts", "32", "--n-iters", "30", "--max-iters", "4", "--device-loop",
         "--quiet", "--out-dir", str(tmp_path / "dl")],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    import json as _json

    s = _json.loads(open(tmp_path / "dl" / "summary.json").read())
    assert s["driver"].startswith("device-resident")
    assert s["iterations"] >= 1


def test_critical_seed_example(tmp_path):
    """The bisection example runs end-to-end on CPU at small config."""
    env = dict(os.environ,
               PYTHONPATH="/root/.axon_site:/root/repo",
               JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "examples/sh23_critical_seed.py", "--platform", "cpu",
         "--npts", "48", "--t-final", "10", "--bisections", "3",
         "--max-iters", "20"],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "critical_seed_energy" in out.stdout


def test_cli_device_loop_mixing_aux(tmp_path):
    """Mixing under --device-loop exercises the aux-operand path (the
    operator stacks enter the driver jit as arguments, not constants)."""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "mixing",
         "--platform", "cpu", "--nx", "32", "--nz", "16", "--n-iters", "20",
         "--max-iters", "2", "--device-loop", "--quiet",
         "--out-dir", str(tmp_path / "mdl")],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    import json as _json

    s = _json.loads(open(tmp_path / "mdl" / "summary.json").read())
    assert s["driver"].startswith("device-resident")
    assert np.isfinite(s["J_final"])


def test_cli_method_validation():
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "mixing",
         "--platform", "cpu", "--method", "pallas"],
        capture_output=True, text=True, timeout=120, env=env, cwd="/root/repo",
    )
    assert out.returncode != 0
    assert "not supported for mixing" in out.stdout + out.stderr


def test_batch_sweep_example(tmp_path):
    """The vmapped batch-sweep example runs end-to-end on CPU."""
    env = dict(os.environ,
               PYTHONPATH="/root/.axon_site:/root/repo",
               JAX_PLATFORM_NAME="cpu", SMO_SWEEP_TINY="1")
    out = subprocess.run(
        [sys.executable, "examples/sh23_batch_sweep.py", "2"],
        capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "throughput gain" in out.stdout


def test_cli_mixing_adjoint_and_s_wiring():
    """`run mixing --adjoint continuous` must actually construct a
    continuous-adjoint problem (was silently dropped before r3), and
    --s 0 selects the KE objective."""
    from spheremanopt_tpu.run import build_parser, make_problem

    a = build_parser().parse_args(
        ["mixing", "--adjoint", "continuous", "--nx", "32", "--nz", "16",
         "--n-iters", "20"])
    p, _, _ = make_problem(a)
    assert p.cfg.adjoint == "continuous"
    a0 = build_parser().parse_args(["mixing", "--s", "0", "--nx", "32",
                                    "--nz", "16", "--n-iters", "20"])
    p0, _, _ = make_problem(a0)
    assert p0.cfg.s == 0 and p0.cfg.adjoint == "discrete"


def test_roofline_cost_models():
    """The bench's roofline accounting (utils/profiling.py): achieved
    rates scale inversely with time, % peaks are consistent with the
    published v5e numbers, and the per-problem models return positive
    dominant-term counts."""
    from spheremanopt_tpu.utils import profiling as prof

    f, b = prof.sh23_cost_model(256, 1000)
    assert f > 0 and b > 0
    r1 = prof.roofline(10.0, f, b)
    r2 = prof.roofline(20.0, f, b)
    assert abs(r1["achieved_hbm_gbps"] - 2 * r2["achieved_hbm_gbps"]) < 0.2
    assert r1["pct_peak_hbm"] == round(
        100.0 * r1["achieved_hbm_gbps"] / prof.V5E_HBM_GBPS, 1)
    for fn, args in ((prof.shb23_cost_model, (512, 2000)),
                     (prof.kdyn_cost_model, (24, 2000)),
                     (prof.mixing_cost_model, (256, 128, 1000))):
        fl, by = fn(*args)
        assert fl > 0 and by > 0


def test_mixing_sharded_example(tmp_path):
    """The sharded mixing example (the reference's second distributed
    workload) runs end-to-end on the virtual mesh."""
    env = dict(os.environ,
               PYTHONPATH="/root/.axon_site:/root/repo",
               JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "examples/mixing_sharded_optimisation.py",
         "--platform", "cpu", "--iters", "3"],
        capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "final_sharding" in out.stdout and "'x': 8" in out.stdout


def test_float64_config_without_x64_raises():
    """A float64 problem config constructed in a process with jax x64
    disabled must fail LOUDLY (problems.base.check_x64) — jnp would
    otherwise silently truncate every operator stack and scan carry to
    f32 under a config labelled float64 (self-review r3)."""
    import jax

    from spheremanopt_tpu.problems.swift_hohenberg import (SH23Config,
                                                           SwiftHohenberg)

    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="x64"):
            SwiftHohenberg(SH23Config(npts=32, n_iters=4))
        # f32 configs stay constructible without x64
        SwiftHohenberg(SH23Config(npts=32, n_iters=4, dtype="float32"))
    finally:
        jax.config.update("jax_enable_x64", True)


def test_testgrad_exact_linear_gradient_zero_remainder():
    """J(x) = <c, x>: the second Taylor remainder is exactly 0.0 at every
    eps. fit_orders previously produced inf/nan orders (log of a zero
    ratio) and the gammas went nan — a CORRECT gradient reported as a
    failure (self-review r3). Exact-zero rows are now excluded and the
    all-underflowed gamma falls back to the expected order."""
    from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test

    # integer data + power-of-two eps: every float op is exact, so the
    # linear Taylor remainder really is bitwise 0.0
    c = np.array([1.0, 2.0, 3.0, 4.0])
    f = lambda xs: float(np.dot(c, np.asarray(xs[0])))
    g = lambda xs: [c]
    ip = lambda a, b: float(np.dot(np.asarray(a), np.asarray(b)))
    x0 = [np.arange(4.0)]
    dx0 = [np.ones(4)]
    r = adjoint_gradient_test(x0, dx0, f, g, ip, epsilon=2.0 ** -13,
                              verbose=False)
    assert (r.remainder2 == 0.0).all()
    assert np.isfinite(r.gamma1) and np.isfinite(r.gamma2)
    assert r.gamma2 == 2.0       # all-zero remainder2 -> expected order


def test_cli_archive_full_alone_archives(tmp_path):
    """--archive-full without --archive-every previously archived
    NOTHING (default 0 disabled the whole block); it now implies
    --archive-every 1."""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--npts", "32", "--n-iters", "20", "--max-iters", "2",
         "--archive-full", "--quiet", "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-800:]
    archives = list((tmp_path / "run").glob("diag_iter_*.npz"))
    assert archives, sorted(os.listdir(tmp_path / "run"))


def test_cli_testgrad_continuous_criterion(tmp_path):
    """--test-grad --adjoint continuous: the pass criterion must consult
    the gradient (r2 << r1), not just the gradient-free gamma1."""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--npts", "32", "--n-iters", "40", "--adjoint", "continuous",
         "--test-grad", "--quiet", "--out-dir", str(tmp_path / "tgc")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stdout + out.stderr[-500:]
    assert "PASSED" in out.stdout


def test_config_switch_typos_fail_loudly():
    """Unrecognised method/adjoint/transform/cost strings previously
    selected a silent fallback path (e.g. SH23 method='matmull' ran the
    fft path; adjoint='Continuous' ran discrete gradients with the
    discrete inner product) — all four problems now validate."""
    from spheremanopt_tpu.problems.optimal_mixing import (MixingConfig,
                                                          OptimalMixing)
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config, SwiftHohenbergBounded)

    with pytest.raises(ValueError, match="method"):
        SwiftHohenberg(SH23Config(npts=32, n_iters=4, method="matmull"))
    with pytest.raises(ValueError, match="adjoint"):
        SwiftHohenberg(SH23Config(npts=32, n_iters=4, adjoint="Continuous"))
    with pytest.raises(ValueError, match="method"):
        SwiftHohenbergBounded(SHB23Config(npts=32, n_iters=4, method="fft"))
    with pytest.raises(ValueError, match="cost"):
        KinematicDynamo(KDynConfig(npts=8, n_iters=4, cost="final"))
    with pytest.raises(ValueError, match="adjoint"):
        OptimalMixing(MixingConfig(nx=16, nz=12, n_iters=4,
                                   adjoint="Discrete"))


def test_cli_kdyn_2d_pencil_mesh(tmp_path):
    """--mesh-shape PX,PY runs the kdyn optimisation on the 2-D pencil
    distributed transform (8 virtual devices)."""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "kdyn", "--platform",
         "cpu", "--npts", "16", "--dt", "1e-3", "--n-iters", "5",
         "--max-iters", "2", "--mesh-shape", "2,4", "--quiet",
         "--out-dir", str(tmp_path / "k2d")],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-800:]
    import json as _json

    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    s = _json.loads(line)
    assert s["config"]["mesh_shape"] == [2, 4]
    assert s["iterations"] == 2 and np.isfinite(s["J_final"])
