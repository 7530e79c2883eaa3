"""h5 export shim: a reference user's h5py post-processing must read
the rebuild's exports using ONLY dataset names from the reference
source (`Sphere_Grad_Descent.py:823-826` DAL_PROGRESS fields;
`plot_figure_SH23_FULL.py:38-42` scales/sim_time + tasks/<name>)."""

import json
import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

from spheremanopt_tpu import optimise_on_multi_sphere
from spheremanopt_tpu.io.h5compat import (
    export_run_h5, load_dal_progress_h5, save_dal_progress_h5,
    save_scalar_series_h5)
from spheremanopt_tpu.problems.swift_hohenberg import (SH23Config,
                                                       SwiftHohenberg)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    p = SwiftHohenberg(SH23Config(npts=32, n_iters=20, dt=0.05, e0=0.0725))
    x0 = p.generate_ic(seed=3)
    res = optimise_on_multi_sphere(
        x0, p.radii, p.objective, p.gradient, p.inner_product,
        max_iters=3, alpha_k=np.pi, f_and_g=p.objective_and_gradient,
        verbose=False)
    return p, res


def test_dal_progress_reference_reader(run, tmp_path):
    """The exact reads the reference's restart path performs
    (`FWD_Solve_SH23.py:789-794`) work on the export."""
    p, res = run
    path = save_dal_progress_h5(str(tmp_path / "DAL_PROGRESS.h5"), res)
    with h5py.File(path, "r") as DAL_file:
        RESIDUAL = DAL_file["Residual"][()]
        FUNCT = DAL_file["Function_Value"][()]
        X_0 = DAL_file["X_opt"][0]
        iters = int(DAL_file["Iterations"][()])
        for name in ("N", "Function_Evals", "Gradient_Evals", "Step_Size"):
            assert name in DAL_file
    assert RESIDUAL.shape == (1, res.iterations)
    assert FUNCT.shape == (res.iterations,)
    np.testing.assert_allclose(FUNCT, np.asarray(res.function_values))
    np.testing.assert_allclose(X_0, np.asarray(res.x_opt[0]))
    assert iters == res.iterations
    # round-trip helper
    d = load_dal_progress_h5(path)
    assert set(d) >= {"Residual", "Function_Value", "X_opt"}


def test_scalar_series_reference_reader(run, tmp_path):
    """The exact reads the reference's plot scripts perform
    (`plot_figure_SH23_FULL.py:38-42`)."""
    p, res = run
    diag = p.diagnostics(res.x_opt)
    path = save_scalar_series_h5(
        str(tmp_path / "scalar_data_s1.h5"), diag["sim_time"],
        {"Kinetic energy": np.asarray(diag["kinetic_energy"])})
    with h5py.File(path, "r") as file:
        time = file["scales/sim_time"][:]
        BE = file["tasks/Kinetic energy"][:, 0]
    assert time.shape == BE.shape
    np.testing.assert_allclose(BE, np.asarray(diag["kinetic_energy"]))


def test_export_run_h5_full_set(run, tmp_path):
    p, res = run
    diag = p.diagnostics(res.x_opt)
    paths = export_run_h5(str(tmp_path), "sh23", res, diag)
    assert set(paths) == {"dal", "scalar", "checkpoints"}
    with h5py.File(paths["scalar"], "r") as f:
        assert "tasks/Kinetic energy" in f
    with h5py.File(paths["checkpoints"], "r") as f:
        names = list(f["tasks"].keys())
        assert "u_final" in names
        # snapshot tasks carry the Dedalus leading write dimension
        assert f["tasks/u_final"].shape[0] == 1


def test_cli_h5_flag(tmp_path):
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--npts", "32", "--n-iters", "20", "--max-iters", "2",
         "--h5", "--quiet", "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    dal = tmp_path / "run" / "DAL_PROGRESS.h5"
    sca = tmp_path / "run" / "scalar_data_s1.h5"
    assert dal.exists() and sca.exists()
    with h5py.File(dal, "r") as f:
        assert "Function_Value" in f and "X_opt" in f
    with h5py.File(sca, "r") as f:
        assert f["tasks/Kinetic energy"].shape[1] == 1


def test_cli_h5_flag_device_loop(tmp_path):
    """--h5 must also export from the single-jit device loop (the flag
    used to be silently ignored on that branch): the adapted
    JitOptResult writes the reference dataset names with histories
    truncated to the iterations taken."""
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--npts", "32", "--n-iters", "20", "--max-iters", "2",
         "--device-loop", "--h5", "--quiet",
         "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    dal = tmp_path / "run" / "DAL_PROGRESS.h5"
    assert dal.exists()
    with h5py.File(dal, "r") as f:
        k = int(f["Iterations"][()])
        assert k >= 1
        assert f["Function_Value"].shape == (k,)
        assert f["Step_Size"].shape == (k,)
        assert f["Residual"].shape[1] == k


def test_resume_from_reference_dal_progress(tmp_path):
    """load_progress_any must read a DAL_PROGRESS.h5 written the way the
    REFERENCE writes it — one dataset per vars(R) item
    (`Sphere_Grad_Descent.py:823-826`) with X_opt as the stacked
    component list its resume indexes as `X_opt[0]`
    (`FWD_Solve_SH23.py:789-794`)."""
    from spheremanopt_tpu.io.checkpoint import load_progress_any

    rng = np.random.RandomState(7)
    x = [rng.rand(32), rng.rand(32)]
    ref_vars = {
        "N": 2,
        "X_opt": np.stack(x),
        "Iterations": 5,
        "Function_Evals": 11,
        "Gradient_Evals": 6,
        "Residual": np.asarray([[0.5, 0.4, 0.3, 0.2, 0.1]] * 2),
        "Step_Size": np.asarray([1.0, 0.5, 0.5, 0.25, 0.25]),
        "Function_Value": np.asarray([1.0, 0.9, 0.8, 0.7, 0.6]),
    }
    path = str(tmp_path / "DAL_PROGRESS.h5")
    with h5py.File(path, "w") as f:  # the reference's exact write loop
        for k, v in ref_vars.items():
            f.create_dataset(k, data=v)
    R = load_progress_any(path)
    assert R.n_components == 2 and R.iterations == 5
    assert R.function_evals == 11 and R.gradient_evals == 6
    np.testing.assert_array_equal(R.x_opt[0], x[0])
    np.testing.assert_array_equal(R.x_opt[1], x[1])
    assert R.residuals[1][-1] == pytest.approx(0.1)
    assert R.function_values[-1] == pytest.approx(0.6)


def test_resume_roundtrip_own_h5(run, tmp_path):
    """Our own --h5 export resumes through the same loader."""
    from spheremanopt_tpu.io.checkpoint import load_progress_any

    _, res = run
    path = save_dal_progress_h5(str(tmp_path / "DAL_PROGRESS.h5"), res)
    R = load_progress_any(path)
    assert R.iterations == res.iterations
    for a, b in zip(R.x_opt, res.x_opt):
        np.testing.assert_allclose(a, np.asarray(b))


def test_cli_resume_from_h5(tmp_path):
    """End-to-end: --resume pointed at a reference-format h5 warm-starts
    the run (the import half of the h5 migration shim)."""
    p = SwiftHohenberg(SH23Config(npts=32, n_iters=20, dt=0.05, e0=0.0725))
    x0 = np.asarray(p.generate_ic(seed=3)[0])
    path = str(tmp_path / "DAL_PROGRESS.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("N", data=1)
        f.create_dataset("X_opt", data=x0[None])
        f.create_dataset("Iterations", data=4)
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--npts", "32", "--n-iters", "20", "--max-iters", "1",
         "--resume", path, "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "warm-starting from iteration 4" in out.stdout


def test_resume_ragged_components_h5(tmp_path):
    """Unequal-size spheres export as X_opt_{i} datasets (the reference's
    stacked write would fail there); the loader must reassemble them in
    order."""
    from spheremanopt_tpu.io.checkpoint import load_progress_any
    from spheremanopt_tpu.optim.optimiser import OptimiseResult

    R = OptimiseResult(n_components=2)
    R.iterations = 2
    rng = np.random.RandomState(11)
    R.x_opt = [rng.rand(16), rng.rand(24)]
    R.residuals = [[0.3, 0.2], [0.4, 0.1]]
    R.step_sizes = [1.0, 0.5]
    R.function_values = [0.8, 0.9]
    path = save_dal_progress_h5(str(tmp_path / "ragged.h5"), R)
    with h5py.File(path, "r") as f:
        assert "X_opt_0" in f and "X_opt_1" in f and "X_opt" not in f
    L = load_progress_any(path)
    assert [x.shape for x in L.x_opt] == [(16,), (24,)]
    np.testing.assert_array_equal(L.x_opt[1], R.x_opt[1])
    assert L.iterations == 2


def test_cli_resume_from_h5_with_regrid(tmp_path):
    """The full migration + continuation story: an EXISTING reference
    study (reference-format DAL_PROGRESS.h5 at the coarse resolution)
    continues here at DOUBLE the resolution via --resume <h5> --regrid
    (h5 import shim + utils/regrid in one CLI flow)."""
    p = SwiftHohenberg(SH23Config(npts=32, n_iters=20, dt=0.05, e0=0.0725))
    x0 = np.asarray(p.generate_ic(seed=3)[0])
    path = str(tmp_path / "DAL_PROGRESS.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("N", data=1)
        f.create_dataset("X_opt", data=x0[None])
        f.create_dataset("Iterations", data=4)
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23", "--platform",
         "cpu", "--dtype", "float64", "--npts", "64", "--n-iters", "20",
         "--max-iters", "1", "--resume", path, "--regrid",
         "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "warm-starting from iteration 4" in out.stdout
    assert "[resume] regridded" in out.stdout
    # x0 was saved at npts=32 (grid 64); the fine run's grid is 128
    assert "(64,)] -> [(128,)]" in out.stdout, out.stdout[-2000:]
