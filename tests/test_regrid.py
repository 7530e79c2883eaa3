"""Spectral resolution continuation (utils/regrid): coarse->fine
warm-starting of studies. Correctness surface: (a) upsample->downsample
round trips to machine precision (the state is band-limited, so the
fine grid represents it exactly), (b) an analytic band-limited field
regrids to its DIRECT fine-grid samples, (c) states land exactly on
the spheres, (d) the CLI --resume --regrid flow runs end-to-end.

The reference restart requires matching resolution
(`FWD_Solve_SH23.py:787-800` reads X_opt back into the same domain);
this is the TPU build's coarse->fine continuation the reference lacks.
"""

import json
import os
import subprocess
import sys

import numpy as np

from spheremanopt_tpu.utils.regrid import regrid_state


def _renorm(p, x):
    return np.asarray(x, np.float64) * np.sqrt(
        p.radii[0] / float(p.inner_product(x, x)))


def test_sh23_roundtrip_and_sphere():
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    pc = SwiftHohenberg(SH23Config(npts=64, n_iters=4))
    pf = SwiftHohenberg(SH23Config(npts=128, n_iters=4))
    x = pc.generate_ic(seed=3)
    xu = regrid_state(pf, x)
    assert xu[0].shape == (pf.basis.n_grid,)
    assert np.isclose(float(pf.inner_product(xu[0], xu[0])),
                      pf.radii[0], rtol=1e-12)
    xd = regrid_state(pc, xu)
    xn = _renorm(pc, x[0])
    assert np.linalg.norm(xd[0] - xn) < 1e-12 * np.linalg.norm(xn)


def test_sh23_band_limited_function_preserved():
    """A field sampled on the coarse grid regrids to its DIRECT samples
    on the fine grid (same function, new quadrature points)."""
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    pc = SwiftHohenberg(SH23Config(npts=64, n_iters=4))
    pf = SwiftHohenberg(SH23Config(npts=256, n_iters=4))

    def f(xg):
        L = pc.cfg.length
        return (np.sin(2 * np.pi * 3 * xg / L)
                + 0.25 * np.cos(2 * np.pi * 11 * xg / L))

    xc = f(pc.basis.grid())
    xf_direct = f(pf.basis.grid())
    xu = regrid_state(pf, [xc], renormalise=False)
    assert np.allclose(xu[0], xf_direct, atol=1e-12)


def test_shb23_roundtrip_and_sphere():
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config, SwiftHohenbergBounded)

    pc = SwiftHohenbergBounded(SHB23Config(npts=64, n_iters=4))
    pf = SwiftHohenbergBounded(SHB23Config(npts=128, n_iters=4))
    x = pc.generate_ic(seed=3)
    xu = regrid_state(pf, x)
    assert xu[0].shape == (128,)
    assert np.isclose(float(pf.inner_product(xu[0], xu[0])),
                      pf.radii[0], rtol=1e-10)
    xd = regrid_state(pc, xu)
    xn = _renorm(pc, x[0])
    assert np.linalg.norm(xd[0] - xn) < 1e-10 * np.linalg.norm(xn)


def test_kdyn_roundtrip_both_spheres_and_divfree():
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)
    import jax.numpy as jnp

    pc = KinematicDynamo(KDynConfig(npts=8, n_iters=4, dtype="float64"))
    pf = KinematicDynamo(KDynConfig(npts=16, n_iters=4, dtype="float64"))
    x = pc.generate_ic(seed=3)
    xu = regrid_state(pf, x)
    for xi, r in zip(xu, pf.radii):
        assert xi.shape == (3, pf.mg, pf.mg, pf.mg)
        assert np.isclose(float(pf.inner_product(xi, xi)), r, rtol=1e-12)
        # solenoidality survives the regrid (pure mode-set injection)
        div = float(jnp.abs(jnp.sum(jnp.asarray(pf._k)
                                    * pf.to_coeff(jnp.asarray(xi)),
                                    axis=0)).max())
        assert div < 1e-12, div
    xd = regrid_state(pc, xu)
    for a, b in zip(xd, x):
        bn = np.asarray(b, np.float64)
        assert np.linalg.norm(a - bn) < 1e-12 * np.linalg.norm(bn)


def test_mixing_roundtrip_and_sphere():
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    pc = OptimalMixing(MixingConfig(nx=16, nz=8, n_iters=4, prep_steps=2))
    pf = OptimalMixing(MixingConfig(nx=32, nz=16, n_iters=4,
                                    prep_steps=2))
    x = pc.generate_ic(seed=3)
    xu = regrid_state(pf, x)
    assert xu[0].shape == (2, pf.mgx, pf.mgz)
    assert np.isclose(float(pf.inner_product(xu[0], xu[0])),
                      pf.radii[0], rtol=1e-10)
    xd = regrid_state(pc, xu)
    xn = _renorm(pc, x[0])
    assert np.linalg.norm(xd[0] - xn) < 1e-10 * np.linalg.norm(xn)


def test_kdyn_distributed_target():
    """Regrid a replicated fft-config state onto a DISTRIBUTED target:
    the output is the same replicated (c, mg, mg, mg) grid layout
    (shard_fields re-shards at optimiser entry), and the distributed
    objective at the regridded state matches the matmul objective at
    the equivalently-regridded state."""
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)

    p = KinematicDynamo(KDynConfig(npts=8, n_iters=4, dtype="float64",
                                   transform="fft"))
    x = p.generate_ic(seed=3)
    pd = KinematicDynamo(KDynConfig(npts=16, n_iters=4, dtype="float64",
                                    transform="distributed", n_shards=2))
    pm = KinematicDynamo(KDynConfig(npts=16, n_iters=4, dtype="float64",
                                    transform="fft"))
    xd = regrid_state(pd, x)
    xm = regrid_state(pm, x)
    assert pd.mg == pm.mg
    for a, b in zip(xd, xm):
        assert a.shape == (3, pd.mg, pd.mg, pd.mg)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-14)
    Jd = float(pd.objective(xd))
    Jm = float(pm.objective(xm))
    assert np.isclose(Jd, Jm, rtol=1e-10), (Jd, Jm)


def test_cli_resume_regrid_end_to_end(tmp_path):
    """Run a coarse SH23 study with a checkpoint, then continue it at
    double resolution via --resume <npz> --regrid."""
    env = dict(os.environ, PYTHONPATH="/root/repo",
               JAX_PLATFORM_NAME="cpu")
    base = [sys.executable, "-m", "spheremanopt_tpu.run", "sh23",
            "--platform", "cpu", "--dtype", "float64",
            "--npts", "32", "--n-iters", "20", "--max-iters", "2",
            "--out-dir", str(tmp_path / "coarse")]
    r = subprocess.run(base, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = os.path.join(str(tmp_path / "coarse"), "DAL_PROGRESS.npz")
    assert os.path.exists(ckpt)

    fine = [sys.executable, "-m", "spheremanopt_tpu.run", "sh23",
            "--platform", "cpu", "--dtype", "float64",
            "--npts", "64", "--n-iters", "20", "--max-iters", "1",
            "--resume", ckpt, "--regrid",
            "--out-dir", str(tmp_path / "fine")]
    r = subprocess.run(fine, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[resume] regridded" in r.stdout, r.stdout[-2000:]
    tail = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    summary = json.loads(tail[-1])
    assert summary["iterations"] >= 1

    # --regrid without --resume is a loud error
    r = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23",
         "--platform", "cpu", "--regrid", "--npts", "32",
         "--out-dir", str(tmp_path / "err")],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=600)
    assert r.returncode != 0
    assert "--regrid requires --resume" in (r.stderr + r.stdout)
