"""Device-resident RTR (`optim/jit_rtr.py`): the whole trust-region
optimisation — fused gradient+tCG+trial steps, rho acceptance, radius
updates, early exit — in one jitted executable.

Correctness bar: iterate-for-iterate parity with the host driver
(`optim/rtr.py`) in f64, row-exactness under vmap (to reduction-order
ULPs), zero-padded histories past convergence, dynamic-radius operands,
the aux operand path, and the CLI wire.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.optim.jit_rtr import jit_optimise_rtr
from spheremanopt_tpu.optim.rtr import optimise_rtr
from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix


@pytest.fixture(scope="module")
def pca():
    return PCAProblem(random_spd_matrix(64, seed=3))


@pytest.fixture(scope="module")
def sh23():
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config,
        SwiftHohenberg,
    )

    return SwiftHohenberg(SH23Config(npts=64, n_iters=60, dt=0.05))


def _x0(dim=64, seed=7):
    return [jnp.asarray(np.random.RandomState(seed).rand(dim))]


def test_device_rtr_matches_host_pca_bitwise(pca):
    """Same decision ladder, same arithmetic, same dtype: the f64
    device loop must reproduce the host driver's trajectory exactly."""
    rh = optimise_rtr(_x0(), [1.0], pca.objective, pca.gradient,
                      pca.inner_product, err_tol=1e-8, max_iters=100,
                      verbose=False)
    opt = jit_optimise_rtr(pca.objective, pca.gradient, pca.inner_product,
                           [1.0], err_tol=1e-8, max_iters=100)
    rd = opt(_x0())
    k = int(rd.iterations)
    assert k == rh.iterations
    assert bool(rd.converged) == rh.converged
    assert int(rd.hvp_evals) == rh.hvp_evals
    np.testing.assert_array_equal(np.asarray(rd.function_values[:k]),
                                  np.asarray(rh.function_values))
    np.testing.assert_array_equal(np.asarray(rd.step_sizes[:k]),
                                  np.asarray(rh.step_sizes))
    np.testing.assert_array_equal(np.asarray(rd.residuals[:k, 0]),
                                  np.asarray(rh.residuals[0]))
    np.testing.assert_array_equal(np.asarray(rd.x_opt[0]),
                                  np.asarray(rh.x_opt[0]))


def test_device_rtr_matches_host_sh23(sh23):
    """PDE problem (scan forward + autodiff adjoint + linearized HVPs),
    including a rejected trust-region trial on this config — the
    accept/reject and radius sequences must agree with the host."""
    x0 = sh23.generate_ic(42)
    rh = optimise_rtr(x0, sh23.radii, sh23.objective, sh23.gradient,
                      sh23.inner_product, err_tol=1e-6, max_iters=100,
                      verbose=False)
    assert "rejected" in rh.message  # the config exercises a reject
    opt = jit_optimise_rtr(sh23.objective, sh23.gradient,
                           sh23.inner_product, sh23.radii,
                           err_tol=1e-6, max_iters=100)
    rd = opt(x0)
    k = int(rd.iterations)
    assert k == rh.iterations
    assert bool(rd.converged) == rh.converged
    np.testing.assert_array_equal(np.asarray(rd.function_values[:k]),
                                  np.asarray(rh.function_values))
    np.testing.assert_array_equal(np.asarray(rd.x_opt[0]),
                                  np.asarray(rh.x_opt[0]))
    # trials = accepted + rejected + the final converged-check step
    assert int(rd.trials) == rh.iterations + 1 + rh.message.count("rejected")


def test_device_rtr_history_padding_and_counts(sh23):
    """Histories are zero past the last accepted iterate; the early
    exit stops the loop at the converged trial (trials << max_trials
    bound)."""
    x0 = sh23.generate_ic(42)
    opt = jit_optimise_rtr(sh23.objective, sh23.gradient,
                           sh23.inner_product, sh23.radii,
                           err_tol=1e-6, max_iters=100)
    rd = opt(x0)
    k = int(rd.iterations)
    assert 0 < k < 100
    assert int(rd.trials) < 2 * 100 + 64
    assert np.all(np.asarray(rd.function_values[k:]) == 0.0)
    assert np.all(np.asarray(rd.residuals[k:]) == 0.0)
    assert np.all(np.asarray(rd.step_sizes[k:]) == 0.0)


def test_device_rtr_vmap_row_exactness(sh23):
    """A batched family of RTR optimisations must make the same
    decisions per row as the unbatched driver: identical iteration/
    trial counts and trajectories to reduction-order ULPs (batched
    contractions re-order sums, so bitwise is not achievable)."""
    opt = jit_optimise_rtr(sh23.objective, sh23.gradient,
                           sh23.inner_product, sh23.radii,
                           err_tol=1e-6, max_iters=100)
    seeds = [1, 2, 42]
    x0s = [sh23.generate_ic(s)[0] for s in seeds]
    rb = jax.vmap(lambda x: opt([x]))(jnp.stack(x0s))
    for i, s in enumerate(seeds):
        r1 = opt([x0s[i]])
        assert int(r1.iterations) == int(rb.iterations[i]), s
        assert int(r1.trials) == int(rb.trials[i]), s
        assert bool(r1.converged) == bool(rb.converged[i]), s
        np.testing.assert_allclose(np.asarray(rb.function_values[i]),
                                   np.asarray(r1.function_values),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(rb.x_opt[0][i]),
                                   np.asarray(r1.x_opt[0]),
                                   rtol=1e-12, atol=1e-14)


def test_device_rtr_radii_dyn(pca):
    """One compiled executable serves a sweep of constraint levels: the
    traced-radius operand must reproduce the host driver run at that
    radius (delta0/delta_max matched to the dyn driver's [1.0]-derived
    defaults: dmax=2, d0=0.25) iterate-for-iterate. At r=0.5 the run
    hits the pred-below-roundoff floor short of err_tol — both drivers
    must agree on THAT decision too."""
    opt_dyn = jit_optimise_rtr(pca.objective, pca.gradient,
                               pca.inner_product, [1.0],
                               err_tol=1e-8, max_iters=100)
    for r, conv_expected in ((0.5, False), (2.0, True)):
        rd = opt_dyn(_x0(), radii_dyn=jnp.asarray([r]))
        rh = optimise_rtr(_x0(), [r], pca.objective, pca.gradient,
                          pca.inner_product, err_tol=1e-8, max_iters=100,
                          delta0=0.25, delta_max=2.0, verbose=False)
        kd = int(rd.iterations)
        assert kd == rh.iterations, r
        assert bool(rd.converged) == rh.converged == conv_expected, r
        np.testing.assert_array_equal(np.asarray(rd.function_values[:kd]),
                                      np.asarray(rh.function_values))
        np.testing.assert_array_equal(np.asarray(rd.x_opt[0]),
                                      np.asarray(rh.x_opt[0]))


def test_device_rtr_aux_operand_path(pca):
    """With aux, f/grad_f are called as f(aux, xs): the operand-passed
    matrix must give the identical trajectory as the closed-over one."""
    m = np.asarray(pca.m)

    def f_aux(a, xs):
        return -0.5 * xs[0] @ (a @ xs[0])

    def g_aux(a, xs):
        return [-(a @ xs[0])]

    opt_aux = jit_optimise_rtr(f_aux, g_aux, pca.inner_product, [1.0],
                               err_tol=1e-8, max_iters=100)
    opt = jit_optimise_rtr(pca.objective, pca.gradient, pca.inner_product,
                           [1.0], err_tol=1e-8, max_iters=100)
    ra = opt_aux(_x0(), aux=jnp.asarray(m))
    r0 = opt(_x0())
    assert int(ra.iterations) == int(r0.iterations)
    np.testing.assert_allclose(np.asarray(ra.function_values),
                               np.asarray(r0.function_values),
                               rtol=1e-12, atol=1e-14)


def test_cli_rtr_device_loop(tmp_path):
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23",
         "--platform", "cpu", "--npts", "32", "--n-iters", "30",
         "--max-iters", "6", "--direction", "rtr", "--device-loop",
         "--quiet", "--out-dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads((tmp_path / "run" / "summary.json").read_text())
    assert summary["iterations"] >= 1
    assert "converged" in summary and "trust_region_trials" in summary
    assert summary["J_final"] is not None


def test_device_rtr_matches_host_on_mixing_aux_pde():
    """PDE problem whose operator stacks enter the driver jit as aux
    OPERANDS (run.py's --direction rtr --device-loop branch derives the
    split f/grad callables from `objective_and_gradient_aux`; closing
    over the stacks would embed them in the program body — CLAUDE.md
    platform rule 1). The f64 device trajectory must equal the host
    driver's exactly — this is the path an on-chip mixing RTR workload
    takes."""
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    p = OptimalMixing(MixingConfig(nx=32, nz=16, n_iters=40, dt=1e-2,
                                   prep_steps=10, solve_precision="high"))
    x0 = p.generate_ic(seed=0)
    rh = optimise_rtr(x0, p.radii, p.objective, p.gradient,
                      p.inner_product, err_tol=1e-6, max_iters=12,
                      verbose=False)
    fg_aux, aux = p.objective_and_gradient_aux
    assert aux is not None
    f_rtr = lambda a, xs: fg_aux(a, xs)[0]   # noqa: E731
    g_rtr = lambda a, xs: fg_aux(a, xs)[1]   # noqa: E731
    opt = jit_optimise_rtr(f_rtr, g_rtr, p.inner_product, p.radii,
                           err_tol=1e-6, max_iters=12)
    rd = opt(x0, aux=aux)
    k = int(rd.iterations)
    assert k == rh.iterations
    assert bool(rd.converged) == rh.converged
    np.testing.assert_array_equal(np.asarray(rd.function_values[:k]),
                                  np.asarray(rh.function_values))
    for xd, xh in zip(rd.x_opt, rh.x_opt):
        np.testing.assert_array_equal(np.asarray(xd), np.asarray(xh))


def test_tight_max_trials_still_runs_the_cap_pass(pca):
    """A user-supplied max_trials that runs out exactly as k reaches
    max_iters must not skip the final check-only convergence pass the
    host driver always performs (ADVICE r4: the `t < hi` cond clipped
    it). The cap pass is exempt from the trial bound — trajectories
    stay host-parity even under the tightest budget that admits
    max_iters accepts."""
    x0 = _x0()
    mi = 6
    rh = optimise_rtr(x0, [1.0], pca.objective, pca.gradient,
                      pca.inner_product, err_tol=1e-6, max_iters=mi,
                      verbose=False)
    assert rh.iterations == mi            # cap-terminated run
    # PCA accepts every trial here: max_trials == max_iters is the
    # tightest budget that reaches the cap; the check pass is trial
    # mi + 1 and must still run
    opt = jit_optimise_rtr(pca.objective, pca.gradient,
                           pca.inner_product, [1.0],
                           err_tol=1e-6, max_iters=mi, max_trials=mi)
    rd = opt(x0)
    k = int(rd.iterations)
    assert k == mi
    assert int(rd.trials) == mi + 1       # the exempt cap pass ran
    assert bool(rd.converged) == rh.converged
    np.testing.assert_array_equal(np.asarray(rd.function_values[:k]),
                                  np.asarray(rh.function_values))


def test_rho_max_model_breakdown_guard_host_device_parity():
    """rho_max rejects trials whose ACTUAL decrease is orders beyond
    the quadratic model's prediction — the cliff case measured on the
    KDyn 24^3 workload, where plain rho-acceptance steps into the CNAB1
    CFL-instability region (the discrete objective is unbounded below
    through it; the reference's Wolfe curvature condition implicitly
    regularises). Synthetic cliff: a smooth sphere objective with a
    catastrophic well away from the start. With rho_max the drivers
    must avoid the cliff value and stay host/device parity; without it
    the cliff is (correctly, per classic TR) accepted."""
    import jax

    n = 32
    rng = np.random.RandomState(5)
    M = rng.rand(n, n)
    M = 0.1 * (M + M.T)
    c = rng.rand(n)
    c /= np.linalg.norm(c)
    Mj, cj = jnp.asarray(M), jnp.asarray(c)

    def f(xs):
        x = xs[0]
        smooth = x @ Mj @ x
        # cliff: a deep narrow well around +-c (depth 1e6, width ~0.1)
        d2 = jnp.sum((x - cj) ** 2)
        return smooth - 1e6 * jnp.exp(-d2 / 0.01)

    grad_f = lambda xs: [jax.grad(lambda x: f([x]))(xs[0])]      # noqa: E731

    x0 = [jnp.asarray(rng.rand(n))]
    kw = dict(err_tol=1e-8, max_iters=25)
    rh = optimise_rtr(x0, [1.0], f, grad_f, lambda a, b: jnp.dot(a, b),
                      rho_max=100.0, verbose=False, **kw)
    opt = jit_optimise_rtr(f, grad_f, lambda a, b: jnp.dot(a, b), [1.0],
                           rho_max=100.0, **kw)
    rd = opt(x0)
    k = int(rd.iterations)
    assert k == rh.iterations
    np.testing.assert_array_equal(np.asarray(rd.function_values[:k]),
                                  np.asarray(rh.function_values))
    # the guarded run stays on the smooth branch (never the -1e6 well)
    assert rh.function_values[-1] < 1e3, rh.function_values[-1]
