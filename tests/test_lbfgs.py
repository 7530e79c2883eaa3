"""Riemannian L-BFGS direction (`method="lbfgs"`) — a capability beyond
the reference optimiser (`Sphere_Grad_Descent.py` implements only SD and
hybrid FR/PR CG, :750-776).

Checks: analytic ground-truth recovery (PCA vs eigh, the reference's own
optimiser acceptance test `PCA_example.py:123-146`), solve-count wins
over CG on both PCA and a PDE problem, product-manifold support, the
curvature-skip safeguard, and argument validation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix


@pytest.fixture(scope="module")
def problem():
    return PCAProblem(random_spd_matrix(64, seed=3))


def _x0(dim=64, seed=7):
    return [jnp.asarray(np.random.RandomState(seed).rand(dim))]


def _run(p, x0, radii, method, ls="wolfe", mem=8, alpha=10.0, **kw):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return optimise_on_multi_sphere(
            x0, radii, p.objective, p.gradient, p.inner_product,
            err_tol=kw.pop("err_tol", 1e-8), max_iters=kw.pop("max_iters", 3000),
            line_search=ls, method=method, lbfgs_memory=mem, alpha_k=alpha,
            verbose=False, **kw)


def test_lbfgs_recovers_leading_eigenvector(problem):
    res = _run(problem, _x0(), [1.0], "lbfgs")
    v = problem.ground_truth()
    err = np.linalg.norm(np.abs(v) - np.abs(np.asarray(res.x_opt[0])))
    assert err < 1e-4, err
    lam = np.linalg.eigvalsh(np.asarray(problem.m)).max()
    assert np.isclose(res.function_values[-1], 0.5 * lam, rtol=1e-6)
    # constraint maintained through every two-loop direction + retraction
    assert np.isclose(float(jnp.dot(res.x_opt[0], res.x_opt[0])), 1.0,
                      rtol=1e-10)


def test_lbfgs_beats_cg_on_total_solves(problem):
    """The motivating property: each f/grad eval is a full PDE solve in
    production, so fewer total evaluations at the same optimum is the
    win. Measured: m=20 L-BFGS ~59+55 vs CG ~120+90 on this problem."""
    r_cg = _run(problem, _x0(), [1.0], "cg")
    r_lb = _run(problem, _x0(), [1.0], "lbfgs", mem=20)
    cost_cg = r_cg.function_evals + r_cg.gradient_evals
    cost_lb = r_lb.function_evals + r_lb.gradient_evals
    assert cost_lb < cost_cg, (cost_lb, cost_cg)
    # both at the same optimum
    lam = np.linalg.eigvalsh(np.asarray(problem.m)).max()
    for r in (r_cg, r_lb):
        assert np.isclose(r.function_values[-1], 0.5 * lam, rtol=1e-5)


def test_lbfgs_sh23_matches_cg_optimum_with_fewer_solves():
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config,
        SwiftHohenberg,
    )

    p = SwiftHohenberg(SH23Config(npts=64, n_iters=60, dt=0.05))
    x0 = p.generate_ic(42)
    kw = dict(err_tol=1e-6, max_iters=100, alpha=3.14159,
              f_and_g=p.objective_and_gradient)
    r_cg = _run(p, x0, p.radii, "cg", **kw)
    r_lb = _run(p, x0, p.radii, "lbfgs", **kw)
    assert np.isclose(r_lb.function_values[-1], r_cg.function_values[-1],
                      rtol=1e-5)
    assert (r_lb.function_evals + r_lb.gradient_evals
            < r_cg.function_evals + r_cg.gradient_evals)


def test_lbfgs_armijo_converges_via_curvature_skip(problem):
    """Armijo guarantees decrease but not the curvature condition, so
    some pairs are skipped; the driver must still make progress (it
    degrades toward SD in the worst case, never diverges)."""
    res = _run(problem, _x0(), [1.0], "lbfgs", ls="armijo",
               err_tol=1e-6, max_iters=3000)
    v = problem.ground_truth()
    err = np.linalg.norm(np.abs(v) - np.abs(np.asarray(res.x_opt[0])))
    assert err < 1e-3, err


def test_lbfgs_two_sphere_product(problem):
    m2 = random_spd_matrix(32, seed=11)
    p2 = PCAProblem(m2)

    class Joint:
        def objective(self, xs):
            return problem.objective([xs[0]]) + p2.objective([xs[1]])

        def gradient(self, xs):
            return [problem.gradient([xs[0]])[0], p2.gradient([xs[1]])[0]]

        inner_product = staticmethod(problem.inner_product)

    x0 = [jnp.asarray(np.random.RandomState(1).rand(64)),
          jnp.asarray(np.random.RandomState(2).rand(32))]
    res = _run(Joint(), x0, [1.0, 1.0], "lbfgs", err_tol=1e-7)
    e1 = np.linalg.norm(np.abs(problem.ground_truth())
                        - np.abs(np.asarray(res.x_opt[0])))
    e2 = np.linalg.norm(np.abs(p2.ground_truth())
                        - np.abs(np.asarray(res.x_opt[1])))
    assert e1 < 1e-3 and e2 < 1e-3, (e1, e2)


def test_device_lbfgs_trajectory_parity_sh23():
    """Single-jit device L-BFGS == host L-BFGS trajectory on SH23 to
    f64 roundoff (same standard as the device Wolfe+CG parity tests,
    tests/test_device_wolfe.py)."""
    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config,
        SwiftHohenberg,
    )

    p = SwiftHohenberg(SH23Config(npts=48, n_iters=50, dt=0.05))
    x0 = p.generate_ic(seed=42)
    res_h = _run(p, x0, p.radii, "lbfgs", alpha=float(np.pi), max_iters=8,
                 f_and_g=p.objective_and_gradient)
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=8, alpha0=float(np.pi), line_search="wolfe",
        direction="lbfgs")
    r = opt(x0)
    jh = np.asarray(res_h.function_values)
    np.testing.assert_allclose(np.asarray(r.function_values[:len(jh)]), jh,
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(r.step_sizes[:len(jh)]),
                               np.asarray(res_h.step_sizes),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r.x_opt[0]),
                               np.asarray(res_h.x_opt[0]),
                               rtol=1e-10, atol=1e-12)


def test_device_lbfgs_converges_pca(problem):
    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere

    def f_and_g(xs):
        return problem._objective_impl(xs), problem._gradient_impl(xs)

    opt = jit_optimise_on_multi_sphere(
        f_and_g, problem.inner_product, [1.0],
        max_iters=200, alpha0=1.0, err_tol=1e-9,
        line_search="wolfe", direction="lbfgs")
    res = opt(_x0())
    v = problem.ground_truth()
    err = np.linalg.norm(np.abs(v) - np.abs(np.asarray(res.x_opt[0])))
    assert err < 1e-5, err
    assert np.isclose(float(jnp.dot(res.x_opt[0], res.x_opt[0])), 1.0,
                      rtol=1e-12)


def test_device_lbfgs_vmaps_row_exact():
    """The L-BFGS device driver composes with jax.vmap (the batched-
    sweep capability): every row of a vmapped multi-seed sweep equals
    its unbatched run."""
    import jax

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config,
        SwiftHohenberg,
    )

    p = SwiftHohenberg(SH23Config(npts=48, n_iters=50, dt=0.05))
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=5, alpha0=float(np.pi), line_search="wolfe",
        direction="lbfgs")
    seeds = [1, 2, 3]
    x0s = [p.generate_ic(s) for s in seeds]
    rb = jax.vmap(lambda x: opt([x]))(jnp.stack([x[0] for x in x0s]))
    for i in range(len(seeds)):
        r1 = opt(x0s[i])
        np.testing.assert_allclose(np.asarray(rb.function_values[i]),
                                   np.asarray(r1.function_values),
                                   rtol=1e-12, atol=1e-14)


def test_device_lbfgs_requires_wolfe(problem):
    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere

    with pytest.raises(ValueError, match="wolfe"):
        jit_optimise_on_multi_sphere(
            lambda xs: (problem._objective_impl(xs),
                        problem._gradient_impl(xs)),
            problem.inner_product, [1.0],
            line_search="armijo", direction="lbfgs")


def test_method_validation(problem):
    with pytest.raises(ValueError, match="method"):
        optimise_on_multi_sphere(
            _x0(), [1.0], problem.objective, problem.gradient,
            problem.inner_product, method="newton", max_iters=1,
            verbose=False)


def test_method_none_respects_legacy_cg_flag(problem):
    """method=None must reproduce the old cg=True/False behaviour
    exactly (same iterate trajectory)."""
    r_old = _run(problem, _x0(), [1.0], None, max_iters=25, cg=False)
    r_sd = _run(problem, _x0(), [1.0], "sd", max_iters=25)
    np.testing.assert_allclose(np.asarray(r_old.x_opt[0]),
                               np.asarray(r_sd.x_opt[0]))
    np.testing.assert_allclose(r_old.function_values, r_sd.function_values)
