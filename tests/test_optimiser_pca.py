"""Optimiser integration test: PCA vs numpy.linalg.eigh.

Mirrors the reference's analytic ground-truth check
(`Example_Problems/PCA_example.py:123-146`): the optimiser on the unit
sphere must recover the leading eigenvector for both SD+Armijo and
CG+Wolfe configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix


@pytest.fixture(scope="module")
def problem():
    m = random_spd_matrix(64, seed=3)
    return PCAProblem(m)


def _x0(dim=64):
    return [jnp.asarray(np.random.RandomState(7).rand(dim))]


@pytest.mark.parametrize(
    "ls,cg", [("armijo", False), ("wolfe", True), ("armijo", True)]
)
def test_pca_recovers_leading_eigenvector(problem, ls, cg):
    res = optimise_on_multi_sphere(
        _x0(),
        [1.0],
        problem.objective,
        problem.gradient,
        problem.inner_product,
        err_tol=1e-8,
        max_iters=2000,
        line_search=ls,
        cg=cg,
        verbose=False,
    )
    v = problem.ground_truth()
    x = np.asarray(res.x_opt[0])
    err = np.linalg.norm(np.abs(v) - np.abs(x))
    assert err < 1e-4, f"eigvector error {err} (ls={ls}, cg={cg})"
    # J should equal -(1/2) lambda_max at the optimum; recorded negated.
    lam = np.linalg.eigvalsh(np.asarray(problem.m)).max()
    assert np.isclose(res.function_values[-1], 0.5 * lam, rtol=1e-6)


def test_wolfe_sd_amax_failure_terminates_gracefully(problem):
    """Wolfe + steepest descent can hit amax when the curvature condition
    needs steps beyond alpha_max; the driver must return partial results
    (reference early-return semantics, `Sphere_Grad_Descent.py:791-793`)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = optimise_on_multi_sphere(
            _x0(), [1.0], problem.objective, problem.gradient,
            problem.inner_product, err_tol=1e-8, max_iters=200,
            line_search="wolfe", cg=False, verbose=False,
        )
    # Either converged, or terminated early with consistent bookkeeping.
    assert res.x_opt is not None
    assert len(res.function_values) == res.iterations
    assert np.isclose(float(jnp.dot(res.x_opt[0], res.x_opt[0])), 1.0, rtol=1e-10)


def test_cg_converges_faster_than_sd(problem):
    kwargs = dict(err_tol=1e-7, max_iters=3000, verbose=False)
    res_sd = optimise_on_multi_sphere(
        _x0(), [1.0], problem.objective, problem.gradient, problem.inner_product,
        line_search="armijo", cg=False, **kwargs,
    )
    res_cg = optimise_on_multi_sphere(
        _x0(), [1.0], problem.objective, problem.gradient, problem.inner_product,
        line_search="wolfe", cg=True, **kwargs,
    )
    assert res_cg.iterations <= res_sd.iterations


def test_residuals_monotone_trend_and_bookkeeping(problem):
    res = optimise_on_multi_sphere(
        _x0(), [1.0], problem.objective, problem.gradient, problem.inner_product,
        err_tol=1e-8, max_iters=500, line_search="wolfe", cg=True, verbose=False,
    )
    assert res.iterations == len(res.step_sizes)
    assert res.iterations == len(res.function_values)
    assert res.iterations == len(res.residuals[0])
    assert res.function_evals >= res.iterations
    # constraint maintained through every update
    assert np.isclose(float(jnp.dot(res.x_opt[0], res.x_opt[0])), 1.0, rtol=1e-10)
    # residual decreased by several orders of magnitude overall
    assert res.residuals[0][-1] < 1e-3 * res.residuals[0][0] or res.converged


def test_progress_checkpoint_roundtrip(problem, tmp_path):
    path = str(tmp_path / "progress.npz")
    res = optimise_on_multi_sphere(
        _x0(), [1.0], problem.objective, problem.gradient, problem.inner_product,
        err_tol=1e-6, max_iters=50, line_search="wolfe", cg=True, verbose=False,
        checkpoint_path=path,
    )
    from spheremanopt_tpu.io.checkpoint import load_progress

    loaded = load_progress(path)
    assert loaded.iterations == res.iterations
    np.testing.assert_allclose(loaded.function_values, res.function_values)
    np.testing.assert_allclose(np.asarray(loaded.x_opt[0]), np.asarray(res.x_opt[0]))

    # Warm-start from the checkpoint: should converge (almost) immediately.
    res2 = optimise_on_multi_sphere(
        [jnp.asarray(loaded.x_opt[0])], [1.0],
        problem.objective, problem.gradient, problem.inner_product,
        err_tol=1e-5, max_iters=50, line_search="wolfe", cg=True, verbose=False,
    )
    assert res2.iterations <= res.iterations


def test_two_sphere_product_manifold(problem):
    """Two independent PCA components solved jointly on a product of spheres
    (exercises the multi-sphere code paths the dynamo problem relies on)."""
    m2 = random_spd_matrix(32, seed=11)
    p2 = PCAProblem(m2)

    def f(xs):
        return problem.objective([xs[0]]) + p2.objective([xs[1]])

    def g(xs):
        return [problem.gradient([xs[0]])[0], p2.gradient([xs[1]])[0]]

    x0 = [
        jnp.asarray(np.random.RandomState(1).rand(64)),
        jnp.asarray(np.random.RandomState(2).rand(32)),
    ]
    res = optimise_on_multi_sphere(
        x0, [1.0, 1.0], f, g, problem.inner_product,
        err_tol=1e-7, max_iters=3000, line_search="wolfe", cg=True, verbose=False,
    )
    e1 = np.linalg.norm(np.abs(problem.ground_truth()) - np.abs(np.asarray(res.x_opt[0])))
    e2 = np.linalg.norm(np.abs(p2.ground_truth()) - np.abs(np.asarray(res.x_opt[1])))
    assert e1 < 1e-3 and e2 < 1e-3, (e1, e2)


def test_zero_initial_vector_degrades_gracefully(problem):
    """Zero X0 normalises to NaN (reference behavior: no guard) and the
    optimiser must exit without hanging, returning a structured partial
    result rather than raising."""
    res = optimise_on_multi_sphere(
        [jnp.zeros(64)], [1.0], problem.objective, problem.gradient,
        problem.inner_product, max_iters=5, verbose=False)
    assert res.iterations == 0
    assert not res.converged


def test_mismatched_radii_raises(problem):
    with pytest.raises((IndexError, ValueError)):
        optimise_on_multi_sphere(
            _x0(), [1.0, 2.0], problem.objective, problem.gradient,
            problem.inner_product, max_iters=2, verbose=False)
