"""Line-search parity vs scipy.

The reference's scalar searches are modified copies of
scipy.optimize.linesearch (acknowledged at `Sphere_Grad_Descent.py:12-17`).
Our implementations are independent rewrites of the same Nocedal-Wright
algorithms; on scalar test functions they must accept steps satisfying
identical conditions and (for well-behaved functions) find the same
alpha as scipy to high accuracy."""

import math
import warnings

import numpy as np
import pytest

from spheremanopt_tpu.optim import linesearch as ls

scipy_ls = pytest.importorskip("scipy.optimize._linesearch")


CASES = [
    # (phi, derphi, phi0, derphi0) — scalar minimisation test functions
    (lambda a: (a - 1.7) ** 2, lambda a: 2 * (a - 1.7)),
    (lambda a: -a * math.exp(-a), lambda a: (a - 1) * math.exp(-a)),
    (lambda a: math.cos(a) + 0.1 * a, lambda a: -math.sin(a) + 0.1),
    (lambda a: a ** 4 - 3 * a ** 2 + a, lambda a: 4 * a ** 3 - 6 * a + 1),
]


@pytest.mark.parametrize("phi,dphi", CASES)
@pytest.mark.parametrize("c2", [0.4, 0.9])
def test_wolfe_matches_scipy(phi, dphi, c2):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = ls.wolfe_search(phi, dphi, phi0=phi(0.0), old_phi0=None,
                               derphi0=dphi(0.0), c1=1e-4, c2=c2)
        a_sp, phi_sp, _, d_sp = scipy_ls.scalar_search_wolfe2(
            phi, dphi, phi0=phi(0.0), derphi0=dphi(0.0), c1=1e-4, c2=c2
        )
    if a_sp is None:
        return  # scipy failed; nothing to compare
    assert ours.alpha is not None
    # both satisfy strong Wolfe at their own alphas
    for a in (ours.alpha, a_sp):
        assert phi(a) <= phi(0.0) + 1e-4 * a * dphi(0.0) + 1e-12
        assert abs(dphi(a)) <= -c2 * dphi(0.0) + 1e-12
    # identical algorithm -> identical accepted step
    np.testing.assert_allclose(ours.alpha, a_sp, rtol=1e-10)
    np.testing.assert_allclose(ours.phi_star, phi_sp, rtol=1e-10)


@pytest.mark.parametrize("phi,dphi", CASES)
def test_armijo_matches_scipy(phi, dphi):
    ours_a, ours_phi, _ = ls.armijo_search(phi, phi(0.0), dphi(0.0), alpha0=1.0)
    sp_a, sp_phi = scipy_ls.scalar_search_armijo(
        phi, phi(0.0), dphi(0.0), c1=1e-4, alpha0=1.0
    )
    if sp_a is None:
        return
    assert ours_a is not None
    assert phi(ours_a) <= phi(0.0) + 1e-4 * ours_a * dphi(0.0) + 1e-12
    np.testing.assert_allclose(ours_a, sp_a, rtol=1e-10)
    np.testing.assert_allclose(ours_phi, sp_phi, rtol=1e-10)


def test_wolfe_amax_semantics():
    """The reference caps alpha at alpha_max (its initial alpha_k) and
    fails cleanly when the curvature condition needs a longer step."""
    phi = lambda a: -a            # unbounded descent
    dphi = lambda a: -1.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = ls.wolfe_search(phi, dphi, phi0=0.0, old_phi0=None, derphi0=-1.0,
                            amax=2.0)
    assert r.alpha is None or r.derphi_star is None

def test_nonfinite_objective_terminates_with_best_so_far():
    """A runaway Wolfe trial returning NaN must not be recorded into the
    histories: scipy-style Wolfe 'accepts' it (NaN comparisons are all
    False) and the reference would log the NaN; the driver treats it as
    a failed search and early-returns the best-so-far iterate (observed
    live: mixing continuous-adjoint full config, iteration 9, alpha=97).
    """
    import warnings

    import jax.numpy as jnp

    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere

    calls = {"n": 0}

    def f(xs):
        calls["n"] += 1
        if calls["n"] > 4:
            return float("nan")
        return -float(np.asarray(xs[0])[0])

    def g(xs):
        return [np.asarray([-1.0, 0.0, 0.0])]

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = optimise_on_multi_sphere(
            [np.asarray([0.1, 0.7, 0.7])], [1.0], f, g,
            lambda a, b: jnp.sum(a * b), max_iters=10, alpha_k=1.0,
            line_search="wolfe", cg=True, verbose=False)
    assert "non-finite" in r.message
    assert all(np.isfinite(v) for v in r.function_values)
    assert np.isfinite(np.asarray(r.x_opt[0])).all()


def test_armijo_overflowed_first_trial_fails_not_zero_step():
    """armijo_search with phi(alpha0) = inf: the quadratic interpolant is
    +-0.0 and phi(0.0) == phi0 would satisfy the Armijo test with a ZERO
    step — the search must fail loudly instead (self-review r3)."""
    import warnings

    from spheremanopt_tpu.optim.linesearch import (LineSearchWarning,
                                                   armijo_search)

    calls = []

    def phi(a):
        calls.append(a)
        return float("inf") if a > 1e-12 else 0.0

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LineSearchWarning)
        alpha, phi_star, n_ev = armijo_search(phi, 0.0, -1.0, alpha0=1.0)
    assert alpha is None
    assert all(a > 1e-12 for a in calls)   # never evaluated the zero step
