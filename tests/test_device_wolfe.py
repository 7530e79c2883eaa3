"""Device-resident strong-Wolfe / interpolated-Armijo line searches.

The device state machines (`optim/device_wolfe.py`) must reproduce the
host searches (`optim/linesearch.py`, = the scipy-derived algorithms the
reference embeds, `Sphere_Grad_Descent.py:66-613`) evaluation-for-
evaluation — verified per-call on scalar objectives and end-to-end as
full optimisation-trajectory parity on a PDE problem.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.optim import linesearch as ls
from spheremanopt_tpu.optim.device_wolfe import device_armijo, device_wolfe
from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg

SCALAR_CASES = [
    # (phi, derphi, old_phi0, amax) — covering first-trial accept, zoom
    # via cubic/quad/bisection, derphi>=0 flip, amax-capped failure
    (lambda a: (a - 2.0) ** 2, lambda a: 2 * (a - 2.0), None, 10.0),
    (lambda a: (a - 2.0) ** 2, lambda a: 2 * (a - 2.0), 4.5, 10.0),
    (lambda a: a ** 4 - 3 * a ** 2 + 0.5 * a,
     lambda a: 4 * a ** 3 - 6 * a + 0.5, None, 8.0),
    (lambda a: -a / (a * a + 1.0),
     lambda a: (a * a - 1.0) / (a * a + 1.0) ** 2, -0.3, 50.0),
    (lambda a: -a, lambda a: -1.0 + 0 * a, None, 2.0),
    (lambda a: (a - 0.01) ** 2 - 1e-4, lambda a: 2 * (a - 0.01), None, 3.0),
    (lambda a: jnp.exp(-a) + 0.05 * a,
     lambda a: -jnp.exp(-a) + 0.05, 1.2, 20.0),
]


@pytest.mark.parametrize("case", range(len(SCALAR_CASES)))
def test_device_wolfe_matches_host_scalar(case):
    f, df, old, amax = SCALAR_CASES[case]
    phi0, derphi0 = float(f(0.0)), float(df(0.0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = ls.wolfe_search(lambda a: float(f(a)), lambda a: float(df(a)),
                            phi0=phi0, old_phi0=old, derphi0=derphi0,
                            c1=1e-4, c2=0.4, amax=amax)

    def ev(a):
        return f(a), df(a), (a,)

    a_d, p_d, _aux, ok = jax.jit(
        lambda: device_wolfe(ev, phi0, derphi0, (jnp.asarray(0.0),),
                             old if old is not None else 0.0,
                             old is not None, c1=1e-4, c2=0.4, amax=amax))()
    if w.alpha is None:
        assert not bool(ok)
    else:
        assert bool(ok)
        assert abs(float(a_d) - w.alpha) < 1e-12, (float(a_d), w.alpha)
        assert abs(float(p_d) - w.phi_star) < 1e-12


@pytest.mark.parametrize("alpha0", [0.3, 1.0, 3.0, 40.0])
def test_device_armijo_matches_host_scalar(alpha0):
    f = lambda a: (a - 0.17) ** 2
    df = lambda a: 2 * (a - 0.17)
    phi0, derphi0 = float(f(0.0)), float(df(0.0))
    a_h, p_h, _n = ls.armijo_search(lambda a: float(f(a)), phi0, derphi0,
                                    alpha0=alpha0)

    def ev(a):
        return f(a), df(a), (a,)

    a_d, p_d, _aux, ok = jax.jit(
        lambda: device_armijo(ev, phi0, derphi0, (jnp.asarray(0.0),),
                              alpha0=alpha0, c1=1e-4))()
    if a_h is None:
        assert not bool(ok)
    else:
        assert bool(ok)
        assert abs(float(a_d) - a_h) < 1e-12, (float(a_d), a_h)


def test_wolfe_driver_trajectory_parity_sh23():
    """Full device Wolfe+CG optimisation == host driver trajectory on a
    PDE problem, to float64 roundoff (VERDICT round-1 item 6)."""
    p = SwiftHohenberg(SH23Config(npts=48, n_iters=50, dt=0.05))
    x0 = p.generate_ic(seed=42)
    res_h = optimise_on_multi_sphere(
        x0, p.radii, p.objective, p.gradient, p.inner_product,
        max_iters=8, alpha_k=float(np.pi), line_search="wolfe", cg=True,
        verbose=False, f_and_g=p.objective_and_gradient)
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=8, alpha0=float(np.pi), cg=True, line_search="wolfe")
    r = opt(x0)

    jh = np.asarray(res_h.function_values)
    jd = np.asarray(r.function_values[: len(jh)])
    np.testing.assert_allclose(jd, jh, rtol=1e-12, atol=1e-14)
    ah = np.asarray(res_h.step_sizes)
    ad = np.asarray(r.step_sizes[: len(ah)])
    np.testing.assert_allclose(ad, ah, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r.x_opt[0]),
                               np.asarray(res_h.x_opt[0]),
                               rtol=1e-10, atol=1e-12)


def test_wolfe_driver_converges_pca():
    pca = PCAProblem(random_spd_matrix(48, seed=3))

    def f_and_g(xs):
        return pca._objective_impl(xs), pca._gradient_impl(xs)

    opt = jit_optimise_on_multi_sphere(
        f_and_g, pca.inner_product, [1.0],
        max_iters=400, alpha0=1.0, cg=True, err_tol=1e-9,
        line_search="wolfe")
    x0 = [jnp.asarray(np.random.RandomState(7).rand(48))]
    res = opt(x0)
    v = pca.ground_truth()
    err = np.linalg.norm(np.abs(v) - np.abs(np.asarray(res.x_opt[0])))
    assert err < 1e-5, err
    assert np.isclose(float(jnp.dot(res.x_opt[0], res.x_opt[0])), 1.0,
                      rtol=1e-12)


def test_wolfe_driver_trajectory_parity_shb23():
    """Device Wolfe+CG == host trajectory on the bounded Chebyshev
    problem (completes device-driver coverage of all PDE problems)."""
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config, SwiftHohenbergBounded)

    p = SwiftHohenbergBounded(SHB23Config(npts=64, n_iters=40, dt=0.01))
    x0 = p.generate_ic(seed=4)
    res_h = optimise_on_multi_sphere(
        x0, p.radii, p.objective, p.gradient, p.inner_product,
        max_iters=6, alpha_k=1.0, line_search="wolfe", cg=True,
        verbose=False, f_and_g=p.objective_and_gradient)
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=6, alpha0=1.0, cg=True, line_search="wolfe")
    r = opt(x0)
    jh = np.asarray(res_h.function_values)
    np.testing.assert_allclose(np.asarray(r.function_values[: len(jh)]),
                               jh, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(r.step_sizes[: len(jh)]),
                               np.asarray(res_h.step_sizes),
                               rtol=1e-10, atol=1e-12)


def test_wolfe_driver_trajectory_parity_mixing():
    """Device Wolfe+CG == host trajectory on the Boussinesq mixing
    problem (s=1 mix-norm minimisation)."""
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    p = OptimalMixing(MixingConfig(nx=32, nz=16, n_iters=20,
                                   prep_steps=5, s=1))
    x0 = p.generate_ic(seed=3)
    res_h = optimise_on_multi_sphere(
        x0, p.radii, p.objective, p.gradient, p.inner_product,
        max_iters=5, alpha_k=10.0, line_search="wolfe", cg=True,
        verbose=False, f_and_g=p.objective_and_gradient)
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=5, alpha0=10.0, cg=True, line_search="wolfe")
    r = opt(x0)
    jh = np.asarray(res_h.function_values)
    np.testing.assert_allclose(np.asarray(r.function_values[: len(jh)]),
                               jh, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(r.step_sizes[: len(jh)]),
                               np.asarray(res_h.step_sizes),
                               rtol=1e-10, atol=1e-12)


def test_wolfe_driver_aux_operands_match_closure():
    """Passing the operator stacks as jit OPERANDS (aux=...) must give
    the identical trajectory to the closure form — the aux path is how
    large-operator problems (mixing) run under the device driver without
    embedding the stacks as program constants."""
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    p = OptimalMixing(MixingConfig(nx=32, nz=16, n_iters=20,
                                   prep_steps=5, s=1))
    x0 = p.generate_ic(seed=3)
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=4, alpha0=10.0, cg=True, line_search="wolfe")
    r_closure = opt(x0)
    fg, ops = p.objective_and_gradient_aux
    opt_aux = jit_optimise_on_multi_sphere(
        fg, p.inner_product, p.radii,
        max_iters=4, alpha0=10.0, cg=True, line_search="wolfe")
    r_aux = opt_aux(x0, aux=ops)
    np.testing.assert_array_equal(np.asarray(r_aux.function_values),
                                  np.asarray(r_closure.function_values))
    np.testing.assert_array_equal(np.asarray(r_aux.step_sizes),
                                  np.asarray(r_closure.step_sizes))


def test_device_wolfe_maxiter_exhaustion_matches_host():
    """Bracket maxiter exhaustion: the host evaluates one further doubled
    trial and returns it unchecked (linesearch.py:264-272); the device
    search must return the SAME alpha/phi (self-review r3 — it previously
    accepted the maxiter-th trial, one doubling short)."""
    f = lambda a: -a                      # never satisfies curvature
    df = lambda a: -1.0 + 0 * a
    amax = 1e7
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = ls.wolfe_search(lambda a: float(f(a)), lambda a: float(df(a)),
                            phi0=0.0, derphi0=-1.0, c1=1e-4, c2=0.4,
                            amax=amax)
    assert w.alpha is not None and w.derphi_star is None

    def ev(a):
        return f(a), df(a), (a,)

    a_d, p_d, _aux, ok = jax.jit(
        lambda: device_wolfe(ev, 0.0, -1.0, (jnp.asarray(0.0),),
                             0.0, False, c1=1e-4, c2=0.4, amax=amax))()
    assert bool(ok)
    assert abs(float(a_d) - w.alpha) < 1e-12, (float(a_d), w.alpha)
    assert abs(float(p_d) - w.phi_star) < 1e-12


@pytest.mark.parametrize("bad", [jnp.nan, jnp.inf])
def test_device_wolfe_nonfinite_trial_fails_not_hangs(bad):
    """A non-finite phi trial must terminate the jitted while_loop with
    ok=False (self-review r3: NaN comparisons are all-False, which
    previously cycled the bracket forever on NaN or accepted garbage on
    maxiter exhaustion)."""
    def ev(a):
        phi = jnp.where(a > 0.5, jnp.asarray(bad), -a)
        return phi, -1.0 + 0 * a, (a,)

    a_d, p_d, _aux, ok = jax.jit(
        lambda: device_wolfe(ev, 0.0, -1.0, (jnp.asarray(0.0),),
                             0.0, False, c1=1e-4, c2=0.4, amax=100.0))()
    assert not bool(ok)


def test_device_wolfe_recovers_from_inf_overflow_like_host():
    """An overflowed (+inf) bracket trial is RECOVERABLE: the host enters
    zoom (inf fails sufficient decrease) and its interpolant guards
    bisect back into the finite region where a Wolfe point exists. The
    device search previously fail-fasted on any non-finite trial,
    silently terminating optimisations the host continues (code-review
    r3); it must now take the host's transitions and find the same
    point. NaN still fails fast (test above)."""
    f_ = lambda a: jnp.where(a > 1.6, jnp.inf, (a - 2.0) ** 2)
    df_ = lambda a: jnp.where(a > 1.6, jnp.inf, 2.0 * (a - 2.0))
    phi0, derphi0 = 4.0, -4.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = ls.wolfe_search(lambda a: float(f_(a)), lambda a: float(df_(a)),
                            phi0=phi0, derphi0=derphi0, c1=1e-4, c2=0.4,
                            amax=50.0)
    assert w.alpha is not None  # the HOST recovers from the overflow

    def ev(a):
        return f_(a), df_(a), (a,)

    a_d, p_d, _aux, ok = jax.jit(
        lambda: device_wolfe(ev, phi0, derphi0, (jnp.asarray(0.0),),
                             0.0, False, c1=1e-4, c2=0.4, amax=50.0))()
    assert bool(ok)
    assert abs(float(a_d) - w.alpha) < 1e-12, (float(a_d), w.alpha)
    assert abs(float(p_d) - w.phi_star) < 1e-12


@pytest.mark.parametrize("bad", [jnp.nan, jnp.inf])
def test_device_armijo_nonfinite_trial_fails_not_hangs(bad):
    """device_armijo on a non-finite first trial: the quadratic
    interpolates to +-0.0/NaN; the search must FAIL (not hang, and not
    'succeed' with a zero step whose phi(0) == phi0)."""
    def ev(a):
        phi = jnp.where(a > 1e-12, jnp.asarray(bad), 0.0)
        return phi, jnp.zeros(()), (a,)

    a_d, p_d, _aux, ok = jax.jit(
        lambda: device_armijo(ev, 0.0, -1.0, (jnp.asarray(0.0),),
                              alpha0=1.0))()
    assert not bool(ok)
