"""Swift-Hohenberg (periodic Fourier) end-to-end tests.

Follows the reference's verification protocol: Taylor-remainder adjoint
test wired to the problem triple (`FWD_Solve_SH23.py:772-779`), physics
sanity of the SBDF1 integration, and a short optimisation run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test
from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg


@pytest.fixture(scope="module")
def small():
    return SwiftHohenberg(SH23Config(npts=64, n_iters=60, dt=0.05, e0=0.0725))


def test_ic_on_sphere(small):
    x0 = small.generate_ic(seed=42)
    assert np.isclose(float(small.inner_product(x0[0], x0[0])), small.cfg.e0, rtol=1e-12)
    # IC is band-limited: half the modes are filtered then smoothed
    c = small.basis.to_coeff(x0[0])
    assert float(jnp.abs(c[-10:]).max()) < 1e-3 * float(jnp.abs(c).max())


def test_taylor_remainder_orders(small):
    """Discrete adjoint must hit O(eps) and O(eps^2)
    (`TestGrad.py:94-95`, acceptance: exponents ~1 and ~2)."""
    x0 = small.generate_ic(seed=42, e0=1.0)
    dx0 = small.generate_ic(seed=7, e0=1.0)
    r = adjoint_gradient_test(
        x0, dx0, small.objective, small.gradient, small.inner_product,
        epsilon=1e-3, verbose=False,
    )
    assert abs(r.gamma1 - 1.0) < 0.05, r.gamma1
    assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2


def test_linear_decay_rate_matches_spectrum():
    """With the nonlinearity ineffective (tiny amplitude), each mode decays
    like exp SBDF1 factor 1/(1 + dt*L_k): checks the implicit operator
    L_k = (1-k^2)^2 - a against the discrete update."""
    cfg = SH23Config(npts=64, n_iters=1, dt=0.05, e0=1e-20)
    p = SwiftHohenberg(cfg)
    x = jnp.asarray(p.basis.grid())
    k_test = 3
    amp = 1e-10  # linear regime
    u0 = amp * jnp.cos(k_test * 2 * np.pi / cfg.length * p.basis.n * x / p.basis.n)
    # simpler: mode k with wavenumber kk = 2*pi*k/L using exact grid
    kk = 2 * np.pi * k_test / cfg.length
    u0 = amp * jnp.cos(kk * x)
    c0 = p.basis.to_coeff(u0)
    c1 = p._sbdf1_step(c0)
    L = (1 - kk ** 2) ** 2 - cfg.a
    expected = 1.0 / (1.0 + cfg.dt * L)
    ratio = float(jnp.abs(c1[k_test]) / jnp.abs(c0[k_test]))
    np.testing.assert_allclose(ratio, expected, rtol=1e-8)


def test_objective_negated_and_finite(small):
    x0 = small.generate_ic(seed=42)
    J = float(small.objective(x0))
    assert J < 0.0  # returns -J with J = int |u|^2 > 0
    assert np.isfinite(J)


def test_remat_matches_storeall():
    cfg_r = SH23Config(npts=32, n_iters=40, remat=True)
    cfg_s = SH23Config(npts=32, n_iters=40, remat=False)
    pr, ps = SwiftHohenberg(cfg_r), SwiftHohenberg(cfg_s)
    x0 = pr.generate_ic(seed=1)
    np.testing.assert_allclose(float(pr.objective(x0)), float(ps.objective(x0)), rtol=1e-14)
    gr, gs = pr.gradient(x0), ps.gradient(x0)
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gs[0]), rtol=1e-12)


def test_short_optimisation_increases_J(small):
    """A few optimiser iterations must increase the reported J
    (maximisation; `function_values` holds -objective = +J)."""
    x0 = small.generate_ic(seed=42)
    res = optimise_on_multi_sphere(
        x0, small.radii, small.objective, small.gradient, small.inner_product,
        max_iters=4, alpha_k=np.pi, line_search="wolfe", cg=True, verbose=False,
    )
    assert res.iterations >= 1
    assert res.function_values[-1] > res.function_values[0] or res.iterations == 1
    # sphere constraint held
    xo = res.x_opt[0]
    assert np.isclose(float(small.inner_product(xo, xo)), small.cfg.e0, rtol=1e-10)


def test_continuous_mode_objective_and_gradient_dispatch():
    """Under adjoint='continuous', `objective_and_gradient` must serve
    the continuous gradient (= `gradient()`), not the discrete autodiff
    one — Wolfe's fused-phi path consumes f_and_g and must not mix the
    two gradient definitions in one line search (self-review r3). Same
    dispatch on the fused-diagnostics form."""
    p = SwiftHohenberg(SH23Config(npts=64, n_iters=30, dt=0.05,
                                  adjoint="continuous"))
    x0 = p.generate_ic(seed=4)
    g_ref = np.asarray(p.gradient(x0)[0])
    g_disc = np.asarray(p._gradient(list(x0))[0])
    assert not np.allclose(g_ref, g_disc)
    J_f, g_f = p.objective_and_gradient(x0)
    assert float(J_f) == float(p.objective(x0))
    np.testing.assert_array_equal(np.asarray(g_f[0]), g_ref)
    J_d, g_fd, _ = p.objective_gradient_and_diagnostics(x0)
    np.testing.assert_array_equal(np.asarray(g_fd[0]), g_ref)
