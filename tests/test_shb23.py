"""Bounded Swift-Hohenberg (Chebyshev tau) end-to-end tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test
from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
    SHB23Config,
    SwiftHohenbergBounded,
)


@pytest.fixture(scope="module")
def small():
    return SwiftHohenbergBounded(SHB23Config(npts=128, n_iters=80))


@pytest.fixture(scope="module")
def x0(small):
    return small.generate_ic(seed=42)


def test_tau_solver_residual(small):
    assert small._resid < 1e-9


def test_ic_on_sphere(small, x0):
    assert np.isclose(float(small.inner_product(x0[0], x0[0])), small.cfg.m0, rtol=1e-12)


def test_boundary_conditions_enforced(small, x0):
    u = jnp.asarray(x0[0])
    for _ in range(10):
        u = small._step(u)
    a = small.basis.analysis @ np.asarray(u)
    b = small.basis
    scale = np.abs(np.asarray(u)).max()
    assert abs(float(b.boundary_row("left", 1) @ a)) < 1e-8 * max(scale, 1)
    assert abs(float(b.boundary_row("right", 0) @ a)) < 1e-10 * max(scale, 1)
    assert abs(float(b.boundary_row("right", 2) @ a)) < 1e-7 * max(scale, 1)


def test_taylor_remainder_orders(small, x0):
    dx0 = small.generate_ic(seed=3)
    r = adjoint_gradient_test(
        x0, dx0, small.objective, small.gradient, small.inner_product,
        epsilon=1e-4, verbose=False,
    )
    assert abs(r.gamma1 - 1.0) < 0.05, r.gamma1
    assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2


def test_linear_decay_without_forcing(small):
    """For tiny amplitudes (a = -0.1 < 0, subcritical) the solution must
    decay: the operator (1+dz^2)^2 - a with these BCs is stable."""
    u0 = 1e-8 * jnp.asarray(np.exp(-small.basis.grid ** 2 / 4.0))
    u = u0
    for _ in range(80):
        u = small._step(u)
    assert float(small._energy(u)) < float(small._energy(u0))


def test_short_optimisation_improves_J(small, x0):
    res = optimise_on_multi_sphere(
        x0, small.radii, small.objective, small.gradient, small.inner_product,
        max_iters=3, line_search="wolfe", cg=True, verbose=False,
        f_and_g=small.objective_and_gradient,
    )
    assert res.iterations >= 1
    assert res.function_values[-1] >= res.function_values[0] - 1e-12
    xo = res.x_opt[0]
    assert np.isclose(float(small.inner_product(xo, xo)), small.cfg.m0, rtol=1e-10)


def test_remat_matches_storeall(x0):
    pr = SwiftHohenbergBounded(SHB23Config(npts=128, n_iters=50, remat=True))
    ps = SwiftHohenbergBounded(SHB23Config(npts=128, n_iters=50, remat=False))
    np.testing.assert_allclose(float(pr.objective(x0)), float(ps.objective(x0)), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(pr.gradient(x0)[0]), np.asarray(ps.gradient(x0)[0]), rtol=1e-11
    )


def test_continuous_mode_objective_and_gradient_dispatch():
    """adjoint='continuous' must flow through objective_and_gradient
    (see tests/test_sh23.py twin; self-review r3)."""
    p = SwiftHohenbergBounded(SHB23Config(npts=64, n_iters=40, dt=0.01,
                                          adjoint="continuous"))
    x0 = p.generate_ic(seed=4)
    g_ref = np.asarray(p.gradient(x0)[0])
    assert not np.allclose(g_ref, np.asarray(p._gradient(list(x0))[0]))
    J_f, g_f = p.objective_and_gradient(x0)
    assert float(J_f) == float(p.objective(x0))
    np.testing.assert_array_equal(np.asarray(g_f[0]), g_ref)
