"""Fused Pallas two-matrix kernel: parity with the XLA scan paths
(interpret mode on CPU; the same kernel compiles for TPU via Mosaic —
measured 5.5 ms SH23 / 8.4 ms SHB23 fused fwd+grad at the reference
configs, vs 9.0 / 21.8 ms for the HBM-restreaming XLA scans)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.ops.pallas.fused_two_matrix import fused_objective
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg


@pytest.fixture(scope="module")
def setup():
    p = SwiftHohenberg(SH23Config(npts=64, n_iters=40, dtype="float32"))
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]
    return p, x0


def _sh23_args(p):
    a = jnp.asarray((p._M / p.cfg.dt).astype(np.float32))
    b = jnp.asarray(p._M.astype(np.float32))
    w = jnp.asarray(np.full(p.basis.n_grid, 1.0 / p.basis.n_grid, np.float32))
    return a, b, w


def test_objective_parity(setup):
    p, x0 = setup
    a, b, w = _sh23_args(p)
    u0 = jnp.dot(jnp.asarray(p._P.astype(np.float32)), x0[0])
    J_pl = float(fused_objective(a, b, w, u0, 1.8, -1.0, p.cfg.dt,
                                 p.cfg.n_iters, True))
    J_xla = float(p.objective(x0))
    assert abs(J_pl - J_xla) / abs(J_xla) < 1e-5


def test_custom_vjp_parity(setup):
    """grad through the kernel (trajectory-replay custom_vjp) must match
    autodiff of the XLA path."""
    p, x0 = setup
    a, b, w = _sh23_args(p)
    pmat = jnp.asarray(p._P.astype(np.float32))

    def obj(v):
        return fused_objective(a, b, w, jnp.dot(pmat, v), 1.8, -1.0,
                               p.cfg.dt, p.cfg.n_iters, True)

    g_pl = jax.grad(obj)(x0[0])
    g_xla = p.gradient(x0)[0] / p.basis.n_grid  # raw (un-Riesz) gradient
    rel = float(jnp.linalg.norm(g_pl - g_xla) / jnp.linalg.norm(g_xla))
    assert rel < 1e-5, rel


def test_trajectory_energies(setup):
    """The kernel's internal Euler-rule accumulation equals summing the
    diagnostics KE series."""
    p, x0 = setup
    a, b, w = _sh23_args(p)
    u0 = jnp.dot(jnp.asarray(p._P.astype(np.float32)), x0[0])
    J_pl = float(fused_objective(a, b, w, u0, 1.8, -1.0, p.cfg.dt,
                                 p.cfg.n_iters, True))
    ke = np.asarray(p.diagnostics(x0)["kinetic_energy"], np.float64)
    np.testing.assert_allclose(-J_pl, p.cfg.dt * ke.sum(), rtol=1e-5)


def test_custom_vjp_operator_cotangent(setup):
    """grad w.r.t. the step matrices must be the true operator
    sensitivity (sum of lambda (x) rhs outer products), not zero."""
    p, x0 = setup
    a, b, w = _sh23_args(p)
    u0 = jnp.dot(jnp.asarray(p._P.astype(np.float32)), x0[0])
    db = jax.grad(lambda b: fused_objective(a, b, w, u0, 1.8, -1.0,
                                            p.cfg.dt, 20, True))(b)
    assert float(jnp.abs(db).max()) > 0.0
    v = jnp.asarray(np.random.RandomState(0).randn(*np.shape(b)).astype(np.float32))
    v = v / jnp.linalg.norm(v)
    eps = 1e-3
    Jp = fused_objective(a, b + eps * v, w, u0, 1.8, -1.0, p.cfg.dt, 20, True)
    Jm = fused_objective(a, b - eps * v, w, u0, 1.8, -1.0, p.cfg.dt, 20, True)
    fd = (float(Jp) - float(Jm)) / (2 * eps)
    ad = float(jnp.sum(db * v))
    assert abs(fd - ad) < 5e-3 * max(abs(fd), 1e-6), (fd, ad)


def test_method_pallas_problem_integration():
    """SH23Config(method='pallas') wires the fused kernel through the
    standard problem API (objective/gradient/objective_and_gradient)."""
    pp = SwiftHohenberg(SH23Config(npts=64, n_iters=40, dtype="float32",
                                   method="pallas"))
    pm = SwiftHohenberg(SH23Config(npts=64, n_iters=40, dtype="float32",
                                   method="matmul"))
    x0 = [jnp.asarray(np.asarray(pm.generate_ic(seed=42)[0]), jnp.float32)]
    np.testing.assert_allclose(float(pp.objective(x0)), float(pm.objective(x0)),
                               rtol=1e-5)
    gp, gm = pp.gradient(x0)[0], pm.gradient(x0)[0]
    assert float(jnp.linalg.norm(gp - gm) / jnp.linalg.norm(gm)) < 1e-4
    Jf, gf = pp.objective_and_gradient(x0)
    np.testing.assert_allclose(float(Jf), float(pp.objective(x0)), rtol=1e-6)


def test_two_matrix_kernel_shb23_parity():
    """Generalised fused kernel (interpret) matches the SHB23 XLA path
    for objective + gradient, and op_grads=True matches FD for dA."""
    from spheremanopt_tpu.ops.pallas.fused_two_matrix import fused_objective
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config,
        SwiftHohenbergBounded,
    )

    pp = SwiftHohenbergBounded(SHB23Config(npts=96, n_iters=40,
                                           dtype="float32", method="pallas"))
    pm = SwiftHohenbergBounded(SHB23Config(npts=96, n_iters=40,
                                           dtype="float32", method="matmul"))
    x0 = [jnp.asarray(np.asarray(pm.generate_ic(seed=42)[0]), jnp.float32)]
    np.testing.assert_allclose(float(pp.objective(x0)), float(pm.objective(x0)),
                               rtol=1e-5)
    gp, gm = pp.gradient(x0)[0], pm.gradient(x0)[0]
    assert float(jnp.linalg.norm(gp - gm) / jnp.linalg.norm(gm)) < 1e-4

    # operator cotangent: FD directional check
    a = jnp.asarray(pm._A_lin.astype(np.float32))
    b = jnp.asarray(pm._A_nl.astype(np.float32))
    w = jnp.asarray(np.asarray(pm._w, np.float32))
    u0 = x0[0]
    da = jax.grad(lambda a: fused_objective(a, b, w, u0, 2.0, -1.0,
                                            pm.cfg.dt, 40, True))(a)
    v = jnp.asarray(np.random.RandomState(1).randn(96, 96).astype(np.float32))
    v = v / jnp.linalg.norm(v)
    eps = 1e-3
    fd = (float(fused_objective(a + eps * v, b, w, u0, 2.0, -1.0, pm.cfg.dt, 40, True))
          - float(fused_objective(a - eps * v, b, w, u0, 2.0, -1.0, pm.cfg.dt, 40, True))) / (2 * eps)
    ad = float(jnp.sum(da * v))
    assert abs(fd - ad) < 5e-3 * max(abs(fd), 1e-8), (fd, ad)
