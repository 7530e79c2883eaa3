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


def test_shared_kernel_matches_two_matrix_and_xla(setup):
    """fused_objective_shared(B, lin=1/dt) == fused_objective(B/dt, B)
    for objective AND u0-gradient, and both match the XLA matmul path."""
    from spheremanopt_tpu.ops.pallas.fused_two_matrix import (
        fused_objective_shared,
    )

    p, x0 = setup
    a, b, w = _sh23_args(p)
    pmat = jnp.asarray(p._P.astype(np.float32))
    u0 = jnp.dot(pmat, x0[0])
    lin = 1.0 / p.cfg.dt

    J_sh = float(fused_objective_shared(b, w, u0, 1.8, -1.0, lin,
                                        p.cfg.dt, p.cfg.n_iters, True))
    J_2m = float(fused_objective(a, b, w, u0, 1.8, -1.0, p.cfg.dt,
                                 p.cfg.n_iters, True))
    J_xla = float(p.objective(x0))
    assert abs(J_sh - J_2m) / abs(J_2m) < 1e-6, (J_sh, J_2m)
    assert abs(J_sh - J_xla) / abs(J_xla) < 1e-5

    def obj_sh(v):
        return fused_objective_shared(b, w, jnp.dot(pmat, v), 1.8, -1.0,
                                      lin, p.cfg.dt, p.cfg.n_iters, True)

    g_sh = jax.grad(obj_sh)(x0[0])
    g_xla = p.gradient(x0)[0] / p.basis.n_grid  # raw (un-Riesz) gradient
    rel = float(jnp.linalg.norm(g_sh - g_xla) / jnp.linalg.norm(g_xla))
    assert rel < 1e-5, rel


def test_shared_kernel_operator_and_weight_cotangents(setup):
    """FD directional checks of EVERY differentiable cotangent of the
    shared kernel (B, w, u0) — repo custom_vjp rule (b)."""
    from spheremanopt_tpu.ops.pallas.fused_two_matrix import (
        fused_objective_shared,
    )

    p, x0 = setup
    _, b, w = _sh23_args(p)
    u0 = jnp.dot(jnp.asarray(p._P.astype(np.float32)), x0[0])
    lin = 1.0 / p.cfg.dt
    n = 20

    def obj(b, w, u0):
        return fused_objective_shared(b, w, u0, 1.8, -1.0, lin,
                                      p.cfg.dt, n, True)

    rng = np.random.RandomState(3)
    grads = jax.grad(obj, argnums=(0, 1, 2))(b, w, u0)
    for idx, (arg, g) in enumerate(zip((b, w, u0), grads)):
        assert float(jnp.abs(g).max()) > 0.0, idx
        v = jnp.asarray(rng.randn(*np.shape(arg)).astype(np.float32))
        v = v / jnp.linalg.norm(v)
        # u0 needs a larger step: at eps=1e-3 the f32 central difference
        # is roundoff-limited (~0.6% FD error; the u0 gradient is
        # independently checked to 1e-5 vs XLA autodiff above)
        eps = 5e-3 if idx == 2 else 1e-3
        args_p = [b, w, u0]
        args_m = [b, w, u0]
        args_p[idx] = arg + eps * v
        args_m[idx] = arg - eps * v
        fd = (float(obj(*args_p)) - float(obj(*args_m))) / (2 * eps)
        ad = float(jnp.sum(g * v))
        assert abs(fd - ad) < 5e-3 * max(abs(fd), 1e-6), (idx, fd, ad)


def test_shared_kernel_op_grads_false_zero_db(setup):
    """op_grads=False returns a zero B-cotangent but the exact
    u0-gradient (matches op_grads=True)."""
    from spheremanopt_tpu.ops.pallas.fused_two_matrix import (
        fused_objective_shared,
    )

    p, x0 = setup
    _, b, w = _sh23_args(p)
    u0 = jnp.dot(jnp.asarray(p._P.astype(np.float32)), x0[0])
    lin = 1.0 / p.cfg.dt

    def obj(b, u0, op_grads):
        return fused_objective_shared(b, w, u0, 1.8, -1.0, lin,
                                      p.cfg.dt, 20, True, op_grads)

    db_off, g_off = jax.grad(lambda b, u: obj(b, u, False),
                             argnums=(0, 1))(b, u0)
    _, g_on = jax.grad(lambda b, u: obj(b, u, True), argnums=(0, 1))(b, u0)
    assert float(jnp.abs(db_off).max()) == 0.0
    np.testing.assert_allclose(np.asarray(g_off), np.asarray(g_on),
                               rtol=1e-6)


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


def test_diag_kernels_bitwise_J_and_grad(setup):
    """The fused-diagnostics kernel variants must leave J and the u0
    gradient BITWISE unchanged (the per-step energies they store are
    exactly the values the Kahan cost sum consumes), and the captured
    series must equal the XLA aux path's energies."""
    from spheremanopt_tpu.ops.pallas.fused_two_matrix import (
        fused_objective_diag,
        fused_objective_shared,
        fused_objective_shared_diag,
    )

    p, x0 = setup
    a, b, w = _sh23_args(p)
    pmat = jnp.asarray(p._P.astype(np.float32))
    u0 = jnp.dot(pmat, x0[0])
    lin = 1.0 / p.cfg.dt
    args = (1.8, -1.0, lin, p.cfg.dt, p.cfg.n_iters, True)

    # primal context: J bitwise across plain/diag shared kernels
    J_plain = float(fused_objective_shared(b, w, u0, *args))
    J_diag, ser, uT = fused_objective_shared_diag(b, w, u0, *args)
    assert float(J_diag) == J_plain
    assert ser.shape == (p.cfg.n_iters + 1,)

    # grad context: J and gradient bitwise
    def obj_plain(v):
        return fused_objective_shared(b, w, v, *args)

    def obj_diag(v):
        out = fused_objective_shared_diag(b, w, v, *args)
        return out[0], (jax.lax.stop_gradient(out[1]),
                        jax.lax.stop_gradient(out[2]))

    Jp, gp = jax.value_and_grad(obj_plain)(u0)
    (Jd, (ser_g, uT_g)), gd = jax.value_and_grad(obj_diag,
                                                 has_aux=True)(u0)
    assert float(Jp) == float(Jd)
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(gd))
    np.testing.assert_array_equal(np.asarray(ser_g), np.asarray(ser))

    # series parity vs the XLA fused-aux path (f32 tolerance)
    _, diag_xla = p._obj_and_diag(x0)
    np.testing.assert_allclose(np.asarray(ser), 
                               np.asarray(diag_xla["kinetic_energy"]),
                               rtol=2e-5)

    # two-matrix diag variant: J bitwise vs fused_objective
    J2 = float(fused_objective(a, b, w, u0, 1.8, -1.0, p.cfg.dt,
                               p.cfg.n_iters, True))
    J2d, ser2, _uT2 = fused_objective_diag(a, b, w, u0, 1.8, -1.0,
                                           p.cfg.dt, p.cfg.n_iters, True)
    assert float(J2d) == J2
    np.testing.assert_allclose(np.asarray(ser2), np.asarray(ser), rtol=2e-5)
