"""Fused Pallas SBDF1 kernel: parity with the XLA scan path (interpret
mode on CPU; the same kernel compiles for TPU via Mosaic).

Note: on this workload the XLA scan path already runs at ~40 ns/step on
the TPU MXU (the whole 1001-step fwd+grad in ~47 us), so the kernel is a
demonstration of VMEM-resident integration rather than the production
path — see ops/pallas/fused_sbdf1.py docstring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.ops.pallas.fused_sbdf1 import sh23_fused_objective
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg


@pytest.fixture(scope="module")
def setup():
    p = SwiftHohenberg(SH23Config(npts=64, n_iters=40, dtype="float32"))
    x0 = [jnp.asarray(np.asarray(p.generate_ic(seed=42)[0]), jnp.float32)]
    return p, x0


def test_objective_parity(setup):
    p, x0 = setup
    obj = sh23_fused_objective(p, interpret=True)
    J_pl = float(obj(x0))
    J_xla = float(p.objective(x0))
    assert abs(J_pl - J_xla) / abs(J_xla) < 1e-5


def test_custom_vjp_parity(setup):
    """grad through the kernel (trajectory-replay custom_vjp) must match
    autodiff of the XLA path."""
    p, x0 = setup
    obj = sh23_fused_objective(p, interpret=True)
    g_pl = jax.grad(lambda v: obj([v]))(x0[0])
    g_xla = p.gradient(x0)[0] / p.basis.n_grid  # raw (un-Riesz) gradient
    rel = float(jnp.linalg.norm(g_pl - g_xla) / jnp.linalg.norm(g_xla))
    assert rel < 1e-5, rel


def test_trajectory_energies(setup):
    """The kernel's internal Euler-rule accumulation equals summing the
    diagnostics KE series."""
    p, x0 = setup
    obj = sh23_fused_objective(p, interpret=True)
    J_pl = float(obj(x0))
    ke = np.asarray(p.diagnostics(x0)["kinetic_energy"], np.float64)
    np.testing.assert_allclose(-J_pl, p.cfg.dt * ke.sum(), rtol=1e-5)


def test_custom_vjp_operator_cotangent(setup):
    """grad w.r.t. the step matrix M must be the true operator
    sensitivity (sum of lambda (x) rhs outer products), not zero."""
    import numpy as np
    from spheremanopt_tpu.ops.pallas.fused_sbdf1 import fused_forward

    p, x0 = setup
    m = jnp.asarray(np.asarray(p._M, np.float32))
    u0 = jnp.dot(jnp.asarray(np.asarray(p._P, np.float32)), x0[0])
    dm = jax.grad(lambda m: fused_forward(m, u0, p.cfg.dt, 20, True))(m)
    assert float(jnp.abs(dm).max()) > 0.0
    # directional check vs finite differences
    v = jnp.asarray(np.random.RandomState(0).randn(*m.shape).astype(np.float32))
    v = v / jnp.linalg.norm(v)
    eps = 1e-3
    Jp = fused_forward(m + eps * v, u0, p.cfg.dt, 20, True)
    Jm = fused_forward(m - eps * v, u0, p.cfg.dt, 20, True)
    fd = (float(Jp) - float(Jm)) / (2 * eps)
    ad = float(jnp.sum(dm * v))
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
