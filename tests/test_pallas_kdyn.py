"""Fused KDyn Pallas kernel: interpret-mode parity + FD validation.

Per the repo custom-vjp rules (CLAUDE.md): (a) interpret-mode parity of
the hand-derived reverse sweep against jax.grad of the XLA path, (b) FD
checks of every cotangent, (c) a real-TPU compile check (done on
hardware: Mosaic gaps do not show in interpret mode — see BASELINE.md
round-2 notes and /tmp bench logs; tests here are CPU)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.ops.pallas.kdyn_step import (
    make_consts,
    make_fused_energy,
    run_forward,
)
from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo


@pytest.fixture(scope="module")
def setup():
    p = KinematicDynamo(KDynConfig(npts=8, n_iters=2000, dt=1e-3,
                                   dtype="float32", project_gradients=False))
    x0 = p.generate_ic(seed=3)

    @jax.jit
    def prep(b0, u):
        c = p.to_coeff(b0)
        return c.real, c.imag, p.to_grid(p.to_coeff(u))

    br0, bi0, u_bl = prep(jnp.asarray(x0[0]), jnp.asarray(x0[1]))
    return p, br0, bi0, u_bl


def _ref_J(p, n, integrated=False):
    @partial(jax.jit, static_argnums=(3, 4))
    def ref(br, bi, u_bl, n, integ):
        b_c = br + 1j * bi

        def body(carry, _):
            b, acc = carry
            if integ:
                acc = acc + p._energy(b)
            return (p._cnab1_step(b, u_bl), acc), None

        (b, acc), _ = jax.lax.scan(body, (b_c, jnp.zeros((), jnp.float32)),
                                   xs=None, length=n)
        eT = p._energy(b)
        return p.cfg.dt * (acc + eT) if integ else eT

    return lambda br, bi, u: ref(br, bi, u, n, integrated)


def test_forward_interpret_parity(setup):
    p, br0, bi0, u_bl = setup
    N = 12
    C = make_consts(p)
    brT, biT, J = run_forward(br0, bi0, u_bl, C, N, interpret=True)
    J_ref = _ref_J(p, N)(br0, bi0, u_bl)
    assert abs(float(J) - float(J_ref)) < 1e-5 * abs(float(J_ref)) + 1e-10


@pytest.mark.parametrize("integrated", [False, True])
def test_vjp_interpret_parity_vs_autodiff(setup, integrated):
    """Hand-derived reverse sweep == jax.grad of the XLA forward, for
    ALL THREE cotangents (B re/im planes and the stirring field), for
    both cost functionals (Integrated adds per-step direct terms to the
    reverse recursion)."""
    p, br0, bi0, u_bl = setup
    N = 12
    f = make_fused_energy(make_consts(p), N, interpret=True,
                          integrated=integrated, dt=p.cfg.dt)
    J_ref, g_ref = jax.value_and_grad(
        _ref_J(p, N, integrated), argnums=(0, 1, 2))(br0, bi0, u_bl)
    J_pl, g_pl = jax.value_and_grad(f, argnums=(0, 1, 2))(br0, bi0, u_bl)
    assert abs(float(J_pl) - float(J_ref)) < 1e-5 * abs(float(J_ref))
    for name, a, b in zip(("dbr", "dbi", "du"), g_ref, g_pl):
        denom = float(np.abs(np.asarray(a)).max()) + 1e-30
        err = float(np.abs(np.asarray(a) - np.asarray(b)).max()) / denom
        assert err < 5e-5, (name, err)


@pytest.mark.parametrize("integrated", [False, True])
def test_vjp_fd_every_cotangent(setup, integrated):
    """Central finite differences along gradient-aligned directions for
    each input (both cost functionals); tolerances carry the f32 FD
    noise floor ~eps_f32*|J|/h."""
    p, br0, bi0, u_bl = setup
    N = 12
    f = make_fused_energy(make_consts(p), N, interpret=True,
                          integrated=integrated, dt=p.cfg.dt)
    J, g = jax.value_and_grad(f, argnums=(0, 1, 2))(br0, bi0, u_bl)
    args = [br0, bi0, u_bl]
    h = 1e-3
    noise = 4.0 * np.finfo(np.float32).eps * abs(float(J)) / h
    for idx, name in enumerate(("br0", "bi0", "u")):
        d = g[idx] / (jnp.sqrt(jnp.sum(g[idx] ** 2)) + 1e-30)
        ap = list(args); ap[idx] = args[idx] + h * d
        am = list(args); am[idx] = args[idx] - h * d
        fd = (float(f(*ap)) - float(f(*am))) / (2 * h)
        an = float(jnp.sum(g[idx] * d))
        assert abs(fd - an) < 5e-3 * abs(an) + noise, (name, fd, an, noise)


@pytest.mark.parametrize("cost", ["Final", "Integrated"])
def test_wired_production_path_parity(cost):
    """KDynConfig(method='pallas') end to end: objective_and_gradient
    (incl. the Riesz rescale + Leray projection wrapper) matches the
    XLA-scan path on the same f32 config, for both cost functionals."""
    kw = dict(npts=8, n_iters=10, dt=1e-3, dtype="float32", cost=cost)
    p_x = KinematicDynamo(KDynConfig(method="xla", **kw))
    p_p = KinematicDynamo(KDynConfig(method="pallas", **kw))
    x0 = p_x.generate_ic(seed=5)
    J_x, g_x = p_x.objective_and_gradient(x0)
    J_p, g_p = p_p.objective_and_gradient(x0)
    assert abs(float(J_p) - float(J_x)) < 1e-5 * abs(float(J_x))
    for a, b in zip(g_x, g_p):
        denom = float(np.abs(np.asarray(a)).max()) + 1e-30
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) / denom < 5e-5


def test_wired_config_validation():
    with pytest.raises(ValueError):
        KinematicDynamo(KDynConfig(method="pallas", dtype="float64"))
    with pytest.raises(ValueError):
        KinematicDynamo(KDynConfig(method="pallas", dtype="float32",
                                   transform="fft"))


def test_integrated_requires_positive_dt(setup):
    """integrated=True with dt<=0 would silently yield J=0 and zero
    gradients; the builder must reject it (ADVICE r2)."""
    p, *_ = setup
    with pytest.raises(ValueError, match="dt"):
        make_fused_energy(make_consts(p), 4, interpret=True,
                          integrated=True)
