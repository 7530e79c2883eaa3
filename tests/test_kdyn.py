"""Kinematic dynamo tests: adjoint exactness (both spheres), physics
invariants (div B = 0, diffusive decay), transform-path parity, and the
sharded multi-chip step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test
from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo


@pytest.fixture(scope="module")
def small():
    return KinematicDynamo(KDynConfig(npts=12, n_iters=40, dt=1e-3))


@pytest.fixture(scope="module")
def x0(small):
    return small.generate_ic(seed=42)


def test_ic_on_both_spheres_and_divfree(small, x0):
    assert np.isclose(float(small.inner_product(x0[0], x0[0])), 1.0, rtol=1e-10)
    assert np.isclose(float(small.inner_product(x0[1], x0[1])), 1.0, rtol=1e-10)
    k = jnp.asarray(small._k)
    for f in x0:
        div = float(jnp.abs(jnp.sum(k * small.to_coeff(f), axis=0)).max())
        assert div < 1e-12, div


@pytest.mark.parametrize("cost", ["Final", "Integrated"])
def test_taylor_orders_both_spheres(cost, x0):
    p = KinematicDynamo(KDynConfig(npts=12, n_iters=40, dt=1e-3, cost=cost))
    dx0 = p.generate_ic(seed=5)
    r = adjoint_gradient_test(
        x0, dx0, p.objective, p.gradient, p.inner_product,
        epsilon=1e-3, verbose=False,
    )
    assert abs(r.gamma1 - 1.0) < 0.05, r.gamma1
    assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2


def test_taylor_du_only(x0):
    """Perturb only U (dB=0): validates the dJ/dU path the reference
    computes via the auxiliary nu_u system (`FWD_Solve_KDyn.py:881-895`)."""
    p = KinematicDynamo(KDynConfig(npts=12, n_iters=40, dt=1e-3))
    du = p.generate_ic(seed=9)[1]
    r = adjoint_gradient_test(
        x0, [jnp.zeros_like(x0[0]), du], p.objective, p.gradient,
        p.inner_product, epsilon=1e-3, verbose=False,
    )
    assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2


def test_divergence_preserved_through_steps(small, x0):
    b_c = small.to_coeff(x0[0])
    u = x0[1]
    for _ in range(5):
        b_c = small._cnab1_step(b_c, u)
    div = float(jnp.abs(jnp.sum(jnp.asarray(small._k) * b_c, axis=0)).max())
    assert div < 1e-12, div
    # mean mode stays zero (ref pins k=0 mode, :437-440)
    assert float(jnp.abs(b_c[:, 0, 0, 0]).max()) == 0.0


def test_pure_diffusion_decay_rate():
    """With U = 0 the induction equation is a heat equation: each mode
    decays by the CN factor (1/dt - k^2/2Rm)/(1/dt + k^2/2Rm)."""
    cfg = KDynConfig(npts=12, n_iters=1, dt=1e-2, rm=2.0)
    p = KinematicDynamo(cfg)
    mg = p.mg
    xs = np.arange(mg) * cfg.length / mg
    X = np.meshgrid(xs, xs, xs, indexing="ij")[0]
    # div-free single-mode field: B = (0, sin(2x), 0)
    b = jnp.asarray(np.stack([0 * X, np.sin(2 * X), 0 * X]))
    b_c = p.to_coeff(b)
    u0 = jnp.zeros((3, mg, mg, mg))
    b1 = p._cnab1_step(b_c, u0)
    k2 = 4.0
    expected = (1 / cfg.dt - k2 / (2 * cfg.rm)) / (1 / cfg.dt + k2 / (2 * cfg.rm))
    ratio = float(jnp.abs(b1[1, 2, 0, 0]) / jnp.abs(b_c[1, 2, 0, 0]))
    np.testing.assert_allclose(ratio, expected, rtol=1e-10)


def test_transform_paths_agree(x0):
    pm = KinematicDynamo(KDynConfig(npts=12, n_iters=10, dt=1e-3, transform="matmul"))
    pf = KinematicDynamo(KDynConfig(npts=12, n_iters=10, dt=1e-3, transform="fft"))
    np.testing.assert_allclose(
        float(pm.objective(x0)), float(pf.objective(x0)), rtol=1e-13
    )
    gm, gf = pm.gradient(x0), pf.gradient(x0)
    for a, b in zip(gm, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-14)


def test_fused_objective_and_gradient(small, x0):
    J, g = small.objective_and_gradient(x0)
    J2 = small.objective(x0)
    g2 = small.gradient(x0)
    np.testing.assert_allclose(float(J), float(J2), rtol=1e-14)
    for a, b in zip(g, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_dryrun_multichip_8(eight_devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_nested_remat_matches_storeall(x0):
    pa = KinematicDynamo(KDynConfig(npts=12, n_iters=37, dt=1e-3,
                                    cost="Integrated", remat=False))
    pb = KinematicDynamo(KDynConfig(npts=12, n_iters=37, dt=1e-3,
                                    cost="Integrated", remat="nested"))
    np.testing.assert_allclose(float(pa.objective(x0)), float(pb.objective(x0)),
                               rtol=1e-13)
    ga, gb = pa.gradient(x0), pb.gradient(x0)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


@pytest.mark.parametrize("cost", ["Final", "Integrated"])
def test_offload_remat_matches_step_remat(cost, x0):
    """remat='offload' changes only WHERE the per-step carry residuals
    live (pinned host memory vs HBM); the arithmetic is the per-step
    remat path's, so J and both gradients must match remat='step'
    bitwise-class."""
    kw = dict(npts=12, n_iters=40, dt=1e-3, cost=cost)
    pa = KinematicDynamo(KDynConfig(**kw, remat="step"))
    pb = KinematicDynamo(KDynConfig(**kw, remat="offload"))
    Ja, ga = pa.objective_and_gradient(x0)
    Jb, gb = pb.objective_and_gradient(x0)
    np.testing.assert_allclose(float(Ja), float(Jb), rtol=1e-13)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("cost,remat", [("Final", "step"),
                                        ("Integrated", "step"),
                                        ("Final", "nested")])
def test_packed_carry_parity(cost, remat, x0):
    """carry='packed' is a pure layout change (re/im stack + reshape):
    the step arithmetic is identical, so J and both gradients must match
    the natural complex carry to reduction-order reassociation (the
    final energy sum fuses with the unpack and may reduce in a different
    order — measured 4 ULP on CPU f64; gradients come out bitwise)."""
    kw = dict(npts=12, n_iters=40, dt=1e-3, cost=cost, remat=remat)
    pa = KinematicDynamo(KDynConfig(**kw))
    pb = KinematicDynamo(KDynConfig(**kw, carry="packed"))
    Ja, ga = pa.objective_and_gradient(x0)
    Jb, gb = pb.objective_and_gradient(x0)
    np.testing.assert_allclose(float(Ja), float(Jb), rtol=1e-13)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)


def test_packed_carry_rejects_distributed():
    with pytest.raises(ValueError, match="packed"):
        KinematicDynamo(KDynConfig(npts=12, carry="packed",
                                   transform="distributed"))


def test_f32_optimisation_reaches_f64_optimum():
    """f32 parity (BASELINE.md f32-accuracy table, VERDICT round-1
    item 4), two levels. (1) Per-evaluation: one fused fwd+grad over the
    100-step trajectory agrees with f64 to the f32 accumulation floor.
    (2) Full 10-iteration optimisation: the final J agrees within 1% —
    looser BY DESIGN: near-threshold line-search accept decisions flip
    under 1e-5-level J perturbations, after which the two runs follow
    different (equally valid) trajectories toward the optimum; this is
    decision divergence, not numerical error, and the same effect caps
    any f32-vs-f64 trajectory comparison. (The TPU bf16-MXU effect is a
    separate axis, handled by matmul_precision='highest' and measured on
    hardware.)"""
    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere

    # one IC for both dtypes: jax.random draws different bits per dtype
    p64 = KinematicDynamo(KDynConfig(npts=12, n_iters=100, dt=1e-3,
                                     dtype="float64"))
    x0_np = [np.asarray(x, np.float64) for x in p64.generate_ic(seed=3)]

    J_eval, g_eval, J_fin = {}, {}, {}
    for dtype in ("float64", "float32"):
        p = KinematicDynamo(KDynConfig(npts=12, n_iters=100, dt=1e-3,
                                       dtype=dtype))
        x0 = [jnp.asarray(x, p._rdtype) for x in x0_np]
        J, g = p.objective_and_gradient(x0)
        J_eval[dtype] = float(J)
        g_eval[dtype] = np.asarray(g[0], np.float64)
        opt = jit_optimise_on_multi_sphere(
            p.objective_and_gradient, p.inner_product, p.radii,
            max_iters=10, alpha0=0.5, cg=True, err_tol=1e-12)
        r = opt(x0)
        J_fin[dtype] = float(r.function_values[9])

    rel_J = abs(J_eval["float32"] - J_eval["float64"]) / abs(J_eval["float64"])
    rel_g = (np.linalg.norm(g_eval["float32"] - g_eval["float64"])
             / np.linalg.norm(g_eval["float64"]))
    assert rel_J < 2e-5, rel_J
    assert rel_g < 2e-4, rel_g
    rel_fin = abs(J_fin["float32"] - J_fin["float64"]) / abs(J_fin["float64"])
    assert rel_fin < 1e-2, (J_fin, rel_fin)


def test_compensated_precision_mode_matches_f32_floor():
    """matmul_precision="compensated" (bf16 hi/lo split transforms,
    ops/compensated.py — the middle accuracy mode between the 1-pass
    bf16 fast path and "highest") must track the f64 truth at the f32
    floor on CPU, for J and both sphere gradients, and must reject f64
    configs."""
    cfg = dict(npts=16, n_iters=20, dt=1e-3, project_gradients=False)
    p64 = KinematicDynamo(KDynConfig(dtype="float64", **cfg))
    pc = KinematicDynamo(KDynConfig(dtype="float32",
                                    matmul_precision="compensated", **cfg))
    x0 = p64.generate_ic(seed=3)
    J64, g64 = p64.objective_and_gradient([np.asarray(x) for x in x0])
    Jc, gc = pc.objective_and_gradient(
        [np.asarray(x, np.float32) for x in x0])
    assert abs(float(Jc) - float(J64)) / abs(float(J64)) < 5e-5
    for a, b in zip(gc, g64):
        rel = (np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b))
               / np.linalg.norm(np.asarray(b)))
        assert rel < 5e-5, rel

    with pytest.raises(ValueError, match="compensated"):
        KinematicDynamo(KDynConfig(dtype="float64",
                                   matmul_precision="compensated", **cfg))


def test_taylor_compensated_precision_mode():
    """CLAUDE.md gradient-change rule: the compensated transform path
    (reduce_precision splits + optimization_barrier + hi/lo einsums) is
    a NEW differentiated forward, so it needs its own Taylor-remainder
    order-2 check — jax.grad must be the exact discrete adjoint OF THE
    SPLIT FORWARD (f32: epsilon large enough that the O(eps^2)
    remainder sits above the f32 noise floor)."""
    from spheremanopt_tpu import adjoint_gradient_test

    p = KinematicDynamo(KDynConfig(npts=12, n_iters=30, dt=1e-3,
                                   dtype="float32",
                                   matmul_precision="compensated"))
    r = adjoint_gradient_test(
        p.generate_ic(seed=3), p.generate_ic(seed=7), p.objective,
        p.gradient, p.inner_product, epsilon=3e-2, verbose=False)
    assert abs(r.gamma1 - 1.0) < 0.1, r.gamma1
    assert abs(r.gamma2 - 2.0) < 0.2, r.gamma2


def test_rm_aux_path_matches_bound_problem():
    """`objective_and_gradient_rm` with ops built at cfg.rm is bit-equal
    to the bound `objective_and_gradient`, and with ops built at a
    DIFFERENT Rm it reproduces a problem constructed at that Rm — one
    executable genuinely serves every Rm (examples/kdyn_critical_rm.py)."""
    import jax

    p = KinematicDynamo(KDynConfig(npts=8, n_iters=12, dt=1e-3, rm=1.0,
                                   dtype="float64"))
    x0 = [np.asarray(x) for x in p.generate_ic(seed=5)]
    fg, make_ops = p.objective_and_gradient_rm
    fg_j = jax.jit(fg)

    J_ref, g_ref = p.objective_and_gradient(x0)
    J_aux, g_aux = fg_j(make_ops(1.0), x0)
    assert float(J_aux) == float(J_ref)
    for a, b in zip(g_aux, g_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p3 = KinematicDynamo(KDynConfig(npts=8, n_iters=12, dt=1e-3, rm=3.0,
                                    dtype="float64"))
    J3_ref, g3_ref = p3.objective_and_gradient(x0)
    J3_aux, g3_aux = fg_j(make_ops(3.0), x0)  # SAME executable, new ops
    np.testing.assert_allclose(float(J3_aux), float(J3_ref), rtol=1e-14)
    for a, b in zip(g3_aux, g3_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-15)
    assert float(J3_aux) != float(J_aux)  # Rm really flowed through


def test_make_ops_bit_equal_in_f32():
    """`make_ops(cfg.rm)` must rebuild the CNAB1 diagonal factors
    bit-equal to the __init__ constants in float32 too (self._k is
    rdtype-cast before k2 is formed, and numpy's weak python-float
    scalars keep the f32 dtype through the arithmetic) — guards the
    f32 TPU sweep path the f64 parity test above cannot."""
    p = KinematicDynamo(KDynConfig(npts=8, n_iters=4, dtype="float32"))
    _, make_ops = p.objective_and_gradient_rm
    ops = make_ops(p.cfg.rm)
    np.testing.assert_array_equal(ops["lhs_inv"], np.asarray(p._lhs_inv))
    np.testing.assert_array_equal(ops["rhs_fac"], np.asarray(p._rhs_fac))
    assert ops["lhs_inv"].dtype == np.float32


@pytest.mark.parametrize("cost", ["Final", "Integrated"])
@pytest.mark.parametrize("kw", [dict(remat="nested"),
                                dict(carry="packed"),
                                dict(unroll=2),
                                dict(remat="nested", carry="packed")])
def test_aux_objective_op_identical_across_modes(cost, kw):
    """The fused-diagnostics solve must produce the IDENTICAL J as the
    plain objective under every memory/layout mode — the shared
    `_remat_step`/`_carry_codec` wiring guarantees op-identity, and the
    per-step energy series must cover all n_iters+1 snapshots
    (including under nested remat, where the series rides the
    sqrt(N)-chunked scan)."""
    p = KinematicDynamo(KDynConfig(npts=8, n_iters=23, dt=1e-3,
                                   cost=cost, **kw))
    x0 = p.generate_ic(seed=7)
    J_plain = float(p.objective(x0))
    J_aux, diag = p.objective_and_diagnostics(x0)
    assert float(J_aux) == J_plain
    assert diag["magnetic_energy"].shape == (p.cfg.n_iters + 1,)
    # the series end is the terminal energy: for cost='Final' that IS -J
    eN = float(diag["magnetic_energy"][-1])
    if cost == "Final":
        np.testing.assert_allclose(eN, -J_plain, rtol=1e-13)
    # gradient path through the aux solve matches the plain gradient
    Jg, g_aux, _ = p.objective_gradient_and_diagnostics(x0)
    g_plain = p.gradient(x0)
    assert float(Jg) == J_plain
    for a, b in zip(g_aux, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-14)


def test_continuous_mode_objective_and_gradient_dispatch():
    """adjoint='continuous' must flow through objective_and_gradient
    on both spheres (see tests/test_sh23.py twin; self-review r3)."""
    p = KinematicDynamo(KDynConfig(npts=8, n_iters=15, dt=1e-3,
                                   adjoint="continuous"))
    x0 = p.generate_ic(seed=4)
    g_ref = p.gradient(x0)
    g_disc = p._gradient(list(x0))
    assert not np.allclose(np.asarray(g_ref[1]), np.asarray(g_disc[1]))
    J_f, g_f = p.objective_and_gradient(x0)
    assert float(J_f) == float(p.objective(x0))
    for a, b in zip(g_f, g_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adjoint_diagnostics_invariants_at_roundoff():
    """The continuous-adjoint sweep exposes per-step max|div G|,
    max|div nu|, |<G>| series (the reference's adjoint-step logging,
    FWD_Solve_KDyn.py:941-973) — all at Leray-projection roundoff —
    and the gradient it returns is bitwise the gradient() path's."""
    p = KinematicDynamo(KDynConfig(npts=12, n_iters=25, dt=1e-3,
                                   adjoint="continuous"))
    x0 = p.generate_ic(seed=4)
    out = p.adjoint_diagnostics(x0)
    n = p.cfg.n_iters
    assert out["max_div_G"].shape == (n,)
    assert out["max_div_nu"].shape == (n,)
    assert out["adj_sim_time"].shape == (n,)
    g = p.gradient(x0)
    for a, b in zip(out["gradient"], g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # roundoff scale: |div G| ~ eps * max|k| * max|G_hat|; bound it
    # loosely (f64 Leray projection sits ~1e-16 relative)
    import jax.numpy as jnp
    scale = float(np.abs(np.asarray(p._k)).max()) * max(
        float(jnp.abs(p.to_coeff(jnp.asarray(out["gradient"][0]))).max()),
        1e-30)
    assert out["max_div_G"].max() < 1e-10 * scale, (
        out["max_div_G"].max(), scale)
    assert out["max_div_nu"].max() < 1e-10 * scale
    assert out["max_flux_G"].max() == 0.0   # zeroed mean mode, exactly


def test_adjoint_diagnostics_requires_continuous():
    p = KinematicDynamo(KDynConfig(npts=12, n_iters=5, dt=1e-3))
    with pytest.raises(ValueError, match="continuous"):
        p.adjoint_diagnostics(p.generate_ic(seed=1))
