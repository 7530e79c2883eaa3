"""Optimal mixing (2D Boussinesq, Fourier x Chebyshev) tests: constraint
enforcement (incompressibility, walls, gauges), adjoint exactness for both
objectives, physics sanity, short optimisation."""

import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test
from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing


@pytest.fixture(scope="module")
def ke_problem():
    return OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=30, dt=5e-3, s=0))


@pytest.fixture(scope="module")
def mix_problem():
    return OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=30, dt=5e-3, s=1))


@pytest.fixture(scope="module")
def x0(ke_problem):
    return ke_problem.generate_ic(seed=42)


def test_ic_on_sphere(ke_problem, x0):
    assert np.isclose(
        float(ke_problem.inner_product(x0[0], x0[0])), ke_problem.cfg.e0, rtol=1e-10
    )


def test_linear_prep_properties(ke_problem, x0):
    """The Sim_Type="Linear" IC prep (ref FWD_Solve_Poiseuille.py:480-484,
    520-608): prep output respects the wall BCs and the 2/3-rule dealias
    mask, and the prep evolution itself is LINEAR in the velocity part
    (additivity of the (u, w)-propagation with rho held at its
    background: superposing velocity ICs superposes outputs)."""
    p = ke_problem
    nz, kxn = p.cfg.nz, p.kxn
    u_c, w_c = np.asarray(p.to_coeff(x0[0][0])), np.asarray(p.to_coeff(x0[0][1]))
    # 2/3-rule mask held
    nx0, nz0 = 2 * p.cfg.nx // 3, 2 * nz // 3
    assert np.abs(u_c[nx0 // 2:]).max() < 1e-14
    assert np.abs(u_c[:, nz0:]).max() < 1e-14
    assert np.abs(w_c[nx0 // 2:]).max() < 1e-14
    # (wall BCs hold for the prep SOLVE output but are then perturbed by
    # the 2/3-rule truncation — the reference output shares this:
    # u['c'] *= DA happens after the prep, ref :604-606)

    # linearity of the prep propagator in (u, w): S_prep applied to
    # (a*u1 + b*u2, ..., rho=rho0) == superposition of the rho0-sourced
    # response and the scaled homogeneous responses
    import jax.numpy as jnp

    prep = p._prep_solve_ops()
    a0 = 1.0 / p.cfg.prep_dt

    def adv(u, w, r):
        rhs = jnp.concatenate([a0 * u, a0 * w, a0 * r], axis=-1)
        sol = p._solve(prep, rhs)   # handles the parity-blocked form
        return (np.asarray(sol[:, :nz]), np.asarray(sol[:, nz:2 * nz]),
                np.asarray(sol[:, 2 * nz:]))

    rng = np.random.RandomState(0)
    u1 = jnp.asarray(rng.randn(kxn, nz) + 1j * rng.randn(kxn, nz))
    u2 = jnp.asarray(rng.randn(kxn, nz) + 1j * rng.randn(kxn, nz))
    z = jnp.zeros_like(u1)
    out_sum = adv(2.0 * u1 + 3.0 * u2, z, z)
    o1 = adv(u1, z, z)
    o2 = adv(u2, z, z)
    for k in range(3):
        np.testing.assert_allclose(out_sum[k], 2.0 * o1[k] + 3.0 * o2[k],
                                   rtol=1e-11, atol=1e-12)


def test_step_enforces_constraints(ke_problem, x0):
    p = ke_problem
    u_c, w_c = p.to_coeff(x0[0][0]), p.to_coeff(x0[0][1])
    r_c = jnp.asarray(p._rho0_c)
    for _ in range(3):
        u_c, w_c, r_c = p._step(p._ops, u_c, w_c, r_c)
    ikx = 1j * p._kx[:, None]
    div = ikx * np.asarray(u_c) + np.einsum("mn,kn->km", p._Dz_np, np.asarray(w_c))
    assert np.abs(div).max() < 1e-12
    b = p.zbasis
    for row in (b.boundary_row("left", 0), b.boundary_row("right", 0)):
        assert np.abs(np.asarray(u_c) @ row).max() < 1e-13
        assert np.abs(np.asarray(w_c) @ row).max() < 1e-13
    for row in (b.boundary_row("left", 1), b.boundary_row("right", 1)):
        assert np.abs(np.asarray(r_c) @ row).max() < 1e-12


@pytest.mark.parametrize("s", [0, 1])
def test_taylor_orders(s, x0):
    p = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=30, dt=5e-3, s=s))
    dx0 = p.generate_ic(seed=5)
    r = adjoint_gradient_test(
        x0, dx0, p.objective, p.gradient, p.inner_product, epsilon=1e-3, verbose=False
    )
    assert abs(r.gamma1 - 1.0) < 0.05, r.gamma1
    assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2


def test_objective_signs(ke_problem, mix_problem, x0):
    # s=0 returns -KE-integral/2 (negative); s=1 returns +mix-norm (positive)
    assert float(ke_problem.objective(x0)) < 0.0
    assert float(mix_problem.objective(x0)) > 0.0


def test_density_background_diffuses_only(ke_problem):
    """With zero initial velocity the layered density evolves by pure
    diffusion: velocity stays (essentially) zero and the mean-density
    gauge holds."""
    p = ke_problem
    zero = [jnp.zeros((2, p.mgx, p.mgz))]
    u_c = p.to_coeff(zero[0][0])
    w_c = p.to_coeff(zero[0][1])
    r_c = jnp.asarray(p._rho0_c)
    for _ in range(5):
        u_c, w_c, r_c = p._step(p._ops, u_c, w_c, r_c)
    assert float(jnp.abs(u_c).max()) < 1e-12
    assert float(jnp.abs(w_c).max()) < 1e-12
    # rho stays x-independent (only kx=0 content)
    assert float(jnp.abs(r_c[1:]).max()) < 1e-12


def test_mixnorm_decreases_with_diffusion(mix_problem, x0):
    """Longer integration of the same IC mixes more: the mix-norm at
    larger T must be smaller (diffusion + stirring only destroy variance
    of the inverse-gradient norm)."""
    p_short = mix_problem
    p_long = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=90, dt=5e-3, s=1))
    assert float(p_long.objective(x0)) < float(p_short.objective(x0))


def test_continuous_adjoint_directional_convergence():
    """The continuous-adjoint directional derivative <dX, g_cnts> along
    smooth (band-limited) perturbations converges to the exact one
    <dX, g_disc> as dt -> 0 — the reference's Adjoint_type='Continuous'
    accuracy semantics: error = O(dt) + spatial plateau (SURVEY.md
    section 4). The IC and perturbation are held FIXED across dt rows
    (generate_ic's prep smoothing depends on the problem dt, so
    per-config ICs would change the trajectory under test); the O(dt)
    component is isolated as the successive difference of errors, which
    must halve when dt halves."""
    # Smooth analytic ICs (low modes only, BC-compatible): psi = sin(ax)
    # f(z) with f = (1-z^2)^2 gives u = -sin(ax) f'(z), w = a cos(ax) f(z)
    # — u = w = 0 at the walls, content far inside the band, which is the
    # regime the continuous adjoint's O(dt) statement covers. The
    # reference-exact generate_ic keeps modes to the 2/3 band edge, where
    # the (documented) spatial off-band plateau dominates at any dt.
    p_ic = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=20, dt=5e-3, s=0))
    import numpy as np

    xg = np.arange(p_ic.mgx) * p_ic.cfg.lx / p_ic.mgx
    zg = p_ic._zgrid
    a1 = 2.0 * np.pi / p_ic.cfg.lx

    def smooth_field(kmul, fpow, amp):
        f = (1.0 - zg ** 2) ** fpow
        fp = -2.0 * fpow * zg * (1.0 - zg ** 2) ** (fpow - 1)
        u = -np.sin(kmul * a1 * xg)[:, None] * fp[None, :]
        w = (kmul * a1) * np.cos(kmul * a1 * xg)[:, None] * f[None, :]
        return amp * np.stack([u, w])

    # dx shares x0's kx=1 content (different z profile): with disjoint
    # kx the directional derivative vanishes by mode orthogonality
    x0 = [smooth_field(1, 2, 0.05)]
    dx = smooth_field(1, 3, 0.05)
    rels = []
    for dt, n in [(5e-3, 20), (2.5e-3, 40), (1.25e-3, 80)]:
        p = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=n, dt=dt, s=0,
                                       adjoint="continuous"))
        gd = p._gradient(p._ops, list(x0))[0]  # exact, same spectral IP
        gc = p.gradient(x0)[0]
        wd = float(p.inner_product(dx, gd))
        wc = float(p.inner_product(dx, gc))
        rels.append(abs(wc - wd) / abs(wd))
    assert rels[0] > rels[1] > rels[2], rels   # monotone convergence
    ratio = (rels[0] - rels[1]) / (rels[1] - rels[2])
    assert 1.4 < ratio < 2.8, (rels, ratio)    # O(dt): differences halve


def test_short_optimisation(mix_problem, x0):
    res = optimise_on_multi_sphere(
        x0, mix_problem.radii, mix_problem.objective, mix_problem.gradient,
        mix_problem.inner_product, max_iters=2, alpha_k=100.0,
        line_search="wolfe", cg=True, verbose=False,
        f_and_g=mix_problem.objective_and_gradient,
    )
    assert res.iterations >= 1
    # minimisation: recorded -J must increase (J = mix-norm decreases)
    assert res.function_values[-1] >= res.function_values[0] - 1e-12
    xo = res.x_opt[0]
    assert np.isclose(
        float(mix_problem.inner_product(xo, xo)), mix_problem.cfg.e0, rtol=1e-10
    )


def test_final_fields_consistency(mix_problem, x0):
    """final_fields equals stepping manually; rho develops structure."""
    u_c, w_c, r_c = mix_problem.final_fields(x0)
    p = mix_problem
    uu, ww, rr = p.to_coeff(jnp.asarray(x0[0][0])), p.to_coeff(jnp.asarray(x0[0][1])), jnp.asarray(p._rho0_c)
    for _ in range(p.cfg.n_iters):
        uu, ww, rr = p._step(p._ops, uu, ww, rr)
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(uu), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_c), np.asarray(rr), atol=1e-12)


def test_parity_blocked_solve_matches_full(ke_problem):
    """The parity-blocked operator application (two half-size stacks —
    HALF the per-step HBM stream) equals the full dense solve to f64
    roundoff: the tau systems decouple exactly into the two Chebyshev
    parity families under the even base flow U = 1 - z^2."""
    import jax.numpy as jnp

    p = ke_problem
    nz, kxn = p.cfg.nz, p.kxn
    assert p._ops["S"][0].ndim == 4, "S should be stored parity-blocked"
    rng = np.random.RandomState(1)
    rhs = jnp.asarray(rng.randn(kxn, 3 * nz) + 1j * rng.randn(kxn, 3 * nz))
    out_blk = np.asarray(p._solve(p._ops["S"], rhs))
    out_full = np.einsum("kij,kj->ki", p._S_np, np.asarray(rhs))
    np.testing.assert_allclose(out_blk, out_full, rtol=1e-12, atol=1e-13)


def test_block_solve_assembly_matches_full():
    """`_block_solve` (direct-E parity-split assembly, the 3.84x
    one-time-cost win) produces the SAME operator stacks as the plain
    full `solve(A, E)` to f64 inversion roundoff, engages on every
    kx != 0 block, and falls back (returns None) whenever the exactness
    preconditions are violated."""
    import spheremanopt_tpu.problems.optimal_mixing as om

    p = om.OptimalMixing(om.MixingConfig(nx=16, nz=32, n_iters=4,
                                         device_ops=False))
    calls = {"hit": 0, "fallback": 0}
    orig = om._block_solve

    def spy(A, E, col_a, pairs):
        X = orig(A, E, col_a, pairs)
        calls["hit" if X is not None else "fallback"] += 1
        return X

    om._block_solve = spy
    try:
        S_new, MN_new = p._build_operators_uncached(build_mixnorm=True)
    finally:
        om._block_solve = orig
    # kx=0 is excluded by the caller, so every attempted block splits
    assert calls["hit"] == 2 * (p.kxn - 1) and calls["fallback"] == 0

    om._block_solve = lambda *a: None      # force the full-solve path
    try:
        S_old, MN_old = p._build_operators_uncached(build_mixnorm=True)
    finally:
        om._block_solve = orig
    np.testing.assert_allclose(S_new, S_old, rtol=0,
                               atol=1e-11 * np.abs(S_old).max())
    np.testing.assert_allclose(MN_new, MN_old, rtol=0,
                               atol=1e-12 * np.abs(MN_old).max())

    # precondition guards: nonzero rhs on a BC row / a class-mixing row
    n = 8
    rng = np.random.RandomState(0)
    ev = np.arange(n) % 2 == 0
    A = np.zeros((n, n), complex)
    A[np.ix_(ev, ev)] = rng.randn(4, 4)
    A[np.ix_(~ev, ~ev)] = rng.randn(4, 4)
    E = np.zeros((n, 2), complex)
    E[0, 0] = E[1, 1] = 1.0
    X = orig(A, E, ev, [])
    np.testing.assert_allclose(X, np.linalg.solve(A, E), atol=1e-13)
    E_bad = E.copy()
    E_bad[3, 0] = 1.0                       # rhs on a "BC" pair row
    assert orig(A, E_bad, ev, [(3, 4)]) is None
    A_bad = A.copy()
    A_bad[0, 1] = 1.0                       # row touching both classes
    assert orig(A_bad, E, ev, []) is None


def test_parity_perm_non_applicable_returns_none(ke_problem):
    """A square stack whose width is not 3*nz (e.g. the MN mix-norm
    operator) must signal non-applicability instead of crashing, so
    _put_blocked can fall back to the unblocked store (ADVICE r2)."""
    assert ke_problem._parity_perm(2 * ke_problem.cfg.nz) is None
    assert ke_problem._parity_perm(3 * ke_problem.cfg.nz) is not None


def test_adjoint_modes_reach_consistent_optima():
    """End-to-end consistency of the two adjoint modes (VERDICT r2
    item 6): Wolfe+CG optimisations driven by the discrete (autodiff)
    and continuous (ref `ADJ_Solve_Cnts`) gradients — each paired with
    its mode's inner product, as the reference pairs them
    (`FWD_Solve_Poiseuille.py:1727-1740`) — must descend to the same
    optimum: final objectives, evaluated under the SHARED discrete
    objective, agree to a small fraction of the achieved reduction."""
    import warnings

    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere

    base = dict(nx=32, nz=24, n_iters=100, dt=5e-3, s=1, prep_steps=20)
    pd = OptimalMixing(MixingConfig(adjoint="discrete", **base))
    pc = OptimalMixing(MixingConfig(adjoint="continuous", **base))

    stars = {}
    for name, p in (("disc", pd), ("cnts", pc)):
        x = p.generate_ic(seed=3)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            res = optimise_on_multi_sphere(
                [np.asarray(x[0])], p.radii, p.objective, p.gradient,
                p.inner_product, max_iters=10, alpha_k=100.0,
                line_search="wolfe", cg=True, verbose=False)
        assert len(res.function_values) == 10   # full run, no LS bailout
        stars[name] = float(pd.objective([res.x_opt[0]]))

    J0 = float(pd.objective([np.asarray(pd.generate_ic(seed=3)[0])]))
    reduction = J0 - stars["disc"]
    assert reduction > 0  # mix-norm was actually minimised
    assert abs(stars["disc"] - stars["cnts"]) < 0.05 * reduction, stars


def test_compensated2_middle_mode_accuracy_ladder():
    """The 2-dot "compensated2" middle mode sits strictly between the
    rhs-corrected 3-dot "compensated" mode and a plain bf16-rounded-rhs
    solve in accuracy. On CPU the dots are exact f32, so the error the
    modes exhibit here is exactly the term each drops: "compensated"
    ~ roundoff, "compensated2" ~ the rhs-rounding random walk it trades
    for 2/3 the MXU pass count on TPU."""
    import jax.numpy as jnp

    truth = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=30, dt=5e-3,
                                       s=1))
    x64 = truth.generate_ic(seed=5)
    J64 = float(truth.objective(x64))

    errs = {}
    for mode in ("compensated", "compensated2"):
        p = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=30, dt=5e-3,
                                       s=1, dtype="float32",
                                       solve_precision=mode))
        x32 = [jnp.asarray(np.asarray(x64[0]), jnp.float32)]
        errs[mode] = abs(float(p.objective(x32)) - J64) / abs(J64)
        # gradient flows through the mode
        _, g = p.objective_and_gradient(x32)
        assert np.isfinite(np.asarray(g[0])).all()

    assert errs["compensated"] < 2e-4
    assert errs["compensated2"] < 3e-2
    assert errs["compensated2"] > errs["compensated"]


def test_unknown_solve_precision_rejected():
    with pytest.raises(ValueError, match="solve_precision"):
        OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=10,
                                   solve_precision="compensatedX"))


def test_continuous_mode_fused_callables_serve_continuous_gradient():
    """`objective_and_gradient` (and the aux/device-loop and
    fused-diagnostics forms) must dispatch on cfg.adjoint: under
    adjoint='continuous' they pair the forward J with the CONTINUOUS
    gradient — never the discrete autodiff one — so a Wolfe search fed
    f_and_g cannot mix the two O(dt)-different gradient definitions
    (found by self-review r3; the reference aliases FWD/ADJ per mode at
    import time, `FWD_Solve_Poiseuille.py:1727-1740`)."""
    import jax

    base = dict(nx=32, nz=24, n_iters=25, dt=5e-3, s=1, prep_steps=10)
    pc = OptimalMixing(MixingConfig(adjoint="continuous", **base))
    x0 = [np.asarray(pc.generate_ic(seed=3)[0])]

    J_ref = float(pc.objective(x0))
    g_ref = np.asarray(pc.gradient(x0)[0])          # continuous adjoint
    g_disc = np.asarray(pc._gradient(pc._ops, list(x0))[0])
    assert not np.allclose(g_ref, g_disc)           # modes really differ

    J_f, g_f = pc.objective_and_gradient(x0)
    assert float(J_f) == J_ref
    np.testing.assert_array_equal(np.asarray(g_f[0]), g_ref)

    fg, ops = pc.objective_and_gradient_aux
    J_a, g_a = jax.jit(fg)(ops, x0)
    np.testing.assert_allclose(float(J_a), J_ref, rtol=1e-14)
    np.testing.assert_allclose(np.asarray(g_a[0]), g_ref,
                               rtol=1e-12, atol=1e-15)

    J_d, g_fd, diag = pc.objective_gradient_and_diagnostics(x0)
    assert float(J_d) == J_ref
    np.testing.assert_array_equal(np.asarray(g_fd[0]), g_ref)
    assert "sim_time" in diag
