"""df64 (f64-emulated) KDyn mode: accuracy vs in-process f64 truth.

The engine generalises the mixing precision escape hatch
(problems/mixing_df.py, VERDICT r3 item 1) to the 3-D two-sphere
problem: an f64-emulated forward removes the dominant
eps_fwd * e^{2 lam T} term of the gradient error model. At this small
benign config (20 steps, Rm=1 decaying) the f32 reverse sweep sets the
gradient floor, so the headline separation is on J (measured:
2.1e-14 vs 2.8e-7); the gradient must still not be worse. Everything
runs in pure f32 ops, as the TPU executes them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.problems.kinematic_dynamo import (
    KDynConfig, KinematicDynamo)

KW = dict(npts=8, n_iters=20, dt=1e-3, rm=1.0)


def _rel_g(g, g64):
    num = sum(np.linalg.norm(np.asarray(a, np.float64) - b) ** 2
              for a, b in zip(g, g64))
    den = sum(np.linalg.norm(b) ** 2 for b in g64)
    return float((num / den) ** 0.5)


@pytest.fixture(scope="module")
def truth():
    p64 = KinematicDynamo(KDynConfig(dtype="float64", **KW))
    x64 = p64.generate_ic(seed=3)
    x32 = [np.asarray(a).astype(np.float32) for a in x64]
    xe = [jnp.asarray(a.astype(np.float64)) for a in x32]  # exact f32 pt
    J = float(p64.objective(xe))
    g = [np.asarray(v) for v in p64.gradient(xe)]
    return x32, J, g


@pytest.fixture(scope="module")
def df_prob():
    return KinematicDynamo(KDynConfig(dtype="float32",
                                      solve_precision="df64", **KW))


def test_df64_beats_f32(truth, df_prob):
    x32, J64, g64 = truth
    x = [jnp.asarray(a) for a in x32]
    Jdf, gdf = df_prob.objective_and_gradient(x)
    Jdf = float(Jdf)

    p32 = KinematicDynamo(KDynConfig(dtype="float32", **KW))
    J32, g32 = p32.objective_and_gradient(x)
    J32 = float(J32)

    relJ_df = abs(Jdf - J64) / abs(J64)
    relJ_32 = abs(J32 - J64) / abs(J64)
    relg_df = _rel_g(gdf, g64)
    relg_32 = _rel_g(g32, g64)
    # measured at this config: df64 2.1e-14 / 4.0e-7 vs f32 2.8e-7 /
    # 9.1e-7 (J is forward-precision-bound; the gradient floor here is
    # the f32 reverse sweep — the df win on it grows with horizon)
    assert relJ_df < 1e-12, relJ_df
    assert relJ_df < 1e-4 * relJ_32
    assert relg_df < 1.1 * relg_32, (relg_df, relg_32)
    assert relg_df < 2e-6, relg_df


def test_df64_integrated_cost(truth):
    """The Integrated cost rides a df accumulator on the scan carry
    (the mixing engine's s=0 analogue)."""
    kw = dict(KW, cost="Integrated")
    p64 = KinematicDynamo(KDynConfig(dtype="float64", **kw))
    x32 = truth[0]
    xe = [jnp.asarray(a.astype(np.float64)) for a in x32]
    J64 = float(p64.objective(xe))
    g64 = [np.asarray(v) for v in p64.gradient(xe)]

    pdf = KinematicDynamo(KDynConfig(dtype="float32",
                                     solve_precision="df64", **kw))
    Jdf, gdf = pdf.objective_and_gradient([jnp.asarray(a) for a in x32])
    assert abs(float(Jdf) - J64) / abs(J64) < 1e-12
    assert _rel_g(gdf, g64) < 2e-6


def test_df64_fused_matches_separate(truth, df_prob):
    x = [jnp.asarray(a) for a in truth[0]]
    J1 = df_prob.objective_f64(x)  # pair-resolution, like the fused J
    g1 = [np.asarray(v) for v in df_prob.gradient(x)]
    J2, g2 = df_prob.objective_and_gradient(x)
    assert float(J2) == J1, (float(J2), J1)
    for a, b in zip(g2, g1):
        np.testing.assert_array_equal(np.asarray(a), b)
    # and the f32 scalar objective is the pair rounded to f32
    assert float(np.float32(J2)) == float(df_prob.objective(x))


def test_df64_device_loop_aux_form(truth, df_prob):
    """The device loop consumes the traceable f32-scalar aux pair (the
    host fused form reconstructs J with float(), which cannot trace)."""
    fg, ops = df_prob.objective_and_gradient_aux
    x = [jnp.asarray(a) for a in truth[0]]
    J, g = jax.jit(fg)(ops, x)
    J2, g2 = df_prob.objective_and_gradient(x)
    assert abs(float(J) - float(J2)) <= 2e-7 * abs(float(J2))
    for a, b in zip(g, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # native configs keep the no-stacks contract (drivers trace the
    # bound objective_and_gradient, constants are HLO closures)
    p32 = KinematicDynamo(KDynConfig(dtype="float32", **KW))
    assert p32.objective_and_gradient_aux == (None, None)


def test_df64_device_loop_matches_host_trajectory(df_prob, truth):
    """The single-jit device loop composes with the kdyn df64 aux form
    (empty operand dict; slice stacks are HLO constants). The device
    Wolfe consumes J as an f32 SCALAR while the host search gets
    pair-resolution J (objective_f64) — at f32-representable decision
    margins both searches accept the same steps."""
    from spheremanopt_tpu.optim.jit_driver import (
        jit_optimise_on_multi_sphere)
    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere

    x = [jnp.asarray(a) for a in truth[0]]
    fg, ops = df_prob.objective_and_gradient_aux
    opt = jit_optimise_on_multi_sphere(
        fg, df_prob.inner_product, df_prob.radii,
        max_iters=3, alpha0=10.0, cg=True, line_search="wolfe")
    rd = opt(x, aux=ops)
    kd = int(rd.iterations)

    rh = optimise_on_multi_sphere(
        x, df_prob.radii, df_prob.objective_f64,
        df_prob.gradient, df_prob.inner_product, max_iters=3,
        alpha_k=10.0, line_search="wolfe", cg=True,
        f_and_g=df_prob.objective_and_gradient, verbose=False)

    assert kd == rh.iterations, (kd, rh.iterations)
    np.testing.assert_allclose(
        np.asarray(rd.function_values[:kd], np.float64),
        np.asarray(rh.function_values, np.float64)[:kd],
        rtol=2e-6)


def test_df64_taylor_second_order(truth, df_prob):
    """Taylor-remainder check of the df64 gradient against the df64
    objective at pair resolution (architecture invariant: every
    gradient change needs one). The perturbation is SOLENOIDAL
    (generate_ic), as in test_kdyn's Taylor tests: the default
    project_gradients=True Leray-projects the gradient, so <Pg, d> is
    dJ[d] only for div-free d."""
    x32 = truth[0]
    x = [jnp.asarray(a) for a in x32]
    J0 = df_prob.objective_f64(x)
    g = df_prob.gradient(x)
    d = [np.asarray(v, np.float32)
         for v in df_prob.generate_ic(seed=11)]
    # f64-host slope: the f32 inner-product kernel would add ~1e-7
    # noise on top of the remainders this test resolves
    w = 1.0 / df_prob.mg ** 3
    slope = sum(float(np.sum(np.asarray(gi, np.float64)
                             * np.asarray(di, np.float64)) * w)
                for gi, di in zip(g, d))
    rems = []
    for eps in (1e-1, 5e-2, 2.5e-2):
        J1 = df_prob.objective_f64(
            [jnp.asarray(a + eps * v) for a, v in zip(x32, d)])
        rems.append(abs(J1 - J0 - eps * slope))
    orders = [np.log(rems[i] / rems[i + 1]) / np.log(2.0)
              for i in range(len(rems) - 1)]
    assert all(o > 1.7 for o in orders), (rems, orders)


def test_df64_finite_on_tiny_spectral_tails():
    """Regression for the _df_slice frame-underflow NaN: decaying
    high-k tails produce all-tiny contraction columns (|y| ~ 1e-34)
    whose unclamped slice scale 2^(e - q*b) underflowed to 0 ->
    rh/sig = NaN poisoning the solve (found by this file's Taylor
    probe at eps = 0.1, step 2). The clamped frame must keep the
    objective finite AND df64-accurate against the f64 truth at the
    same perturbed point."""
    p64 = KinematicDynamo(KDynConfig(dtype="float64", **KW))
    x64 = p64.generate_ic(seed=3)
    x32 = [np.asarray(a).astype(np.float32) for a in x64]
    rng = np.random.default_rng(7)
    d = [rng.standard_normal(a.shape).astype(np.float32) for a in x32]
    nrm = float(np.sqrt(sum(np.linalg.norm(v) ** 2 for v in d)))
    xp = [a + (0.1 / nrm) * v for a, v in zip(x32, d)]  # the NaN input
    pdf = KinematicDynamo(KDynConfig(dtype="float32",
                                     solve_precision="df64", **KW))
    Jdf = pdf.objective_f64([jnp.asarray(a) for a in xp])
    assert np.isfinite(Jdf), Jdf
    J64 = float(p64.objective(
        [jnp.asarray(np.asarray(a, np.float64)) for a in xp]))
    assert abs(Jdf - J64) / abs(J64) < 1e-12, (Jdf, J64)


def test_df64_config_validation():
    with pytest.raises(ValueError, match="df64"):
        KinematicDynamo(KDynConfig(dtype="float32",
                                   solve_precision="df64",
                                   adjoint="continuous", **KW))
    with pytest.raises(ValueError, match="df64"):
        KinematicDynamo(KDynConfig(dtype="float32",
                                   solve_precision="df64",
                                   transform="fft", **KW))
    with pytest.raises(ValueError, match="df64"):
        KinematicDynamo(KDynConfig(dtype="float32",
                                   solve_precision="df64",
                                   method="pallas", **KW))
    with pytest.raises(ValueError, match="df64"):
        KinematicDynamo(KDynConfig(dtype="float32",
                                   solve_precision="df64",
                                   remat="nested", **KW))


def test_df64_f64_config_uses_exact_path():
    # under dtype=float64 the df layer is a no-op (f64 is exact)
    p = KinematicDynamo(KDynConfig(dtype="float64",
                                   solve_precision="df64", **KW))
    assert p._dfe is None


def test_df64_n_bits_knob(truth):
    """df_n_bits=32 drops slice-pair passes (q 6 -> 4) and must stay
    orders beyond the f32 J floor at this config."""
    x32, J64, g64 = truth
    p32b = KinematicDynamo(KDynConfig(dtype="float32",
                                      solve_precision="df64",
                                      df_n_bits=32, **KW))
    pdf = KinematicDynamo(KDynConfig(dtype="float32",
                                     solve_precision="df64", **KW))
    assert (p32b._dfe._oFz.re.slices_np.shape[0]
            < pdf._dfe._oFz.re.slices_np.shape[0])
    J, g = p32b.objective_and_gradient([jnp.asarray(a) for a in x32])
    assert abs(float(J) - J64) / abs(J64) < 1e-8
    assert _rel_g(g, g64) < 2e-6


def test_cli_precision_flag_selects_df64():
    from spheremanopt_tpu.run import build_parser, make_problem

    args = build_parser().parse_args(
        ["kdyn", "--platform", "cpu", "--precision", "df64",
         "--dtype", "float32", "--npts", "8", "--n-iters", "4",
         "--df-n-bits", "32"])
    p, _x0, _defaults = make_problem(args)
    assert p.cfg.solve_precision == "df64"
    assert p.cfg.df_n_bits == 32
    assert p._dfe is not None
    assert callable(p.objective_f64)

    # the matmul pass-count names map to matmul_precision
    args = build_parser().parse_args(
        ["kdyn", "--platform", "cpu", "--precision", "highest",
         "--dtype", "float32", "--npts", "8", "--n-iters", "4"])
    p, _x0, _defaults = make_problem(args)
    assert p.cfg.matmul_precision == "highest"
    assert p._dfe is None


class TestKDynDFAdjoint:
    """Hand-rolled DF-cotangent adjoint for KDyn (r5 generalisation of
    the mixing DF adjoint; kdyn_df adjoint section). Both control
    cotangents (dJ/dB0 and dJ/dU) come from the same DF reverse sweep;
    the Leray/diagonal/mean-pin blocks are self-adjoint and reuse the
    forward's df operators."""

    @pytest.fixture(scope="class")
    def probs(self):
        kw = dict(npts=8, n_iters=20, dt=2e-3, rm=1.0)
        p64 = KinematicDynamo(KDynConfig(dtype="float64", **kw))
        p_adj = KinematicDynamo(KDynConfig(dtype="float32",
                                           solve_precision="df64",
                                           df_adjoint=True, **kw))
        x0 = [np.asarray(a, np.float64) for a in p64.generate_ic(seed=3)]
        return p64, p_adj, x0

    def test_both_cotangents_match_f64_truth(self, probs):
        p64, p_adj, x0 = probs
        g64 = [np.asarray(g, np.float64) for g in p64.gradient(x0)]
        x32 = [jnp.asarray(a, jnp.float32) for a in x0]
        g_adj = [np.asarray(g, np.float64) for g in p_adj.gradient(x32)]
        for ga, gt in zip(g_adj, g64):
            rel = np.linalg.norm(ga - gt) / np.linalg.norm(gt)
            # f32 input-cast + output-rounding class (measured 1.8e-7 /
            # 2.3e-7 for dB0/dU; the plain-df64 f32 reverse sits ~2x
            # higher already at this benign horizon)
            assert rel < 1e-6, rel

    def test_taylor_order_2(self, probs):
        from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test

        _, p_adj, x0 = probs
        x32 = [jnp.asarray(a, jnp.float32) for a in x0]
        dx = [jnp.asarray(np.asarray(a), jnp.float32)
              for a in p_adj.generate_ic(seed=9)]
        # eps=1e-2: tiny-eps remainders floor at the hand-rolled
        # adjoint's ~1e-7-relative accuracy (see the mixing DF-adjoint
        # Taylor note, tests/test_mixing_df_adjoint.py)
        r = adjoint_gradient_test(x32, dx, p_adj.objective_f64,
                                  p_adj.gradient, p_adj.inner_product,
                                  epsilon=1e-2, verbose=False)
        assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2

    def test_fused_pair_form_matches_split_calls(self, probs):
        _, p_adj, x0 = probs
        x32 = [jnp.asarray(a, jnp.float32) for a in x0]
        J, g = p_adj.objective_and_gradient(x32)
        g2 = p_adj.gradient(x32)
        for a, b in zip(g, g2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_integrated_cost_adjoint(self):
        """The Integrated (time-summed energy) objective's DF adjoint:
        per-step energy seeds accumulate through the reverse scan."""
        kw = dict(npts=8, n_iters=15, dt=2e-3, rm=1.0, cost="Integrated")
        p64 = KinematicDynamo(KDynConfig(dtype="float64", **kw))
        p_adj = KinematicDynamo(KDynConfig(dtype="float32",
                                           solve_precision="df64",
                                           df_adjoint=True, **kw))
        x0 = [np.asarray(a, np.float64) for a in p64.generate_ic(seed=3)]
        g64 = [np.asarray(g, np.float64) for g in p64.gradient(x0)]
        x32 = [jnp.asarray(a, jnp.float32) for a in x0]
        g_adj = [np.asarray(g, np.float64) for g in p_adj.gradient(x32)]
        for ga, gt in zip(g_adj, g64):
            rel = np.linalg.norm(ga - gt) / np.linalg.norm(gt)
            assert rel < 1e-6, rel
