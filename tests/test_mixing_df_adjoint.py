"""Hand-rolled double-float adjoint for mixing (VERDICT r4 item 4).

jax.grad of the df64 forward leaves the reverse sweep in f32 — the
measured 5.9e-4 mixing-gradient floor at the 1000-step reference config
(BASELINE.md r4 s_bwd dead end: f32 cotangent-CARRY propagation). The
`df_adjoint=True` mode evaluates the SAME discrete adjoint with DF
cotangent pairs and exact transposed Ozaki contractions
(mixing_df adjoint section; doublefloat.make_ozaki_contraction /
OzakiOp.apply_T). Reference comparison point: the f64 discrete adjoint
at `FWD_Solve_Poiseuille.py:1320-1650`.

Validation per the architecture invariant for custom_vjp reverse paths:
Taylor order 2.000 on the pair-resolution objective, gradient parity
against in-process f64 truth, exactness of every transposed-op
building block, and the documented-zero operator cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.ops.doublefloat import (
    DF, OzakiComplexOp, OzakiOp, df_from_np, make_ozaki_contraction,
    ozaki_bits,
)


def _df_operand(rng, shape):
    y64 = rng.standard_normal(shape) * np.exp(rng.uniform(-6, 6, shape))
    hi, lo = df_from_np(y64)
    return y64, DF(jnp.asarray(hi), jnp.asarray(lo))


def _resolve(d: DF) -> np.ndarray:
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


class TestTransposedOzaki:
    def test_apply_T_matches_f64_transpose(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((48, 64))
        op = OzakiOp(A, "nz,kzc->knc", "nz,knc->kzc", y_axis=-2,
                     with_transpose=True)
        sl = jnp.asarray(op.slices_np)
        y64, y = _df_operand(rng, (8, 48, 2))
        out = _resolve(op.apply_T(sl, y))
        ref = np.einsum("nz,knc->kzc", A, y64)
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 1e-13, rel   # df64-class, far beyond f32 (1e-7)

    def test_transpose_bounds_slice_bits_over_both_directions(self):
        """Bx at the 256x128 config: fwd K=129 allows b=8 but the
        transposed K=384 needs b<=7 — with_transpose must bound b so
        exact f32 accumulation holds BOTH ways."""
        rng = np.random.default_rng(1)
        A = rng.standard_normal((384, 129))
        op_plain = OzakiOp(A, "jk,kzc->jzc", "jk,jzc->kzc", y_axis=-3)
        op_t = OzakiOp(A, "jk,kzc->jzc", "jk,jzc->kzc", y_axis=-3,
                       with_transpose=True)
        assert op_plain.bits == 8
        assert op_t.bits == min(ozaki_bits(129), ozaki_bits(384)) == 7
        # and the transposed contraction is still df64-exact
        sl = jnp.asarray(op_t.slices_np)
        y64, y = _df_operand(rng, (384, 8, 2))
        out = _resolve(op_t.apply_T(sl, y))
        ref = np.einsum("jk,jzc->kzc", A, y64)
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 1e-13, rel

    def test_contraction_raises_on_exactness_violation(self):
        with pytest.raises(ValueError, match="exactness"):
            make_ozaki_contraction("kj,jz->kz", k=4096, y_axis=-2,
                                   b_override=8)

    def test_complex_adjoint_forms_match_numpy(self):
        """applyT_packed / applyT_to_real / applyT_from_real implement
        A^H on the packed-channel layout exactly."""
        rng = np.random.default_rng(2)
        # packed A^H q on the channel-carrying tau-solve layout (the
        # engine's S/MN use of applyT_packed)
        B = (rng.standard_normal((4, 24, 24))
             + 1j * rng.standard_normal((4, 24, 24)))
        opb = OzakiComplexOp(B, "kij,kjc->kic", "kij,kic->kjc",
                             y_axis=-2, with_transpose=True)
        slb = tuple(jnp.asarray(s) for s in opb.slices_np)
        qb64 = (rng.standard_normal((4, 24))
                + 1j * rng.standard_normal((4, 24)))
        qh, ql = df_from_np(np.stack([qb64.real, qb64.imag], -1))
        qb = DF(jnp.asarray(qh), jnp.asarray(ql))
        out = _resolve(opb.applyT_packed(slb, qb))
        ref_c = np.einsum("kij,ki->kj", B.conj(), qb64)
        ref = np.stack([ref_c.real, ref_c.imag], -1)
        assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 1e-13

        # Re(A^H q) on the channel-less Fx-style layout (per-channel)
        A = rng.standard_normal((24, 32)) + 1j * rng.standard_normal((24, 32))
        op = OzakiComplexOp(A, "kj,jz->kz", "kj,kz->jz", y_axis=-2,
                            with_transpose=True)
        sl = tuple(jnp.asarray(s) for s in op.slices_np)
        q64 = (rng.standard_normal((24, 16))
               + 1j * rng.standard_normal((24, 16)))
        qhi, qlo = df_from_np(np.stack([q64.real, q64.imag], -1))
        q = DF(jnp.asarray(qhi), jnp.asarray(qlo))
        out_r = _resolve(op.applyT_to_real(sl, q))
        ref_r = np.einsum("kj,kz->jz", A.conj(), q64).real
        assert np.linalg.norm(out_r - ref_r) / np.linalg.norm(ref_r) < 1e-13

    def test_complex_adjoint_from_real(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((16, 8)) + 1j * rng.standard_normal((16, 8))
        op = OzakiComplexOp(A, "jk,kzc->jzc", "jk,jzc->kzc", y_axis=-3,
                            with_transpose=True)
        sl = tuple(jnp.asarray(s) for s in op.slices_np)
        q64, q = _df_operand(rng, (16, 4))
        out = _resolve(op.applyT_from_real(sl, q))
        ref_c = np.einsum("jk,jz->kz", A.conj(), q64)
        ref = np.stack([ref_c.real, ref_c.imag], -1)
        assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 1e-13

    def test_apply_T_requires_with_transpose(self):
        op = OzakiOp(np.eye(8), "nz,kzc->knc", "nz,knc->kzc")
        assert op._apply_T is None


@pytest.fixture(scope="module")
def problems():
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    kw = dict(nx=32, nz=16, n_iters=30, dt=1e-2, prep_steps=5, s=1)
    p64 = OptimalMixing(MixingConfig(dtype="float64", **kw))
    p_adj = OptimalMixing(MixingConfig(dtype="float32",
                                       solve_precision="df64",
                                       df_adjoint=True, **kw))
    x0 = np.asarray(p64.generate_ic(seed=3)[0], np.float64)
    return p64, p_adj, x0


class TestDFAdjointGradient:
    def test_matches_f64_truth_at_f32_output_floor(self, problems):
        """The DF-adjoint gradient lands at the f32 OUTPUT-rounding
        floor (~1e-7 class, the gradient contract returns f32 arrays)
        against in-process f64 truth — measured 6.1e-7 here vs 1.7e-6
        for the plain-df64 f32 reverse sweep at this short horizon."""
        p64, p_adj, x0 = problems
        g64 = np.asarray(p64.gradient([x0])[0], np.float64)
        g_adj = np.asarray(
            p_adj.gradient([jnp.asarray(x0, jnp.float32)])[0], np.float64)
        rel = np.linalg.norm(g_adj - g64) / np.linalg.norm(g64)
        assert rel < 1.5e-6, rel

    def test_taylor_order_2(self, problems):
        """gamma2 = 2.000 on the pair-resolution objective — the repo's
        gradient-change invariant, against the hand-rolled DF sweep."""
        from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test

        _, p_adj, x0 = problems
        x32 = [jnp.asarray(x0, jnp.float32)]
        dx = [jnp.asarray(
            np.asarray(p_adj.generate_ic(seed=9)[0]), jnp.float32)]
        # epsilon=1e-2: the hand-rolled adjoint is exact to df/f32-
        # OUTPUT rounding (not symbolically exact like jax.grad), so
        # tiny-eps remainders floor at the ~1e-7-relative gradient
        # accuracy and the order fit degrades (measured gamma2 1.81 at
        # eps=1e-3; 2.0001 at 1e-2 — the quadratic term must dominate
        # the slope's rounding floor)
        r = adjoint_gradient_test(x32, dx, p_adj.objective_f64,
                                  p_adj.gradient, p_adj.inner_product,
                                  epsilon=1e-2, verbose=False)
        assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2

    def test_fused_pair_form_matches_split_calls(self, problems):
        """objective_and_gradient under df_adjoint returns the same
        gradient as problem.gradient and a pair-resolved J equal to
        objective_f64."""
        _, p_adj, x0 = problems
        x32 = [jnp.asarray(x0, jnp.float32)]
        J, g = p_adj.objective_and_gradient(x32)
        np.testing.assert_array_equal(np.asarray(g[0]),
                                      np.asarray(p_adj.gradient(x32)[0]))
        assert float(J) == pytest.approx(p_adj.objective_f64(x32),
                                         rel=1e-12)

    def test_ops_cotangent_is_documented_zero(self, problems):
        """Differentiating w.r.t. the slice stacks returns zeros by
        contract (frozen init-time constants) — same discipline as the
        forward-mode Ozaki ops."""
        _, p_adj, x0 = problems
        eng = p_adj._dfe
        obj_adj, _ = eng._build_adjoint_objective()
        x32 = [jnp.asarray(x0, jnp.float32)]
        g_ops = jax.grad(obj_adj, argnums=0)(p_adj._ops_df, x32)
        flat, _ = jax.tree_util.tree_flatten(g_ops)
        assert all(float(jnp.abs(a).max()) == 0.0 for a in flat)


def test_long_horizon_df_adjoint_beats_f32_reverse_sweep():
    """The separation the mode exists for: at a 200-step horizon the
    plain-df64 gradient (f32 reverse sweep) drifts to ~3.0e-6 vs f64
    truth while the DF-cotangent sweep stays at the f32-OUTPUT floor
    (~3.0e-7, measured) — and the gap widens with horizon (on-chip
    1000-step reference-config measurement rides the bench's
    mixing df64adj row; the plain floor there is 5.9e-4)."""
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    kw = dict(nx=32, nz=16, n_iters=200, dt=1e-2, prep_steps=5, s=1)
    p64 = OptimalMixing(MixingConfig(dtype="float64", **kw))
    x0 = np.asarray(p64.generate_ic(seed=3)[0], np.float64)
    g64 = np.asarray(p64.gradient([x0])[0], np.float64)
    x32 = [jnp.asarray(x0, jnp.float32)]

    p_df = OptimalMixing(MixingConfig(dtype="float32",
                                      solve_precision="df64", **kw))
    g_df = np.asarray(p_df.gradient(x32)[0], np.float64)
    p_adj = OptimalMixing(MixingConfig(dtype="float32",
                                       solve_precision="df64",
                                       df_adjoint=True, **kw))
    g_adj = np.asarray(p_adj.gradient(x32)[0], np.float64)

    rel_df = np.linalg.norm(g_df - g64) / np.linalg.norm(g64)
    rel_adj = np.linalg.norm(g_adj - g64) / np.linalg.norm(g64)
    assert rel_adj < 1e-6, rel_adj
    assert rel_adj < rel_df / 3.0, (rel_adj, rel_df)


def test_df_adjoint_s0_ke_objective():
    """The s=0 (time-integrated KE) objective's DF adjoint: per-step KE
    seeds accumulate through the reverse scan. Pinned against f64 truth
    and Taylor order 2."""
    from spheremanopt_tpu.grad.testgrad import adjoint_gradient_test
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    kw = dict(nx=32, nz=16, n_iters=25, dt=1e-2, prep_steps=5, s=0)
    p64 = OptimalMixing(MixingConfig(dtype="float64", **kw))
    x0 = np.asarray(p64.generate_ic(seed=3)[0], np.float64)
    g64 = np.asarray(p64.gradient([x0])[0], np.float64)

    p_adj = OptimalMixing(MixingConfig(dtype="float32",
                                       solve_precision="df64",
                                       df_adjoint=True, **kw))
    x32 = [jnp.asarray(x0, jnp.float32)]
    g_adj = np.asarray(p_adj.gradient(x32)[0], np.float64)
    rel = np.linalg.norm(g_adj - g64) / np.linalg.norm(g64)
    assert rel < 2e-6, rel

    dx = [jnp.asarray(np.asarray(p_adj.generate_ic(seed=9)[0]),
                      jnp.float32)]
    r = adjoint_gradient_test(x32, dx, p_adj.objective_f64,
                              p_adj.gradient, p_adj.inner_product,
                              epsilon=1e-2, verbose=False)
    assert abs(r.gamma2 - 2.0) < 0.05, r.gamma2
