"""df64 (f64-emulated) mixing mode: accuracy vs in-process f64 truth.

The engine's purpose is gradient accuracy beyond the measured f32
floor (BASELINE.md: every f32 pass mode leaves the mixing gradient at
6-9e-2 rel-err at the reference config). Here, at a small config where
the f64 truth is cheap, the df64 path must beat the compensated f32
path by orders of magnitude on BOTH J and the gradient — in pure f32
ops, as the TPU executes them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.problems.optimal_mixing import (
    MixingConfig, OptimalMixing)

KW = dict(nx=32, nz=16, n_iters=30, dt=5e-3, prep_steps=10)


@pytest.fixture(scope="module")
def truth():
    p64 = OptimalMixing(MixingConfig(dtype="float64", **KW))
    x64 = p64.generate_ic(seed=3)
    x32 = np.asarray(x64[0]).astype(np.float32)
    xe = [jnp.asarray(x32.astype(np.float64))]  # the exact f32 point
    J = float(p64.objective(xe))
    g = np.asarray(p64.gradient(xe)[0])
    return x32, J, g


@pytest.fixture(scope="module")
def df_prob():
    return OptimalMixing(MixingConfig(dtype="float32",
                                      solve_precision="df64", **KW))


def test_df64_beats_compensated(truth, df_prob):
    x32, J64, g64 = truth
    Jdf, gdf = df_prob.objective_and_gradient([jnp.asarray(x32)])
    Jdf, gdf = float(Jdf), np.asarray(gdf[0], np.float64)

    pc = OptimalMixing(MixingConfig(dtype="float32",
                                    solve_precision="compensated", **KW))
    Jc, gc = pc.objective_and_gradient([jnp.asarray(x32)])
    Jc, gc = float(Jc), np.asarray(gc[0], np.float64)

    gn = np.linalg.norm(g64)
    relJ_df = abs(Jdf - J64) / abs(J64)
    relg_df = np.linalg.norm(gdf - g64) / gn
    relJ_c = abs(Jc - J64) / abs(J64)
    relg_c = np.linalg.norm(gc - g64) / gn
    # measured at this config: df64 2e-8 / 2.1e-6 vs comp 3.5e-5 / 1.1e-4
    assert relJ_df < 3e-7, relJ_df
    assert relg_df < 3e-5, relg_df
    assert relJ_df < 0.1 * relJ_c
    assert relg_df < 0.2 * relg_c


def test_df64_fused_matches_separate(truth, df_prob):
    x32 = truth[0]
    x = [jnp.asarray(x32)]
    J1 = df_prob.objective_f64(x)  # pair-resolution, like the fused J
    g1 = np.asarray(df_prob.gradient(x)[0])
    J2, g2 = df_prob.objective_and_gradient(x)
    # the fused path reconstructs J from the SAME df pair the separate
    # pair executable produces (both are jit programs of the identical
    # forward graph)
    assert float(J2) == J1, (float(J2), J1)
    np.testing.assert_array_equal(np.asarray(g2[0]), g1)
    # and the f32 scalar objective is the pair rounded to f32
    assert float(np.float32(J2)) == float(df_prob.objective(x))


def test_df64_aux_form_is_df(df_prob, truth):
    # the device-loop driver consumes (fn, ops): df mode must hand it
    # the df executable + slice stacks, not the compensated machinery.
    # The aux J is the f32 SCALAR (the device Wolfe state is f32); the
    # host-facing fused J is the same df pair at full resolution.
    fn, ops = df_prob.objective_and_gradient_aux
    x32 = truth[0]
    J, g = fn(ops, [jnp.asarray(x32)])
    J2, g2 = df_prob.objective_and_gradient([jnp.asarray(x32)])
    assert abs(float(J) - float(J2)) <= 2e-7 * abs(float(J2))
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(g2[0]))


def test_df64_requires_discrete_adjoint():
    with pytest.raises(ValueError, match="df64"):
        OptimalMixing(MixingConfig(dtype="float32",
                                   solve_precision="df64",
                                   adjoint="continuous", **KW))


def test_df64_f64_config_uses_exact_path():
    # under dtype=float64 the df layer is a no-op (f64 is exact); the
    # standard machinery must be selected
    p = OptimalMixing(MixingConfig(dtype="float64",
                                   solve_precision="df64", **KW))
    assert p._dfe is None and p._smode == "exact"


def test_df64_taylor_second_order(df_prob, truth):
    """Taylor-remainder check of the df64 gradient against the df64
    objective itself (architecture invariant: every gradient change
    needs one). The df objective is accurate to ~1e-8 so remainders at
    eps=1e-2..1e-3 resolve O(eps^2) cleanly in f32."""
    x32 = truth[0]
    x = [jnp.asarray(x32)]
    # J at pair resolution: f32-scalar J rounds to ~4e-9 absolute,
    # below the Taylor increments at these eps
    J0 = df_prob.objective_f64(x)
    g = df_prob.gradient(x)[0]
    rng = np.random.default_rng(7)
    d = rng.standard_normal(x32.shape).astype(np.float32)
    d /= np.linalg.norm(d)
    # <grad, dx> under the problem inner product (Riesz form: grad was
    # divided by the IP weights, so IP(grad, d) = dJ[d])
    slope = float(df_prob.inner_product(g, jnp.asarray(d)))
    rems = []
    for eps in (1e-1, 5e-2, 2.5e-2):
        J1 = df_prob.objective_f64([jnp.asarray(x32 + eps * d)])
        rems.append(abs(J1 - J0 - eps * slope))
    orders = [np.log(rems[i] / rems[i + 1]) / np.log(2.0)
              for i in range(len(rems) - 1)]
    assert all(o > 1.7 for o in orders), (rems, orders)


def test_cli_precision_flag_selects_df64():
    """--precision df64 reaches MixingConfig and activates the engine;
    the host search consumes pair-resolution J (run.py wiring)."""
    from spheremanopt_tpu.run import build_parser, make_problem

    args = build_parser().parse_args(
        ["mixing", "--platform", "cpu", "--precision", "df64",
         "--dtype", "float32", "--nx", "16", "--nz", "8",
         "--n-iters", "4", "--df-n-bits", "32"])
    p, _x0, _defaults = make_problem(args)
    assert p.cfg.solve_precision == "df64"
    assert p.cfg.df_n_bits == 32
    assert p._dfe is not None
    assert callable(p.objective_f64)


def test_df64_n_bits_and_slice_dtype_knobs(truth, df_prob):
    """The accuracy/cost dials: df_n_bits=32 drops slice-pair passes
    (q 6 -> 4) yet must stay orders beyond the f32 floor at this
    config; df_slice_dtype='bfloat16' is EXACT (slices carry <= 8
    significand bits) so its output must match the f32-stored default
    bit-for-bit."""
    x32, J64, g64 = truth
    x = [jnp.asarray(x32)]

    p32 = OptimalMixing(MixingConfig(dtype="float32",
                                     solve_precision="df64",
                                     df_n_bits=32, **KW))
    assert p32._dfe._oS.re.slices_np.shape[0] < \
        df_prob._dfe._oS.re.slices_np.shape[0]
    J, g = p32.objective_and_gradient(x)
    relJ = abs(float(J) - J64) / abs(J64)
    relg = (np.linalg.norm(np.asarray(g[0], np.float64) - g64)
            / np.linalg.norm(g64))
    # measured at this config: 32-bit df lands ~1e-7 / ~3e-6 (the
    # 30-step trajectory amplifies 2^-32 mildly); the floor it must
    # beat is the compensated 3.5e-5 / 1.1e-4
    assert relJ < 3e-6, relJ
    assert relg < 3e-5, relg

    pbf = OptimalMixing(MixingConfig(dtype="float32",
                                     solve_precision="df64",
                                     df_slice_dtype="bfloat16", **KW))
    assert pbf._dfe._oS.re.slices_np.dtype == jnp.bfloat16
    Jb, gb = pbf.objective_and_gradient(x)
    Jd, gd = df_prob.objective_and_gradient(x)
    assert float(Jb) == float(Jd)
    np.testing.assert_array_equal(np.asarray(gb[0]), np.asarray(gd[0]))


def test_df64_batched_einsums_same_accuracy(truth, df_prob):
    """df_batched_einsums reorders the exact-f32 level partial sums
    (t-major batched dots instead of s-major scalar ones) — NOT
    bitwise vs the default, but every slice-pair product is identical
    and the reorder rounding is ~2^-24 of a level, so the result must
    sit at the same df64 accuracy class and within ~1e-6 of the
    default path."""
    x32, J64, g64 = truth
    x = [jnp.asarray(x32)]

    pb = OptimalMixing(MixingConfig(dtype="float32",
                                    solve_precision="df64",
                                    df_batched_einsums=True, **KW))
    Jb, gb = pb.objective_and_gradient(x)
    relJ = abs(float(Jb) - J64) / abs(J64)
    relg = (np.linalg.norm(np.asarray(gb[0], np.float64) - g64)
            / np.linalg.norm(g64))
    assert relJ < 3e-7, relJ
    assert relg < 3e-5, relg

    Jd, gd = df_prob.objective_and_gradient(x)
    assert abs(float(Jb) - float(Jd)) <= 1e-6 * abs(float(Jd))
    num = np.linalg.norm(np.asarray(gb[0], np.float64)
                         - np.asarray(gd[0], np.float64))
    assert num <= 1e-5 * np.linalg.norm(np.asarray(gd[0], np.float64))


def test_df64_device_loop_matches_host_trajectory(df_prob, truth):
    """The single-jit device loop composes with the df64 aux pair
    (slice stacks as jit operands). Parity caveat it must respect: the
    device Wolfe consumes J as an f32 SCALAR while the host search gets
    pair-resolution J (objective_f64) — fine here because the df64
    escape hatch exists for GRADIENT accuracy (the r3 Wolfe wall), and
    at f32-representable decision margins both searches accept the same
    steps. Trajectories must agree to f32-J resolution."""
    from spheremanopt_tpu.optim.jit_driver import (
        jit_optimise_on_multi_sphere)
    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere

    x32 = truth[0]
    fg, ops = df_prob.objective_and_gradient_aux
    opt = jit_optimise_on_multi_sphere(
        fg, df_prob.inner_product, df_prob.radii,
        max_iters=3, alpha0=10.0, cg=True, line_search="wolfe")
    rd = opt([jnp.asarray(x32)], aux=ops)
    kd = int(rd.iterations)

    rh = optimise_on_multi_sphere(
        [jnp.asarray(x32)], df_prob.radii, df_prob.objective_f64,
        df_prob.gradient, df_prob.inner_product, max_iters=3,
        alpha_k=10.0, line_search="wolfe", cg=True,
        f_and_g=df_prob.objective_and_gradient, verbose=False)

    assert kd == rh.iterations, (kd, rh.iterations)
    np.testing.assert_allclose(
        np.asarray(rd.function_values[:kd], np.float64),
        np.asarray(rh.function_values, np.float64)[:kd],
        rtol=2e-6)


def test_df64_s0_objective_accuracy():
    """The s=0 (time-avg KE) df64 path: J and gradient vs f64 truth at
    a small config (the s=1 coverage above; s=0 exercises the df KE
    accumulator riding the scan carry)."""
    kw = dict(KW, s=0)
    p64 = OptimalMixing(MixingConfig(dtype="float64", **kw))
    x32 = np.asarray(p64.generate_ic(seed=5)[0]).astype(np.float32)
    xe = [jnp.asarray(x32.astype(np.float64))]
    J64 = float(p64.objective(xe))
    g64 = np.asarray(p64.gradient(xe)[0])

    pdf = OptimalMixing(MixingConfig(dtype="float32",
                                     solve_precision="df64", **kw))
    Jd, gd = pdf.objective_and_gradient([jnp.asarray(x32)])
    relJ = abs(float(Jd) - J64) / abs(J64)
    relg = (np.linalg.norm(np.asarray(gd[0], np.float64) - g64)
            / np.linalg.norm(g64))
    assert relJ < 3e-7, relJ
    assert relg < 3e-5, relg
