"""Cross-validation: JAX autodiff gradient vs the numpy hand-rolled
discrete adjoint, and forward trajectory parity (SURVEY.md section 4
item d — small-N end-to-end parity runs)."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

# anchored on this file, not the cwd, so collection works from anywhere
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "baselines"))
from sh23_numpy import SH23Numpy, generate_ic_like  # noqa: E402

from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg


@pytest.fixture(scope="module")
def pair():
    cfg = SH23Config(npts=64, n_iters=80, dt=0.05, e0=0.0725)
    jx = SwiftHohenberg(cfg)
    npy = SH23Numpy(npts=64, dt=0.05, n_iters=80)
    return jx, npy


def test_forward_objective_parity(pair):
    jx, npy = pair
    u0 = generate_ic_like(npts=64, seed=42, e0=0.0725)
    J_np = npy.forward(u0)
    J_jx = float(jx.objective([jnp.asarray(u0)]))
    np.testing.assert_allclose(J_jx, J_np, rtol=1e-12)


def test_gradient_parity_autodiff_vs_handrolled(pair):
    """jax.grad of the discrete forward must equal the explicitly
    constructed reverse sweep (the reference's Discrete adjoint path,
    `FWD_Solve_SH23.py:598-729`, incl. Compatib_Cond and the final
    inversion undo — all of which are the VJP of the SBDF1 step)."""
    jx, npy = pair
    u0 = generate_ic_like(npts=64, seed=42, e0=0.0725)
    g_np = npy.gradient(u0)
    g_jx = np.asarray(jx.gradient([jnp.asarray(u0)])[0])
    np.testing.assert_allclose(g_jx, g_np, rtol=1e-9, atol=1e-12)


def test_numpy_adjoint_transpose_identities():
    """<D c, v> == <c, D^T v> and <Q v, b> == <v, Q^T b> exactly."""
    npy = SH23Numpy(npts=32, n_iters=1)
    rng = np.random.RandomState(1)
    c = rng.randn(npy.K) + 1j * rng.randn(npy.K)
    c[0] = c[0].real
    v = rng.randn(npy.mg)
    lhs = np.sum(npy.D(c) * v)
    rhs = np.sum((np.conj(c) * npy.DT(v)).real)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)

    b = rng.randn(npy.K) + 1j * rng.randn(npy.K)
    lhs = np.sum((np.conj(npy.Q(v)) * b).real)
    rhs = np.sum(v * npy.QT(b))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_shb23_baseline_gradient_parity():
    """numpy propagator reverse sweep == jax autodiff for SHB23."""
    from shb23_numpy import SHB23Numpy

    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config,
        SwiftHohenbergBounded,
    )

    p = SwiftHohenbergBounded(SHB23Config(npts=96, n_iters=50))
    sim = SHB23Numpy(npts=96, n_iters=50)
    x0 = p.generate_ic(seed=42)
    u0 = np.asarray(x0[0])
    np.testing.assert_allclose(sim.forward(u0), float(p.objective(x0)), rtol=1e-13)
    np.testing.assert_allclose(
        sim.gradient(u0), np.asarray(p.gradient(x0)[0]), rtol=1e-10
    )


@pytest.mark.parametrize("s", [0, 1])
def test_mixing_baseline_gradient_parity(s):
    """numpy conjugate-transpose reverse sweep == jax autodiff for the
    mixing problem (both objectives)."""
    from mixing_numpy import MixingNumpy

    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    p = OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=15, dt=5e-3, s=s))
    sim = MixingNumpy(nx=32, nz=24, n_iters=15, dt=5e-3, s=s)
    x0 = p.generate_ic(seed=42)
    x = np.asarray(x0[0], np.float64)
    np.testing.assert_allclose(sim.forward(x), float(p.objective(x0)), rtol=1e-12)
    np.testing.assert_allclose(
        sim.gradient(x), np.asarray(p.gradient(x0)[0]), rtol=1e-9, atol=1e-14
    )


def test_full_optimisation_loop_parity_vs_numpy_baseline(pair):
    """Full-loop cross-validation (VERDICT r2 item 7): drive the host
    optimiser with the numpy baseline's hand-rolled f/grad callables and
    with the JAX problem, and require iterate-for-iterate trajectory
    parity — an independent end-to-end check of the ENTIRE
    optimiser+adjoint stack (Wolfe line search, CG directions,
    retractions, gradient handoff), in the spirit of the reference's
    scientific-verification culture (`TestGrad.py:5-15`)."""
    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere

    jx, npy = pair
    u0 = generate_ic_like(npts=64, seed=42, e0=0.0725)

    res_j = optimise_on_multi_sphere(
        [jnp.asarray(u0)], jx.radii, jx.objective, jx.gradient,
        jx.inner_product, max_iters=6, alpha_k=np.pi,
        line_search="wolfe", cg=True, verbose=False)

    mg = npy.mg

    def f_np(xs):
        return float(npy.forward(np.asarray(xs[0], float)))

    def g_np(xs):
        return [npy.gradient(np.asarray(xs[0], float))]

    # the IP is the shared geometric contract (must be jax-traceable for
    # the manifold kernels); f/grad stay pure numpy
    res_n = optimise_on_multi_sphere(
        [u0.copy()], jx.radii, f_np, g_np,
        lambda x, y: jnp.sum(x * y) / mg, max_iters=6, alpha_k=np.pi,
        line_search="wolfe", cg=True, verbose=False)

    np.testing.assert_allclose(np.asarray(res_j.function_values),
                               np.asarray(res_n.function_values),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res_j.step_sizes),
                               np.asarray(res_n.step_sizes),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res_j.x_opt[0]),
                               np.asarray(res_n.x_opt[0]),
                               rtol=1e-9, atol=1e-12)


def test_kdyn_full_optimisation_loop_parity_vs_numpy_baseline():
    """Second full-loop cross-validation: the TWO-SPHERE problem (KDyn)
    driven by the hand-rolled numpy fwd/adjoint matches the JAX problem
    iterate-for-iterate through 6 Armijo+CG iterations — independently
    validating the multi-sphere transport/CG/retraction machinery on
    top of the per-solve gradient parity already pinned."""
    import warnings

    from kdyn_numpy import KDynNumpy

    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)

    jx = KinematicDynamo(KDynConfig(npts=12, n_iters=30, dt=1e-3,
                                    dtype="float64",
                                    project_gradients=False))
    npy = KDynNumpy(npts=12, dt=1e-3, n_iters=30)
    x0 = [np.asarray(x) for x in jx.generate_ic(seed=3)]
    kw = dict(max_iters=6, alpha_k=0.5, line_search="armijo", cg=True,
              verbose=False)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res_j = optimise_on_multi_sphere(
            list(x0), jx.radii, jx.objective, jx.gradient,
            jx.inner_product, **kw)

        def f_np(xs):
            return float(npy.forward(np.asarray(xs[0]), np.asarray(xs[1])))

        def g_np(xs):
            gb, gu = npy.gradient(np.asarray(xs[0]), np.asarray(xs[1]))
            return [gb, gu]

        res_n = optimise_on_multi_sphere(
            [x.copy() for x in x0], jx.radii, f_np, g_np,
            lambda a, b: jnp.sum(jnp.mean(a * b, axis=(-3, -2, -1))), **kw)

    assert len(res_j.function_values) == 6
    np.testing.assert_allclose(np.asarray(res_j.function_values),
                               np.asarray(res_n.function_values),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res_j.step_sizes),
                               np.asarray(res_n.step_sizes), rtol=1e-9)
    for a, b in zip(res_j.x_opt, res_n.x_opt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_shb23_full_optimisation_loop_parity_vs_numpy_baseline():
    """Third full-loop cross-validation: the Chebyshev-bounded problem
    driven by the hand-rolled numpy propagator/reverse-sweep matches the
    JAX problem iterate-for-iterate — the weighted (non-uniform
    quadrature) inner product exercises the geometry kernels on a metric
    the SH23/KDyn loops do not."""
    import warnings

    from shb23_numpy import SHB23Numpy

    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
        SHB23Config,
        SwiftHohenbergBounded,
    )

    jx = SwiftHohenbergBounded(SHB23Config(npts=96, n_iters=50))
    npy = SHB23Numpy(npts=96, n_iters=50)
    x0 = jx.generate_ic(seed=42)
    u0 = np.asarray(x0[0], np.float64)
    kw = dict(max_iters=5, alpha_k=5.0, line_search="wolfe", cg=True,
              verbose=False)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res_j = optimise_on_multi_sphere(
            [jnp.asarray(u0)], jx.radii, jx.objective, jx.gradient,
            jx.inner_product, **kw)

        def f_np(xs):
            return float(npy.forward(np.asarray(xs[0], float)))

        def g_np(xs):
            return [npy.gradient(np.asarray(xs[0], float))]

        # f/grad are pure numpy; the problem's weighted inner product is
        # the shared geometric contract (Clenshaw-Curtis/trapezoid
        # quadrature — a genuinely non-uniform metric)
        res_n = optimise_on_multi_sphere(
            [u0.copy()], jx.radii, f_np, g_np, jx.inner_product, **kw)

    assert len(res_j.function_values) >= 3
    np.testing.assert_allclose(np.asarray(res_j.function_values),
                               np.asarray(res_n.function_values),
                               rtol=1e-11)
    np.testing.assert_allclose(np.asarray(res_j.step_sizes),
                               np.asarray(res_n.step_sizes), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_j.x_opt[0]),
                               np.asarray(res_n.x_opt[0]),
                               rtol=1e-8, atol=1e-12)


def test_mixing_full_optimisation_loop_parity_vs_numpy_baseline():
    """Fourth full-loop cross-validation: the 2D Boussinesq mixing
    problem (s=1 mix-norm minimisation — the one MINIMISATION workload,
    plus the per-kx tau-solve stack) driven by the hand-rolled numpy
    fwd/reverse sweep matches the JAX problem iterate-for-iterate. With
    this, all four PDE problems are pinned end-to-end against fully
    independent gradient implementations."""
    import warnings

    from mixing_numpy import MixingNumpy

    from spheremanopt_tpu.optim.optimiser import optimise_on_multi_sphere
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    jx = OptimalMixing(MixingConfig(nx=16, nz=8, n_iters=20, prep_steps=3,
                                    s=1, dtype="float64"))
    npy = MixingNumpy(nx=16, nz=8, n_iters=20)
    x0 = jx.generate_ic(seed=3)
    u0 = np.asarray(x0[0], np.float64)
    kw = dict(max_iters=4, alpha_k=10.0, line_search="armijo", cg=True,
              verbose=False)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res_j = optimise_on_multi_sphere(
            [jnp.asarray(u0)], jx.radii, jx.objective, jx.gradient,
            jx.inner_product, **kw)

        def f_np(xs):
            return float(npy.forward(np.asarray(xs[0], float)))

        def g_np(xs):
            return [npy.gradient(np.asarray(xs[0], float))]

        res_n = optimise_on_multi_sphere(
            [u0.copy()], jx.radii, f_np, g_np, jx.inner_product, **kw)

    assert len(res_j.function_values) == 4
    np.testing.assert_allclose(np.asarray(res_j.function_values),
                               np.asarray(res_n.function_values),
                               rtol=1e-11)
    np.testing.assert_allclose(np.asarray(res_j.step_sizes),
                               np.asarray(res_n.step_sizes), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_j.x_opt[0]),
                               np.asarray(res_n.x_opt[0]),
                               rtol=1e-8, atol=1e-12)


def test_kdyn_numpy_integrated_gradient_matches_autodiff():
    """Per-solve parity of the hand-rolled KDyn reverse sweep vs jax
    autodiff for cost='Integrated' — the branch nothing else constructs
    (self-review r3 coverage hole; previously only the Final-cost
    optimiser-loop test and the non-pytest truth maker exercised the
    baseline gradient)."""
    from kdyn_numpy import KDynNumpy

    from spheremanopt_tpu.problems.kinematic_dynamo import (KDynConfig,
                                                            KinematicDynamo)

    p = KinematicDynamo(KDynConfig(npts=12, n_iters=30, dt=1e-3,
                                   cost="Integrated",
                                   project_gradients=False))
    x0 = [np.asarray(v) for v in p.generate_ic(seed=2)]
    J, g = p.objective_and_gradient(x0)

    sim = KDynNumpy(npts=12, dt=1e-3, n_iters=30, cost="Integrated")
    J_np = sim.forward(x0[0], x0[1])
    np.testing.assert_allclose(float(J), J_np, rtol=1e-12)
    gb_np, gu_np = sim.gradient(x0[0], x0[1])
    np.testing.assert_allclose(np.asarray(g[0]), gb_np, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g[1]), gu_np, rtol=1e-9, atol=1e-12)


def test_kdyn_numpy_transform_transpose_identities():
    """<D c, v>_grid == Re<c, D^T v> and <Q v, b> == <v, Q^T b> under the
    PLAIN real pairing sum(re*re + im*im) over the retained band — the
    3-D analogue of test_numpy_adjoint_transpose_identities (guards the
    wD/wQ transpose weights, incl. the even-n Nyquist bin fixed r3)."""
    from kdyn_numpy import KDynNumpy

    sim = KDynNumpy(npts=12, dt=1e-3, n_iters=1)
    rng = np.random.RandomState(0)
    shape_c = (3, sim.n, sim.n, sim.n // 2 + 1)
    c = (rng.randn(*shape_c) + 1j * rng.randn(*shape_c)) * sim.keep
    b = (rng.randn(*shape_c) + 1j * rng.randn(*shape_c)) * sim.keep
    v = rng.randn(3, sim.mg, sim.mg, sim.mg)

    def ip_c(a, d):
        return float(np.sum(a.real * d.real + a.imag * d.imag))

    dt_v = sim.DT(v)
    np.testing.assert_allclose(float(np.sum(sim.D(c) * v)), ip_c(c, dt_v),
                               rtol=1e-11)
    np.testing.assert_allclose(ip_c(sim.Q(v), b),
                               float(np.sum(v * sim.QT(b))), rtol=1e-11)
