"""Device-resident (single-jit) optimisation driver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg


@pytest.fixture(scope="module")
def pca():
    return PCAProblem(random_spd_matrix(48, seed=3))


def _f_and_g(p):
    def f_and_g(xs):
        return p._objective_impl(xs), p._gradient_impl(xs)

    return f_and_g


@pytest.mark.parametrize("cg", [True, False])
def test_pca_converges_on_device(pca, cg):
    opt = jit_optimise_on_multi_sphere(
        _f_and_g(pca), pca.inner_product, [1.0],
        max_iters=800, alpha0=1.0, cg=cg, err_tol=1e-9,
    )
    x0 = [jnp.asarray(np.random.RandomState(7).rand(48))]
    res = opt(x0)
    v = pca.ground_truth()
    err = np.linalg.norm(np.abs(v) - np.abs(np.asarray(res.x_opt[0])))
    assert err < 1e-5, err
    # constraint held
    assert np.isclose(float(jnp.dot(res.x_opt[0], res.x_opt[0])), 1.0, rtol=1e-12)
    # histories consistent: J increases (recorded as -J of a decreasing J)
    k = int(res.iterations)
    jh = np.asarray(res.function_values[:k])
    assert (np.diff(jh) > -1e-12).all()


def test_convergence_masking_freezes_state(pca):
    """After convergence the remaining fori iterations must be no-ops
    (step sizes zero, x unchanged)."""
    opt = jit_optimise_on_multi_sphere(
        _f_and_g(pca), pca.inner_product, [1.0],
        max_iters=600, alpha0=1.0, cg=True, err_tol=1e-6,
    )
    x0 = [jnp.asarray(np.random.RandomState(1).rand(48))]
    res = opt(x0)
    k = int(res.iterations)
    assert k < 600
    assert float(jnp.abs(res.step_sizes[k:]).max()) == 0.0
    # residual at stop below tolerance
    assert float(res.residuals[k - 1].max()) < 1e-5


def test_sh23_on_device_matches_host_direction(tmp_path):
    """The jitted driver must make the same kind of progress as the host
    driver on SH23 (not bitwise: different line searches)."""
    p = SwiftHohenberg(SH23Config(npts=48, n_iters=50, dt=0.05))
    x0 = p.generate_ic(seed=42)
    opt = jit_optimise_on_multi_sphere(
        lambda xs: p._obj_and_grad(xs), p.inner_product, p.radii,
        max_iters=6, alpha0=float(np.pi), cg=True,
    )
    res = opt(x0)
    jh = np.asarray(res.function_values[: int(res.iterations)])
    assert jh[-1] > jh[0]
    xo = res.x_opt[0]
    assert np.isclose(float(p.inner_product(xo, xo)), p.cfg.e0, rtol=1e-6)


def test_two_sphere_device_driver():
    m1 = random_spd_matrix(24, seed=5)
    m2 = random_spd_matrix(16, seed=6)
    p1, p2 = PCAProblem(m1), PCAProblem(m2)

    def f_and_g(xs):
        J = p1._objective_impl([xs[0]]) + p2._objective_impl([xs[1]])
        return J, [p1._gradient_impl([xs[0]])[0], p2._gradient_impl([xs[1]])[0]]

    opt = jit_optimise_on_multi_sphere(
        f_and_g, p1.inner_product, [1.0, 1.0],
        max_iters=2000, alpha0=1.0, cg=True, err_tol=1e-8,
    )
    x0 = [jnp.asarray(np.random.RandomState(1).rand(24)),
          jnp.asarray(np.random.RandomState(2).rand(16))]
    res = opt(x0)
    e1 = np.linalg.norm(np.abs(p1.ground_truth()) - np.abs(np.asarray(res.x_opt[0])))
    e2 = np.linalg.norm(np.abs(p2.ground_truth()) - np.abs(np.asarray(res.x_opt[1])))
    assert e1 < 1e-4 and e2 < 1e-4, (e1, e2)


def test_vmapped_batch_sweep_matches_unbatched():
    """jax.vmap over the whole device driver (the batched-sweep
    capability, examples/sh23_batch_sweep.py): every row of a vmapped
    multi-E0 sweep equals its unbatched run exactly."""
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    p = SwiftHohenberg(SH23Config(npts=64, n_iters=50, dt=0.05))
    opt = jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=4, alpha0=float(np.pi), cg=True, line_search="wolfe")
    x0s = jnp.stack([p.generate_ic(seed=s)[0] for s in range(3)])
    e0s = jnp.asarray([0.02, 0.0725, 0.1])
    res = jax.jit(jax.vmap(lambda x, r: opt([x], radii_dyn=[r])))(x0s, e0s)
    for i in range(3):
        r1 = opt([x0s[i]], radii_dyn=[e0s[i]])
        np.testing.assert_allclose(np.asarray(res.function_values[i]),
                                   np.asarray(r1.function_values),
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(res.x_opt[0][i]),
                                   np.asarray(r1.x_opt[0]),
                                   rtol=1e-9, atol=1e-12)


def test_vmapped_mixing_sweep_with_aux_operand_matches_unbatched():
    """Batched mixing optimisations share ONE operator-stack operand:
    `jax.vmap(..., in_axes=(0, 0, None))` threads the per-kx solve
    stacks through the driver jit unbatched (broadcast), so a B-point
    E0 sweep reads the operators once per step for the WHOLE batch.
    Every row must equal its unbatched run
    (examples/mixing_e0_sweep.py; measured +15% throughput at B=8 —
    the value is the one-executable study, see the example docstring)."""
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)

    p = OptimalMixing(MixingConfig(nx=16, nz=16, n_iters=16,
                                   prep_steps=4, s=1))
    fg, ops = p.objective_and_gradient_aux
    opt = jit_optimise_on_multi_sphere(
        fg, p.inner_product, p.radii,
        max_iters=3, alpha0=10.0, cg=True, line_search="wolfe")
    x0s = jnp.stack([p.generate_ic(seed=s)[0] for s in range(2)])
    e0s = jnp.asarray([0.02, 0.05])
    batched = jax.jit(jax.vmap(
        lambda x, r, a: opt([x], radii_dyn=[r], aux=a),
        in_axes=(0, 0, None)))
    res = batched(x0s, e0s, ops)
    for i in range(2):
        r1 = opt([x0s[i]], radii_dyn=[e0s[i]], aux=ops)
        np.testing.assert_allclose(np.asarray(res.function_values[i]),
                                   np.asarray(r1.function_values),
                                   rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(np.asarray(res.x_opt[0][i]),
                                   np.asarray(r1.x_opt[0]),
                                   rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("make", [
    lambda m: SwiftHohenberg(SH23Config(
        npts=48, n_iters=40, dt=0.05, dtype="float32", method=m)),
    lambda m: __import__(
        "spheremanopt_tpu.problems.swift_hohenberg_bounded",
        fromlist=["SwiftHohenbergBounded"],
    ).SwiftHohenbergBounded(__import__(
        "spheremanopt_tpu.problems.swift_hohenberg_bounded",
        fromlist=["SHB23Config"],
    ).SHB23Config(npts=96, n_iters=40, dtype="float32", method=m)),
], ids=["sh23", "shb23"])
def test_pallas_method_drives_device_loop(make):
    """The VMEM-resident kernel objectives compose with the single-jit
    device driver (production path: bench headline runs method='pallas'):
    Wolfe+CG trajectory tracks the matmul path at the f32 class."""
    pm, pp = make("matmul"), make("pallas")
    x0 = pm.generate_ic(seed=3)

    def run(p):
        opt = jit_optimise_on_multi_sphere(
            p.objective_and_gradient, p.inner_product, p.radii,
            max_iters=4, alpha0=1.0, cg=True, line_search="wolfe")
        res = opt([jnp.asarray(x0[0], jnp.float32)])
        k = int(res.iterations)
        return np.asarray(res.function_values[:k]), np.asarray(res.x_opt[0])

    jm, xm = run(pm)
    jp, xp = run(pp)
    assert len(jp) == len(jm)
    np.testing.assert_allclose(jp, jm, rtol=2e-4)
    np.testing.assert_allclose(xp, xm, rtol=0, atol=5e-4)


def test_device_loop_serves_multiple_rm_from_one_executable():
    """One compiled device-loop executable must serve every magnetic
    Reynolds number via the traced-ops operand (the design behind
    examples/kdyn_critical_rm.py): for each Rm, the aux-driven loop's
    trajectory matches a loop compiled from a problem CONSTRUCTED at
    that Rm."""
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)

    cfg = dict(npts=8, n_iters=20, dt=2e-3, dtype="float64")
    p = KinematicDynamo(KDynConfig(rm=1.0, **cfg))
    fg, make_ops = p.objective_and_gradient_rm
    opt_aux = jit_optimise_on_multi_sphere(
        fg, p.inner_product, [1.0, 1.0], max_iters=4, alpha0=5.0,
        cg=True, line_search="wolfe", err_tol=1e-12)
    x0 = [jnp.asarray(np.asarray(x)) for x in p.generate_ic(seed=6)]

    js = {}
    for rm in (1.0, 4.0):
        res_aux = opt_aux(x0, aux=make_ops(rm))   # SAME executable
        p_rm = KinematicDynamo(KDynConfig(rm=rm, **cfg))
        opt_rm = jit_optimise_on_multi_sphere(
            p_rm.objective_and_gradient, p_rm.inner_product, [1.0, 1.0],
            max_iters=4, alpha0=5.0, cg=True, line_search="wolfe",
            err_tol=1e-12)
        res_rm = opt_rm(x0)
        np.testing.assert_allclose(np.asarray(res_aux.function_values),
                                   np.asarray(res_rm.function_values),
                                   rtol=1e-12, err_msg=f"rm={rm}")
        np.testing.assert_allclose(np.asarray(res_aux.step_sizes),
                                   np.asarray(res_rm.step_sizes),
                                   rtol=1e-10, err_msg=f"rm={rm}")
        js[rm] = float(np.asarray(res_aux.function_values)[-1])
    assert js[1.0] != js[4.0]  # Rm genuinely flowed through the operand
