"""End-to-end sharded optimisation: the full device-resident SD/CG loop
running with PDE state sharded over an 8-device mesh.

This is the TPU counterpart of the reference's only distributed run mode
(`mpiexec -np 4 python3 FWD_Solve_SH23.py`, README.md:79-83): the entire
optimisation — forward scans, adjoint sweeps, line searches, retractions
— executes under GSPMD with the fields spatially decomposed, and the
trajectory must match the single-device run (same algorithm, only the
layout differs).
"""

import jax
import numpy as np
import pytest

from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
from spheremanopt_tpu.parallel.mesh import field_sharding, make_mesh, shard_fields
from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo


@pytest.fixture(scope="module")
def kdyn():
    # npts=16 -> oversampled grid mg=24, divisible by the 8-device mesh
    cfg = KDynConfig(npts=16, n_iters=5, dt=1e-3, dtype="float64", remat=True)
    return KinematicDynamo(cfg)


def _optimiser(p, max_iters):
    return jit_optimise_on_multi_sphere(
        p.objective_and_gradient, p.inner_product, p.radii,
        max_iters=max_iters, alpha0=0.5, cg=True, err_tol=1e-12,
    )


def test_sharded_trajectory_matches_single_device(kdyn, eight_devices):
    p = kdyn
    opt = _optimiser(p, max_iters=10)
    x0 = p.generate_ic(seed=3)

    # single-device run: everything committed to one device
    x0_single = [jax.device_put(np.asarray(x), eight_devices[0]) for x in x0]
    res_1 = opt(x0_single)

    # sharded run: first spatial axis decomposed over the mesh
    mesh = make_mesh(8)
    x0_sharded = shard_fields(mesh, [np.asarray(x) for x in x0], sharded_dim=1)
    res_8 = opt(x0_sharded)

    # the optimisation state stayed sharded end-to-end
    assert len(res_8.x_opt[0].sharding.device_set) == 8, res_8.x_opt[0].sharding

    j1 = np.asarray(res_1.function_values)
    j8 = np.asarray(res_8.function_values)
    # identical algorithm, different layout: trajectories agree to
    # reduction-reordering noise (f64)
    np.testing.assert_allclose(j8, j1, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res_8.step_sizes), np.asarray(res_1.step_sizes),
        rtol=1e-9, atol=1e-12,
    )
    for a, b in zip(res_8.x_opt, res_1.x_opt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-10)

    # and it actually optimised: J increased (reference's -J convention
    # records an increasing series) with both spheres' constraints held
    assert j8[-1] > j8[0]
    for x, r in zip(res_8.x_opt, p.radii):
        assert np.isclose(float(p.inner_product(x, x)), r, rtol=1e-10)


def test_sharded_gradient_matches_single_device(kdyn, eight_devices):
    """The fused objective+gradient itself (fwd scan + adjoint) under
    GSPMD must equal the single-device values."""
    p = kdyn
    x0 = p.generate_ic(seed=11)
    x0_np = [np.asarray(x) for x in x0]

    J1, g1 = p.objective_and_gradient(
        [jax.device_put(x, eight_devices[0]) for x in x0_np])

    mesh = make_mesh(8)
    xs = shard_fields(mesh, x0_np, sharded_dim=1)
    sh = field_sharding(mesh, 4, 1)
    f = jax.jit(p.objective_and_gradient, in_shardings=(sh,),
                out_shardings=None)
    J8, g8 = f(xs)

    np.testing.assert_allclose(float(J8), float(J1), rtol=1e-12)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
