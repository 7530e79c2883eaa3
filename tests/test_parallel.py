"""Distributed FFT / mesh tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.parallel.fft import (
    distributed_irfftn,
    distributed_mean_product,
    distributed_rfftn,
)
from spheremanopt_tpu.parallel.mesh import field_sharding, make_mesh, shard_fields


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return make_mesh(8)


def test_distributed_rfftn_matches_local(mesh):
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(16, 8, 8))
    v_sh = jax.device_put(v, field_sharding(mesh, 3, 0))
    c = distributed_rfftn(v_sh, mesh)
    c_ref = jnp.fft.fft(jnp.fft.fft(jnp.fft.rfft(v, axis=-1), axis=-2), axis=-3)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-10)
    # output sharded over Y
    assert "x" in str(c.sharding.spec)


def test_distributed_roundtrip(mesh):
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(8, 16, 12))
    v_sh = jax.device_put(v, field_sharding(mesh, 3, 0))
    c = distributed_rfftn(v_sh, mesh)
    back = distributed_irfftn(c, mesh, n_z=12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-12)


def test_distributed_batched_fields(mesh):
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(3, 8, 8, 8))  # vector field
    v_sh = jax.device_put(v, field_sharding(mesh, 4, 1))
    c = distributed_rfftn(v_sh, mesh)
    c_ref = jnp.fft.fft(jnp.fft.fft(jnp.fft.rfft(v, axis=-1), axis=-2), axis=-3)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-10)


def test_distributed_mean_product(mesh):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 4, 4))
    y = jnp.asarray(rng.randn(8, 4, 4))
    xs, ys = shard_fields(mesh, [x, y], sharded_dim=0)
    got = float(distributed_mean_product(xs, ys, mesh))
    np.testing.assert_allclose(got, float(jnp.mean(x * y)), rtol=1e-12)


def test_jit_and_grad_through_distributed_fft(mesh):
    """The distributed transform must be differentiable under jit so it
    can sit inside sharded forward solves."""
    rng = np.random.RandomState(4)
    v = jnp.asarray(rng.randn(8, 8, 8))
    v_sh = jax.device_put(v, field_sharding(mesh, 3, 0))

    @jax.jit
    def energy(v):
        c = distributed_rfftn(v, mesh)
        return jnp.sum(jnp.abs(c) ** 2)

    g = jax.grad(energy)(v_sh)
    # Parseval: d/dv sum|F v|^2 = 2 N v for the full fft... verify against
    # the local autodiff of the same expression
    @jax.jit
    def energy_local(v):
        c = jnp.fft.fft(jnp.fft.fft(jnp.fft.rfft(v, axis=-1), axis=-2), axis=-3)
        return jnp.sum(jnp.abs(c) ** 2)

    g_ref = jax.grad(energy_local)(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-9)


def test_kdyn_distributed_transform_in_step_path(eight_devices):
    """transform="distributed" (pencil-decomposed shard_map rfftn with
    all_to_all transposes) as the PRODUCTION step path: J and the fused
    gradient at a 16^3 config match the matmul-transform problem to
    roundoff on the 8-device mesh, and the IC pipeline itself runs
    through the distributed transforms (VERDICT round-1 item 10)."""
    import jax.numpy as jnp

    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig,
        KinematicDynamo,
    )

    cfg = dict(npts=16, n_iters=5, dt=1e-3, dtype="float64",
               project_gradients=False)
    pm = KinematicDynamo(KDynConfig(transform="matmul", **cfg))
    pd = KinematicDynamo(KDynConfig(transform="distributed", n_shards=8,
                                    **cfg))

    x0 = pm.generate_ic(seed=11)
    x0d = pd.generate_ic(seed=11)
    # identical IC through either transform pipeline
    for a, b in zip(x0, x0d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-13)

    Jm, gm = pm.objective_and_gradient(x0)
    Jd, gd = pd.objective_and_gradient(x0)
    np.testing.assert_allclose(float(Jd), float(Jm), rtol=1e-12)
    for a, b in zip(gd, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_distributed_rfftn_2d_matches_dense(eight_devices):
    """2-D pencil decomposition (x,y process mesh): exact vs rfftn on a
    2x4 mesh, batched, including an odd (never-sharded) Z extent."""
    from spheremanopt_tpu.parallel.fft import (distributed_irfftn_2d,
                                               distributed_rfftn_2d)
    from spheremanopt_tpu.parallel.mesh import make_mesh2d

    rng = np.random.RandomState(3)
    for (px, py), shape in [((2, 4), (3, 24, 24, 24)),
                            ((4, 2), (16, 16, 17))]:
        mesh = make_mesh2d(px, py)
        v = jnp.asarray(rng.randn(*shape))
        c = distributed_rfftn_2d(v, mesh)
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(jnp.fft.rfftn(v, axes=(-3, -2, -1))),
            rtol=1e-12, atol=1e-12)
        back = distributed_irfftn_2d(c, mesh, n_z=shape[-1])
        np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                                   rtol=1e-12, atol=1e-12)
    with pytest.raises(ValueError, match="divisible"):
        distributed_rfftn_2d(jnp.zeros((12, 12, 12)), make_mesh2d(2, 4))


def test_kdyn_2d_pencil_objective_and_gradient_parity(eight_devices):
    """KDyn with transform='distributed' on a 2x4 PENCIL mesh
    (mesh_shape=(2,4)) matches the single-device matmul path: J and both
    gradients — the scaling layout for chip counts past the slab limit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spheremanopt_tpu.parallel.mesh import make_mesh2d
    from spheremanopt_tpu.problems.kinematic_dynamo import (KDynConfig,
                                                            KinematicDynamo)

    kw = dict(npts=16, n_iters=5, dt=1e-3, dtype="float64", remat=True)
    p1 = KinematicDynamo(KDynConfig(**kw))
    p2 = KinematicDynamo(KDynConfig(**kw, transform="distributed",
                                    mesh_shape=(2, 4)))
    x0 = [np.asarray(v) for v in p1.generate_ic(seed=6)]
    mesh = make_mesh2d(2, 4)
    sh = NamedSharding(mesh, P(None, "x", "y", None))
    xs = [jax.device_put(v, sh) for v in x0]

    J1, g1 = p1.objective_and_gradient(x0)
    J2, g2 = p2.objective_and_gradient(xs)
    np.testing.assert_allclose(float(J2), float(J1), rtol=1e-12)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)
