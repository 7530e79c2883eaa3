"""Unit tests for the sphere geometry primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.manifold import sphere as geom


def dot_ip(x, y):
    return jnp.dot(x, y)


def mean_ip(x, y):
    return jnp.mean(x * y)


@pytest.mark.parametrize("ip", [dot_ip, mean_ip])
@pytest.mark.parametrize("radius", [1.0, 0.0725])
def test_retract_lands_on_sphere(ip, radius):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (64,))
    d = jax.random.normal(jax.random.PRNGKey(1), (64,))
    x = geom.normalise_sphere(x, radius, ip)
    y = geom.retract(x, 0.37, d, radius, ip)
    assert np.isclose(float(ip(y, y)), radius, rtol=1e-12)


@pytest.mark.parametrize("ip", [dot_ip, mean_ip])
def test_tangent_project_orthogonal(ip):
    x = jax.random.normal(jax.random.PRNGKey(2), (128,))
    v = jax.random.normal(jax.random.PRNGKey(3), (128,))
    g = geom.tangent_project(x, v, ip)
    assert abs(float(ip(x, g))) < 1e-12
    # Projection is idempotent.
    g2 = geom.tangent_project(x, g, ip)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-12)


def test_transport_lands_in_tangent_plane():
    ip = mean_ip
    x = geom.normalise_sphere(jax.random.normal(jax.random.PRNGKey(4), (32,)), 2.0, ip)
    d = jax.random.normal(jax.random.PRNGKey(5), (32,))
    t = geom.transport(x, d, ip)
    assert abs(float(ip(x, t))) < 1e-12


def test_retract_zero_step_is_identity():
    ip = dot_ip
    x = geom.normalise_sphere(jnp.arange(1.0, 9.0), 3.0, ip)
    d = jnp.ones(8)
    y = geom.retract(x, 0.0, d, 3.0, ip)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-14)


def test_multi_sphere_maps_components_independently():
    ip = dot_ip
    xs = [jnp.ones(4), 2.0 * jnp.ones(6)]
    radii = [1.0, 5.0]
    out = geom.normalise_multi(xs, radii, ip)
    assert np.isclose(float(ip(out[0], out[0])), 1.0)
    assert np.isclose(float(ip(out[1], out[1])), 5.0)

    ds = [jnp.ones(4), -jnp.ones(6)]
    slope = geom.directional_inner(out, ds, ip)
    expected = float(ip(out[0], ds[0])) + float(ip(out[1], ds[1]))
    assert np.isclose(float(slope), expected)


def test_per_component_inner_products():
    ips = [dot_ip, mean_ip]
    xs = [jnp.ones(4), jnp.ones(8)]
    out = geom.normalise_multi(xs, [1.0, 1.0], ips)
    assert np.isclose(float(dot_ip(out[0], out[0])), 1.0)
    assert np.isclose(float(mean_ip(out[1], out[1])), 1.0)


def test_geometry_is_jittable_and_differentiable():
    ip = mean_ip

    @jax.jit
    def step(x, d, alpha):
        return geom.retract(x, alpha, d, 1.0, ip)

    x = geom.normalise_sphere(jnp.arange(1.0, 65.0), 1.0, ip)
    d = geom.tangent_project(x, jnp.ones(64), ip)
    y = step(x, d, 0.1)
    assert np.isclose(float(ip(y, y)), 1.0, rtol=1e-12)

    # grad of a scalar through the retraction exists and is finite
    g = jax.grad(lambda a: jnp.sum(step(x, d, a)))(0.1)
    assert np.isfinite(float(g))


def test_inner_product_list_length_validated():
    """A per-sphere inner-product list shorter than the state would
    silently DROP spheres via zip truncation (self-review r3)."""
    import pytest

    from spheremanopt_tpu.manifold import sphere as geom

    ip = lambda a, b: jnp.dot(a, b)
    with pytest.raises(ValueError, match="inner products"):
        geom.normalise_multi([jnp.ones(3), jnp.ones(3)], [1.0, 1.0], [ip])
