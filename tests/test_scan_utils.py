"""Checkpointed-scan utilities: nested (sqrt-N) remat correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.solvers.scan_utils import (
    kahan_add,
    kahan_zero,
    nested_checkpoint_scan,
)


def _step(c):
    c2 = 0.97 * c + 0.05 * jnp.tanh(c)
    return c2, jnp.sum(c2 * c2)


@pytest.mark.parametrize("length", [9, 16, 37])
def test_nested_scan_matches_plain_loop(length):
    c0 = jnp.linspace(-1.0, 1.0, 32)
    c_ref, tot_ref = c0, 0.0
    for _ in range(length):
        c_ref, y = _step(c_ref)
        tot_ref += float(y)
    c, tot = nested_checkpoint_scan(_step, c0, length)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=1e-12)
    np.testing.assert_allclose(float(tot), tot_ref, rtol=1e-12)


def test_nested_scan_gradient_matches_storeall():
    length = 25

    def loss_nested(c0):
        _, tot = nested_checkpoint_scan(_step, c0, length)
        return tot

    def loss_plain(c0):
        def body(c, _):
            c, y = _step(c)
            return c, y

        _, ys = jax.lax.scan(body, c0, xs=None, length=length)
        return jnp.sum(ys)

    c0 = jnp.linspace(-1.0, 1.0, 16)
    g1 = jax.grad(loss_nested)(c0)
    g2 = jax.grad(loss_plain)(c0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-11)


def test_kahan_accumulation_beats_naive_in_f32():
    vals = (np.full(200000, 0.1, np.float32) * np.float32(1.0001))
    naive = jnp.float32(0.0)
    acc = kahan_zero(jnp.float32)
    for chunk in np.split(vals, 10):
        j = jnp.asarray(chunk)
        naive = naive + jnp.sum(j)  # chunked naive
    # scan-style kahan over all elements
    def body(carry, v):
        return kahan_add(carry, v), None
    acc, _ = jax.lax.scan(body, acc, jnp.asarray(vals))
    exact = float(np.sum(vals.astype(np.float64)))
    assert abs(float(acc[0]) - exact) <= abs(float(naive) - exact)
    assert abs(float(acc[0]) - exact) / exact < 1e-6
