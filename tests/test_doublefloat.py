"""Unit tests for ops/doublefloat: error-free transforms, df
arithmetic, and the Ozaki exact-split matmul — all checked against f64
ground truth computed in the same (x64-enabled) process.

Every df computation here runs in STRICT f32 (inputs constructed as
f32; the module's ops never promote), so the CPU results exercise the
same arithmetic the TPU executes: an f32 product/sum of f32 values is
identical on both (the Ozaki slice einsums are additionally EXACT by
construction, so even the TPU's one-bf16-pass default matches — the
operands carry <= 8 significand bits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.ops import doublefloat as dfm
from spheremanopt_tpu.ops.doublefloat import (
    DF, OzakiComplexOp, OzakiOp, df_add, df_dot, df_from_f, df_from_np,
    df_mul, df_mul_f, df_probe, df_sum, ozaki_bits, ozaki_split_np,
    two_prod, two_sum,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_probe_compiler_preserves_compensation():
    # the platform's XLA has a measured history of eliding compensation
    # structure (ops/compensated.py docstring) — this is the canary
    assert df_probe()


def test_two_sum_exact():
    r = _rng(1)
    a = r.standard_normal(4096).astype(np.float32)
    b = (r.standard_normal(4096) * 1e-6).astype(np.float32)
    s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
    s64 = np.asarray(s, np.float64)
    e64 = np.asarray(e, np.float64)
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(s64 + e64, exact)


def test_two_prod_exact():
    r = _rng(2)
    a = r.standard_normal(4096).astype(np.float32)
    b = r.standard_normal(4096).astype(np.float32)
    p, e = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_df_add_mul_accuracy():
    r = _rng(3)
    x64 = r.standard_normal(2048)
    y64 = r.standard_normal(2048) * 1e3
    x = DF(*(jnp.asarray(v) for v in df_from_np(x64)))
    y = DF(*(jnp.asarray(v) for v in df_from_np(y64)))
    s = jax.jit(df_add)(x, y)
    m = jax.jit(df_mul)(x, y)
    sv = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)
    mv = np.asarray(m.hi, np.float64) + np.asarray(m.lo, np.float64)
    assert np.max(np.abs(sv - (x64 + y64)) / np.abs(x64 + y64)) < 1e-13
    assert np.max(np.abs(mv - (x64 * y64)) / np.abs(x64 * y64)) < 1e-13


def test_df_sum_compensated():
    r = _rng(4)
    # adversarial cancellation: large alternating terms + small residue
    big = r.standard_normal(5000) * 1e4
    vals = np.concatenate([big, -big, r.standard_normal(333)])
    r.shuffle(vals)
    vals32 = vals.astype(np.float32)
    exact = np.sum(vals32.astype(np.float64))
    s = jax.jit(df_sum)(df_from_f(jnp.asarray(vals32)))
    got = float(np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64))
    assert abs(got - exact) < 1e-9 * max(abs(exact), 1.0)
    # plain f32 sum is strictly worse on this input
    plain = float(jnp.sum(jnp.asarray(vals32)))
    assert abs(got - exact) <= abs(plain - exact)


def test_df_dot_matches_f64():
    r = _rng(5)
    w = r.standard_normal(4096).astype(np.float32)
    x = r.standard_normal(4096).astype(np.float32)
    y = r.standard_normal(4096).astype(np.float32)
    exact = np.sum(w.astype(np.float64) * x.astype(np.float64)
                   * y.astype(np.float64))
    d = jax.jit(df_dot)(jnp.asarray(w), jnp.asarray(x), jnp.asarray(y))
    got = float(np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64))
    assert abs(got - exact) < 1e-10 * max(abs(exact), 1.0)


def test_df_dot_gradient_flows():
    # df_dot rides the autodiff gradient path (line-search IPs): its
    # grad must equal the exact product-rule derivative w * y
    w = jnp.asarray(np.linspace(0.5, 2.0, 64), jnp.float32)
    y = jnp.asarray(np.linspace(-1.0, 1.0, 64), jnp.float32)
    x = jnp.asarray(np.ones(64), jnp.float32)
    g = jax.grad(lambda x: df_dot(w, x, y).hi)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w * y),
                               rtol=1e-6)


def test_ozaki_split_reconstructs():
    r = _rng(6)
    A = r.standard_normal((3, 32, 48)) * np.logspace(0, -6, 48)[None, None]
    b = ozaki_bits(48)
    p = int(np.ceil(48 / b))
    slices = ozaki_split_np(A, b, p)
    rec = np.sum(slices.astype(np.float64), axis=0)
    amax = np.max(np.abs(A), axis=(-2, -1), keepdims=True)
    assert np.max(np.abs(rec - A)) < 2.0 ** (-p * b + 1) * np.max(amax)


@pytest.mark.parametrize("k", [48, 192, 384])
def test_ozaki_matvec_df_accuracy(k):
    """The headline property: constant-matrix x df-vector contraction
    accurate to ~2^-44 relative to the output norm, in pure f32 ops."""
    r = _rng(7)
    A = r.standard_normal((k, k))
    y64 = r.standard_normal((4, k, 2)) * np.logspace(0, -8, k)[None, :, None]
    op = OzakiOp(A, "ij,bjc->bic", "ij,bic->bjc")
    sl = jnp.asarray(op.slices_np)
    y = DF(*(jnp.asarray(v) for v in df_from_np(y64)))
    out = jax.jit(lambda sl, y: op.apply(sl, y))(sl, y)
    got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
    exact = np.einsum("ij,bjc->bic", A, y64)
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 2.0 ** -42, rel
    # and the plain-f32 product is orders worse than the df one
    plain = np.einsum("ij,bjc->bic", A.astype(np.float32),
                      y64.astype(np.float32)).astype(np.float64)
    rel_plain = np.linalg.norm(plain - exact) / np.linalg.norm(exact)
    assert rel < 1e-4 * rel_plain


def test_ozaki_complex_packed():
    r = _rng(8)
    k = 96
    A = r.standard_normal((2, k, k)) + 1j * r.standard_normal((2, k, k))
    y64 = r.standard_normal((2, k, 2))
    yc = y64[..., 0] + 1j * y64[..., 1]
    op = OzakiComplexOp(A, "bij,bjc->bic", "bij,bic->bjc")
    sl = tuple(jnp.asarray(s) for s in op.slices_np)
    y = DF(*(jnp.asarray(v) for v in df_from_np(y64)))
    out = jax.jit(lambda sl, y: op.apply_packed(sl, y))(sl, y)
    got = np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64)
    exact_c = np.einsum("bij,bj->bi", A, yc)
    exact = np.stack([exact_c.real, exact_c.imag], -1)
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 2.0 ** -42, rel


def test_ozaki_custom_vjp_cotangent_quality():
    """The backward pass must deliver ~f32-quality A^T cotangents: the
    un-overridden autodiff would transpose each slice einsum at one-
    bf16-pass precision, rounding the full-width cotangent to 8 bits."""
    r = _rng(9)
    k = 64
    A = r.standard_normal((k, k))
    op = OzakiOp(A, "ij,jc->ic", "ij,ic->jc")
    sl = jnp.asarray(op.slices_np)
    y32 = r.standard_normal((k, 2)).astype(np.float32)
    v32 = r.standard_normal((k, 2)).astype(np.float32)
    v = jnp.asarray(v32)

    def f(yh):
        out = op.apply(sl, DF(yh, jnp.zeros_like(yh)))
        return jnp.sum((out.hi + out.lo) * v)

    g = np.asarray(jax.jit(jax.grad(f))(jnp.asarray(y32)), np.float64)
    exact = np.einsum("ij,ic->jc", A, v32.astype(np.float64))
    rel = np.linalg.norm(g - exact) / np.linalg.norm(exact)
    assert rel < 1e-5, rel


def test_ozaki_linearity_of_vjp():
    # Taylor-style FD check of the custom_vjp against the primal: the
    # op is linear, so f(y+h*d) - f(y) == h * <grad, d> to grad quality
    r = _rng(10)
    k = 48
    A = r.standard_normal((k, k))
    op = OzakiOp(A, "ij,jc->ic", "ij,ic->jc")
    sl = jnp.asarray(op.slices_np)
    y = r.standard_normal((k, 2)).astype(np.float32)
    d = r.standard_normal((k, 2)).astype(np.float32)

    def f(yh):
        out = op.apply(sl, DF(yh, jnp.zeros_like(yh)))
        return jnp.sum(out.hi + out.lo)

    g = np.asarray(jax.grad(f)(jnp.asarray(y)), np.float64)
    h = 1e-2
    fd = (float(f(jnp.asarray(y + h * d))) - float(f(jnp.asarray(y)))) / h
    assert abs(fd - np.sum(g * d)) < 1e-4 * max(abs(fd), 1.0)


def test_ops_cotangent_is_documented_zero():
    """The Ozaki custom_vjp returns a HARD-ZERO cotangent for the
    operator slice stacks (CLAUDE.md sanctioned exception (2)): the
    stacks are frozen init-time constants, never optimised over. This
    test pins the zero so it stays documented behavior — if operator
    sensitivities are ever needed the stack must be applied OUTSIDE
    the custom_vjp — and pins that the state cotangent through the
    same call is simultaneously correct (the zero doesn't leak)."""
    r = _rng(11)
    k = 32
    A = r.standard_normal((k, k))
    op = OzakiOp(A, "ij,jc->ic", "ij,ic->jc")
    sl = jnp.asarray(op.slices_np)
    y = r.standard_normal((k, 2)).astype(np.float32)

    def f(slices, yh):
        out = op.apply(slices, DF(yh, jnp.zeros_like(yh)))
        return jnp.sum(out.hi + out.lo)

    g_ops, g_y = jax.grad(f, argnums=(0, 1))(sl, jnp.asarray(y))
    assert not np.any(np.asarray(g_ops)), "ops cotangent must be zero"
    exact = np.einsum("ij,ic->jc", A, np.ones((k, 2)))
    rel = (np.linalg.norm(np.asarray(g_y, np.float64) - exact)
           / np.linalg.norm(exact))
    assert rel < 1e-5, rel


def test_df_mul_f_exact_mask():
    mask = jnp.asarray(np.array([0.0, 1.0, 1.0, 0.0], np.float32))
    x = DF(jnp.asarray(np.full(4, 1.1, np.float32)),
           jnp.asarray(np.full(4, 1e-9, np.float32)))
    out = df_mul_f(x, mask)
    np.testing.assert_array_equal(np.asarray(out.hi),
                                  np.asarray(mask * x.hi))
    assert float(out.lo[0]) == 0.0 and float(out.lo[3]) == 0.0
