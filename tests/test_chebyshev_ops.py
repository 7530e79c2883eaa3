"""Chebyshev transform round-trip, adjoint-identity, differentiation and
quadrature tests (the reference hand-codes these identities in its DCT
quartet, `FWD_Solve_SHB23.py:36-67`; SURVEY.md section 4 item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spheremanopt_tpu.ops.chebyshev import (
    ChebyshevBasis1D,
    cheb_to_coeff_fft,
    cheb_to_grid_fft,
)


@pytest.fixture(scope="module")
def basis():
    return ChebyshevBasis1D(64, -20.0, 20.0)


def test_analysis_synthesis_inverse(basis):
    err = np.abs(basis.analysis @ basis.synthesis - np.eye(basis.n)).max()
    assert err < 1e-12


def test_fft_paths_match_matrices(basis):
    u = np.random.RandomState(0).randn(basis.n)
    np.testing.assert_allclose(
        np.asarray(cheb_to_coeff_fft(jnp.asarray(u))), basis.analysis @ u, atol=1e-13
    )
    a = basis.analysis @ u
    np.testing.assert_allclose(
        np.asarray(cheb_to_grid_fft(jnp.asarray(a))), basis.synthesis @ a, atol=1e-12
    )


def test_transform_adjoint_identity():
    """<T x, y> == <x, T^T y> for the jit fft transforms via
    jax.linear_transpose (the identity the reference's transformAdjoint /
    transformInverseAdjoint implement by hand)."""
    n = 32
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n))
    y = jnp.asarray(rng.randn(n))
    for f in (cheb_to_coeff_fft, cheb_to_grid_fft):
        ft = jax.linear_transpose(f, x)
        (xt,) = ft(y)
        np.testing.assert_allclose(
            float(jnp.sum(f(x) * y)), float(jnp.sum(x * xt)), rtol=1e-12
        )


def test_differentiation_exact_for_polynomials(basis):
    z = basis.grid
    u = z ** 5 - 3.0 * z ** 2 + z
    du_exact = 5.0 * z ** 4 - 6.0 * z + 1.0
    a = basis.analysis @ u
    du = basis.synthesis @ (basis.diff_matrix @ a)
    # compare against the scale of du (pointwise rtol fails near zeros)
    assert np.abs(du - du_exact).max() < 1e-9 * np.abs(du_exact).max()


def test_boundary_rows(basis):
    z = basis.grid
    u = np.sin(np.pi * z / 20.0)
    a = basis.analysis @ u
    np.testing.assert_allclose(float(basis.boundary_row("right", 0) @ a), 0.0, atol=1e-10)
    np.testing.assert_allclose(
        float(basis.boundary_row("left", 1) @ a), np.pi / 20.0 * np.cos(-np.pi), atol=1e-10
    )


def test_quadratures(basis):
    f = np.exp(basis.x)
    exact = 20.0 * (np.e - 1.0 / np.e)
    cc = float((basis.clenshaw_curtis_weights * f).sum())
    np.testing.assert_allclose(cc, exact, rtol=1e-12)
    tr = float((basis.trapezoid_weights * f).sum())
    # trapezoid is only ~2nd order on this grid; the reference uses it anyway
    assert abs(tr - exact) / exact < 5e-3


def test_dealias_mask(basis):
    m = basis.dealias_mask(0.5)
    assert m[: basis.n // 2].all() and not m[basis.n // 2 :].any()
