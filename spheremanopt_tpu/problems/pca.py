"""PCA on the unit sphere: min J(X) = -(1/2) X^T M X  s.t.  ||X|| = 1.

The optimiser integration test with an analytic ground truth
(reference: `Example_Problems/PCA_example.py`): the minimiser is the
leading eigenvector of the symmetric matrix M (the reference calls its
construction positive-definite; see `random_spd_matrix`), checked
against `numpy.linalg.eigh`.

Fixes a reference bug: `Objective_Gradient` there reads the module-global
`X` instead of its argument (`PCA_example.py:46`); everything here is
pure-functional over its inputs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def random_spd_matrix(dim: int, seed: int = 0, dtype=np.float64) -> np.ndarray:
    """Symmetric matrix with a positive probe quadratic form, mirroring
    the reference's `Hessian_Matrix` exactly (`PCA_example.py:14-31`).
    NOTE: despite the reference's 'positive definite' docstring (kept in
    this function's name for parity), a symmetrised Gaussian matrix is
    almost surely INDEFINITE — the optimisation only needs the leading
    eigenvector, which is well-defined either way. Returns NUMPY so the
    jitted objective/gradient closures embed M as an HLO constant
    (CLAUDE.md platform rule 1: jnp closures re-ship per call)."""
    rng = np.random.RandomState(seed)
    probe = rng.rand(dim)
    while True:
        m = rng.randn(dim, dim)
        m = 0.5 * (m + m.T)
        if probe @ (m @ probe) > 0:
            return m.astype(dtype)


class PCAProblem:
    """Callable triple (objective, gradient, inner_product) for the optimiser."""

    def __init__(self, m):
        # numpy: closed over by the jitted impls as an HLO constant
        self.m = np.asarray(m)
        self._objective = jax.jit(self._objective_impl)
        self._gradient = jax.jit(self._gradient_impl)
        self._inner = jax.jit(jnp.dot)

    def _objective_impl(self, x_list):
        x = x_list[0]
        return -0.5 * jnp.dot(x, self.m @ x)

    def _gradient_impl(self, x_list):
        # Euclidean gradient of J = -(1/2) x^T M x is -Mx; under the plain
        # dot-product inner product the Riesz representative is itself.
        return [-(self.m @ x_list[0])]

    def objective(self, x_list):
        return self._objective(x_list)

    def gradient(self, x_list):
        return self._gradient(x_list)

    def inner_product(self, x, y):
        return self._inner(x, y)

    def ground_truth(self) -> np.ndarray:
        """Leading eigenvector via LAPACK, for the parity check
        (`PCA_example.py:123-129`)."""
        vals, vecs = np.linalg.eigh(np.asarray(self.m))
        return vecs[:, -1]

    def sd_rate(self) -> float:
        """The reference's printed SD 'theoretical rate' ((k-1)/(k+1))^2
        with kappa = cond(M), reproduced verbatim for parity
        (`PCA_example.py:149-150`). Caveat inherited with it: cond() of
        an (almost surely indefinite) symmetrised Gaussian is
        |lambda|max/|lambda|min, not the eigenvalue-gap ratio the SD
        rate formula assumes — treat as the reference's diagnostic, not
        a sharp bound."""
        kappa = np.linalg.cond(np.asarray(self.m))
        return ((kappa - 1.0) / (kappa + 1.0)) ** 2
