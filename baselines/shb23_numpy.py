"""CPU baseline: bounded Swift-Hohenberg forward + hand-rolled adjoint.

Same discrete algorithm as `problems/swift_hohenberg_bounded.py`
(grid-space propagators folding the Chebyshev-tau solve), executed with
numpy/BLAS dgemv — the best-case CPU realisation of the reference's
scipy-LU pencil stepping (`FWD_Solve_SHB23.py:627-665`). The reverse
sweep uses the propagator transposes, independently validating the JAX
autodiff gradient.
"""

from __future__ import annotations

import numpy as np

from spheremanopt_tpu.ops.chebyshev import ChebyshevBasis1D


class SHB23Numpy:
    def __init__(self, npts=512, z0=-20.0, z1=20.0, a=-0.1, dt=0.01,
                 n_iters=2000, dealias_frac=0.5):
        self.n, self.dt, self.n_iters = npts, dt, n_iters
        b = ChebyshevBasis1D(npts, z0, z1)
        n = npts
        d2 = b.deriv_matrix(2)
        d4 = b.deriv_matrix(4)
        L = (1.0 / dt + 1.0 - a) * np.eye(n) + 2.0 * d2 + d4
        M_tau = np.zeros((n, n))
        M_tau[: n - 4] = L[: n - 4]
        M_tau[n - 4] = b.boundary_row("left", 1)
        M_tau[n - 3] = b.boundary_row("left", 3)
        M_tau[n - 2] = b.boundary_row("right", 0)
        M_tau[n - 1] = b.boundary_row("right", 2)
        E = np.eye(n)
        E[n - 4 :] = 0.0
        Z = np.diag(b.dealias_mask(dealias_frac))
        Minv_E = np.linalg.solve(M_tau, E)
        V, A = b.synthesis, b.analysis
        self.A_lin = V @ Minv_E @ A / dt
        self.A_nl = V @ Minv_E @ Z @ A
        vol = z1 - z0
        self.w = b.trapezoid_weights / vol

    def energy(self, u):
        return float(np.dot(self.w, u * u))

    def step(self, u):
        g = 2.0 * u * u - u ** 3
        return self.A_lin @ u + self.A_nl @ g

    def forward(self, u0, store=False):
        u = np.asarray(u0, float)
        snaps = [u.copy()] if store else None
        J = self.energy(u)
        for _ in range(self.n_iters):
            u = self.step(u)
            if store:
                snaps.append(u.copy())
            J += self.energy(u)
        J = -self.dt * J
        return (J, snaps) if store else J

    def gradient(self, u0):
        """Riesz representative of d(-J)/du0 under the trapezoid IP."""
        J, snaps = self.forward(u0, store=True)
        N = self.n_iters
        lam = -2.0 * self.dt * self.w * snaps[N]
        for i in range(N - 1, -1, -1):
            u = snaps[i]
            w1 = self.A_lin.T @ lam
            w2 = self.A_nl.T @ lam
            lam = w1 + (4.0 * u - 3.0 * u * u) * w2 - 2.0 * self.dt * self.w * u
        return lam / self.w
