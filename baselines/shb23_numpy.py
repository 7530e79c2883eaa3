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

class SHB23Numpy:
    def __init__(self, npts=512, z0=-20.0, z1=20.0, a=-0.1, dt=0.01,
                 n_iters=2000, dealias_frac=0.5):
        # reuse the problem's exact f64 operator assembly (numpy) rather
        # than duplicating the tau construction
        from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
            SHB23Config,
            SwiftHohenbergBounded,
        )

        # device_ops=False: assembly-only f64 construction — works in
        # non-x64 processes (the bench child runs on the TPU without
        # x64); the exact f64 numpy matrices are read directly
        p = SwiftHohenbergBounded(SHB23Config(
            npts=npts, z0=z0, z1=z1, a=a, dt=dt, n_iters=n_iters,
            dealias_frac=dealias_frac, dtype="float64", device_ops=False,
        ))
        self.n, self.dt, self.n_iters = npts, dt, n_iters
        self.A_lin = np.asarray(p._A_lin, np.float64)
        self.A_nl = np.asarray(p._A_nl, np.float64)
        self.w = np.asarray(p._w, np.float64)

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
