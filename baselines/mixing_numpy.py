"""CPU baseline: optimal-mixing forward + hand-rolled discrete adjoint.

Same discrete algorithm as `problems/optimal_mixing.py` (per-kx tau
solution operators + matmul transforms) on numpy/BLAS — the best-case
CPU realisation of the reference's per-pencil scipy-LU stepping
(`FWD_Solve_Poiseuille.py:1028-1043`). The reverse sweep applies the
conjugate transposes of every linear map, independently validating the
JAX autodiff gradient for this problem too.
"""

from __future__ import annotations

import numpy as np


class MixingNumpy:
    def __init__(self, nx=256, nz=128, n_iters=1000, dt=5e-3, s=1,
                 reynolds=500.0, richardson=0.05, prandtl=1.0,
                 delta=0.125, lx=4.0 * np.pi):
        # reuse the problem's f64 operator assembly (numpy in, numpy out)
        from spheremanopt_tpu.problems.optimal_mixing import (
            MixingConfig,
            OptimalMixing,
        )

        # device_ops=False + dtype=float64: the baseline reads the exact
        # f64 numpy operators directly — no device round-trip (which
        # would both waste ~170 MB of tunnel transfers and round the
        # operators to f32 in a non-x64 process)
        p = OptimalMixing(MixingConfig(
            nx=nx, nz=nz, n_iters=n_iters, dt=dt, s=s, reynolds=reynolds,
            richardson=richardson, prandtl=prandtl, delta=delta, lx=lx,
            dtype="float64", device_ops=False,
        ))
        self.p = p
        self.s, self.dt, self.n_iters, self.nz = s, dt, n_iters, nz
        self.S = p._S_np.astype(np.complex128)
        self.MN = p._MN_np.astype(np.complex128)
        self.Fx = p._Fx.astype(np.complex128)
        self.Bx = p._Bx.astype(np.complex128)
        self.Az = p._Az.astype(np.float64)
        self.Vz = p._Vz.astype(np.float64)
        self.Dz = p._Dz_np
        self.kx = p._kx
        self.xmask = p._xmask
        self.w = np.asarray(p._w, np.float64)
        self.rho0 = p._rho0_c.astype(np.complex128)

    # transforms (BLAS matmuls, not einsum loops — keep the CPU
    # baseline honest)
    def to_coeff(self, g):
        c = self.Fx @ g                      # (kxn, mgz)
        c = c @ self.Az.T                    # (kxn, nz)
        return c * self.xmask[:, None]

    def to_grid(self, c):
        g = c @ self.Vz.T                    # (kxn, mgz)
        g = self.Bx @ g                      # (mgx, mgz)
        return g.real

    def _nl(self, u_c, w_c, r_c):
        ikx = 1j * self.kx[:, None]
        dz = lambda c: c @ self.Dz.T
        ug, wg = self.to_grid(u_c), self.to_grid(w_c)
        out = []
        for c in (u_c, w_c, r_c):
            adv = ug * self.to_grid(ikx * c) + wg * self.to_grid(dz(c))
            out.append(-self.to_coeff(adv))
        return out

    def step(self, u_c, w_c, r_c):
        nlu, nlw, nlr = self._nl(u_c, w_c, r_c)
        a0 = 1.0 / self.dt
        rhs = np.concatenate([a0 * u_c + nlu, a0 * w_c + nlw, a0 * r_c + nlr], axis=-1)
        sol = np.matmul(self.S, rhs[..., None])[..., 0]  # batched BLAS
        nz = self.nz
        return sol[:, :nz], sol[:, nz:2 * nz], sol[:, 2 * nz:]

    def ke(self, u_c, w_c):
        ug, wg = self.to_grid(u_c), self.to_grid(w_c)
        return float(np.sum(self.w * (ug * ug + wg * wg)))

    def mixnorm(self, r_c):
        psi = np.matmul(self.MN, r_c[..., None])[..., 0]
        ikx = 1j * self.kx[:, None]
        gx = self.to_grid(ikx * psi)
        gz = self.to_grid(psi @ self.Dz.T)
        return 0.5 * float(np.sum(self.w * (gx * gx + gz * gz)))

    def forward(self, x, store=False):
        """x: (2, mgx, mgz) velocity grid; returns the objective."""
        u_c, w_c = self.to_coeff(x[0]), self.to_coeff(x[1])
        r_c = self.rho0.copy()
        snaps = [(u_c.copy(), w_c.copy(), r_c.copy())] if store else None
        J = 0.0
        for _ in range(self.n_iters):
            if self.s == 0:
                J += self.ke(u_c, w_c)
            u_c, w_c, r_c = self.step(u_c, w_c, r_c)
            if store:
                snaps.append((u_c.copy(), w_c.copy(), r_c.copy()))
        if self.s == 0:
            J = -0.5 * self.dt * (J + self.ke(u_c, w_c))
        else:
            J = self.mixnorm(r_c)
        return (J, snaps) if store else J

    # ------------------------------------------------------------------
    # transposes under the pairing <a,b> = sum Re(conj(a) b)
    # ------------------------------------------------------------------

    def to_coeff_T(self, cbar):
        """adjoint of grid -> coeff (real in, complex out)."""
        cbar = cbar * self.xmask[:, None]
        g = cbar @ self.Az
        return (np.conj(self.Fx).T @ g).real

    def to_grid_T(self, vbar):
        """adjoint of coeff -> grid (real in, complex out)."""
        c = np.conj(self.Bx).T @ vbar.astype(complex)
        return c @ self.Vz

    def _nl_T(self, lbars, u_c, w_c, r_c):
        """transpose of _nl at (u_c, w_c, r_c): given cotangents of the
        three NL outputs, return cotangents of (u_c, w_c, r_c)."""
        ikx = 1j * self.kx[:, None]
        dz = lambda c: c @ self.Dz.T
        ug, wg = self.to_grid(u_c), self.to_grid(w_c)
        du = np.zeros_like(u_c)
        dw = np.zeros_like(w_c)
        dr = np.zeros_like(r_c)
        dug = np.zeros(ug.shape)
        dwg = np.zeros(wg.shape)
        for lbar, c, which in zip(lbars, (u_c, w_c, r_c), ("u", "w", "r")):
            s = self.to_coeff_T(-lbar)             # grid cotangent of adv
            # adv = ug * to_grid(ikx c) + wg * to_grid(dz c)
            gx = self.to_grid(ikx * c)
            gz = self.to_grid(dz(c))
            dug += s * gx
            dwg += s * gz
            dc = np.conj(ikx) * self.to_grid_T(s * ug) + dz_T(
                self.to_grid_T(s * wg), self.Dz)
            if which == "u":
                du += dc
            elif which == "w":
                dw += dc
            else:
                dr += dc
        du += self.to_grid_T(dug)
        dw += self.to_grid_T(dwg)
        return du, dw, dr

    def step_T(self, lbars, u_c, w_c, r_c):
        """transpose of step at the pre-step state."""
        lam = np.concatenate(lbars, axis=-1)
        y = np.matmul(np.conj(self.S).transpose(0, 2, 1), lam[..., None])[..., 0]
        nz = self.nz
        yu, yw, yr = y[:, :nz], y[:, nz:2 * nz], y[:, 2 * nz:]
        a0 = 1.0 / self.dt
        du, dw, dr = self._nl_T((yu, yw, yr), u_c, w_c, r_c)
        return du + a0 * yu, dw + a0 * yw, dr + a0 * yr

    def gradient(self, x):
        """Riesz representative of dJ/dx under the rectangle IP."""
        J, snaps = self.forward(x, store=True)
        N = self.n_iters
        uN, wN, rN = snaps[N]
        if self.s == 1:
            # J = mixnorm(r_N): dJ/dr = conj(MN)^T applied to psi cotangent
            ikx = 1j * self.kx[:, None]
            psi = np.matmul(self.MN, rN[..., None])[..., 0]
            gx, gz = self.to_grid(ikx * psi), self.to_grid(psi @ self.Dz.T)
            dpsi = (np.conj(ikx) * self.to_grid_T(self.w * gx)
                    + dz_T(self.to_grid_T(self.w * gz), self.Dz))
            lr = np.matmul(np.conj(self.MN).transpose(0, 2, 1), dpsi[..., None])[..., 0]
            lu = np.zeros_like(uN)
            lw = np.zeros_like(wN)
        else:
            lu = -self.dt * self.to_grid_T(self.w * self.to_grid(uN))
            lw = -self.dt * self.to_grid_T(self.w * self.to_grid(wN))
            lr = np.zeros_like(rN)
        for i in range(N - 1, -1, -1):
            u_c, w_c, r_c = snaps[i]
            lu, lw, lr = self.step_T((lu, lw, lr), u_c, w_c, r_c)
            if self.s == 0:
                lu += -self.dt * self.to_grid_T(self.w * self.to_grid(u_c))
                lw += -self.dt * self.to_grid_T(self.w * self.to_grid(w_c))
        gu = self.to_coeff_T(lu)
        gw = self.to_coeff_T(lw)
        return np.stack([gu, gw]) / self.w


def dz_T(cbar, Dz):
    """adjoint of c -> c @ Dz.T (Dz real): cbar @ Dz."""
    return cbar @ Dz
