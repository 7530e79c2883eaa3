"""CPU baseline: kinematic dynamo forward + hand-rolled discrete adjoint.

numpy/pocketfft realisation of the same discrete algorithm as
`spheremanopt_tpu.problems.kinematic_dynamo` (which itself implements the
reference `FWD_Solve_KDyn.py` CNAB1 + Leray scheme). Serves as the
CPU-Dedalus stand-in for the benchmark (BASELINE.md: the reference
publishes no numbers, and Dedalus is not installable here) and as an
independent check of the JAX autodiff gradient.

Adjoint notes (pairing <a,b> = sum Re(conj(a) b)):
  * Leray projector P = I - k k^T/k^2 (real, per mode): self-adjoint
  * spectral curl (i k x .): self-adjoint ((i[k]_x)^H = i[k]_x)
  * grid cross product with real U: (U x .)^T = -(U x .)
  * padded inverse transform D and truncating forward transform Q:
    D^T v = trunc(rfftn(v)) * w,  Q^T b = irfftn(pad(b * w/ (mg^3)))...
    exact scalings fixed numerically in tests (mirrors sh23_numpy).
"""

from __future__ import annotations

import numpy as np



def _cross(a, b):
    """3-component cross product over leading axis 0 (shared by the
    forward induction term and every transpose sweep — one body, no
    copy-paste surface between a map and its adjoint)."""
    return np.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])

class KDynNumpy:
    def __init__(self, npts=24, length=2 * np.pi, rm=1.0, dt=5e-4,
                 n_iters=2000, pad_factor=1.5, cost="Final"):
        self.n, self.rm, self.dt, self.n_iters = npts, rm, dt, n_iters
        self.cost = cost
        n = npts
        self.mg = int(round(npts * pad_factor))
        kf = 2 * np.pi * np.fft.fftfreq(n, 1.0 / n) / length
        kr = 2 * np.pi * np.fft.rfftfreq(n, 1.0 / n) / length
        self.k = np.stack([
            np.broadcast_to(kf[:, None, None], (n, n, n // 2 + 1)),
            np.broadcast_to(kf[None, :, None], (n, n, n // 2 + 1)),
            np.broadcast_to(kr[None, None, :], (n, n, n // 2 + 1)),
        ])
        k2 = (self.k ** 2).sum(0)
        with np.errstate(divide="ignore", invalid="ignore"):
            self.inv_k2 = np.where(k2 > 0, 1.0 / k2, 0.0)
        nyq = n // 2
        fk = np.abs(np.fft.fftfreq(n) * n) != nyq
        rk = np.ones(n // 2 + 1, bool)
        if n % 2 == 0:
            rk[-1] = False
        self.keep = fk[:, None, None] & fk[None, :, None] & rk[None, None, :]
        wz = np.full(n // 2 + 1, 2.0)
        wz[0] = 1.0
        if n % 2 == 0:
            wz[-1] = 1.0
        self.pw = np.broadcast_to(wz, (n, n, n // 2 + 1)).copy()
        a, nu = 1.0 / dt, 1.0 / (2.0 * rm)
        self.lhs_inv = 1.0 / (a + nu * k2)
        self.rhs_fac = a - nu * k2
        # transpose weights along the rfft axis. NOT the Parseval
        # weights pw: for even n the retained kz = n/2 bin of the
        # 1.5x-PADDED grid is an interior Hermitian-paired mode, so the
        # transpose pairing needs weight 2 there even though the energy
        # weight is 1 (mirrors sh23_numpy.wD[-1] = 2.0). Unobservable
        # today only because `keep` zeroes that bin everywhere DT/QT
        # outputs are read — fixed so relaxing `keep` cannot silently
        # corrupt the adjoint at the Nyquist plane.
        wzD = np.full(n // 2 + 1, 2.0)
        wzD[0] = 1.0
        self.wD = np.broadcast_to(wzD, (n, n, n // 2 + 1)).copy()
        self.wQ = 1.0 / self.wD                  # halving for Q^T

    # --- transforms: (3, n, n, n//2+1) coeff <-> (3, mg, mg, mg) grid ---
    def _pad(self, c):
        n, mg = self.n, self.mg
        h = n // 2
        out = np.zeros(c.shape[:-3] + (mg, mg, mg // 2 + 1), complex)
        lo, hi = slice(0, h + 1), slice(h + 1, n)
        out[..., : h + 1, : h + 1, : n // 2 + 1] = c[..., lo, lo, :]
        out[..., mg - (n - h - 1):, : h + 1, : n // 2 + 1] = c[..., hi, lo, :]
        out[..., : h + 1, mg - (n - h - 1):, : n // 2 + 1] = c[..., lo, hi, :]
        out[..., mg - (n - h - 1):, mg - (n - h - 1):, : n // 2 + 1] = c[..., hi, hi, :]
        return out

    def _trunc(self, C):
        n = self.n
        h = n // 2
        c = np.concatenate([C[..., : h + 1, :, :], C[..., -(n - h - 1):, :, :]], axis=-3)
        c = np.concatenate([c[..., :, : h + 1, :], c[..., :, -(n - h - 1):, :]], axis=-2)
        return c[..., :, :, : n // 2 + 1]

    def D(self, c):
        return np.fft.irfftn(self._pad(c) * self.mg ** 3,
                             s=(self.mg,) * 3, axes=(-3, -2, -1))

    def Q(self, v):
        c = np.fft.rfftn(v, axes=(-3, -2, -1)) / self.mg ** 3
        return self._trunc(c) * self.keep

    def DT(self, v):
        c = np.fft.rfftn(v, axes=(-3, -2, -1))
        return self._trunc(c) * self.wD

    def QT(self, b):
        return np.fft.irfftn(self._pad(b * self.keep * self.wQ),
                             s=(self.mg,) * 3, axes=(-3, -2, -1))

    # --- dynamics ---
    def leray(self, c):
        div = (self.k * c).sum(0)
        return c - self.k * (div * self.inv_k2)[None]

    def induction(self, b_c, u_grid):
        b = self.D(b_c)
        e = _cross(u_grid, b)
        ec = self.Q(e)
        return 1j * _cross(self.k, ec)

    def step(self, b_c, u_grid):
        rhs = self.rhs_fac * b_c + self.induction(b_c, u_grid)
        out = self.leray(rhs) * self.lhs_inv
        out[:, 0, 0, 0] = 0.0
        return out

    def energy(self, c):
        return float((self.pw * (c.real ** 2 + c.imag ** 2)).sum())

    def forward(self, b_grid, u_grid, store=False):
        b_c = self.Q(b_grid)
        u_bl = self.D(self.Q(u_grid))  # band-limit U like the TPU path
        snaps = [b_c.copy()] if store else None
        J = self.energy(b_c) if self.cost == "Integrated" else 0.0
        for _ in range(self.n_iters):
            b_c = self.step(b_c, u_bl)
            if store:
                snaps.append(b_c.copy())
            if self.cost == "Integrated":
                J += self.energy(b_c)
        J = self.dt * J if self.cost == "Integrated" else self.energy(b_c)
        return (-J, snaps, u_bl) if store else -J

    # --- reverse sweep: gradients wrt B0 (grid) and U (grid) ---
    def _step_T(self, lam, b_c, u_grid):
        """(lam_prev, dU_increment) = transpose of step at (b_c, u_grid)."""
        w = self.lhs_inv * lam
        w[:, 0, 0, 0] = 0.0
        wp = self.leray(w)
        # F^T (linear diffusion part)
        lam_prev = self.rhs_fac * wp
        # induction^T: curl self-adjoint, then Q^T, then cross transposes
        g = 1j * _cross(self.k, wp)
        s = self.QT(g)           # grid-space cotangent of E = U x B
        bg = self.D(b_c)
        # dE/dB^T s = -(U x s);  dE/dU^T s = +(B x s)... E = U x B:
        # w.r.t. B: E = [U]_x B -> transpose = -[U]_x = s x U? compute:
        dB = _cross(u_grid, s)
        dB = -dB  # ([U]_x)^T = -[U]_x
        lam_prev = lam_prev + self.DT(dB)
        # w.r.t. U: E = -[B]_x U -> transpose = +[B]_x s = B x s
        dU = _cross(bg, s)
        return lam_prev, dU

    def gradient(self, b_grid, u_grid):
        """Riesz representatives of d(-J) under (1/V) int f.g
        (= 3-component grid means): grad = raw / (1/mg^3)."""
        J, snaps, u_bl = self.forward(b_grid, u_grid, store=True)
        N = self.n_iters
        integ = self.cost == "Integrated"
        fac = -self.dt if integ else -1.0
        lam = (2.0 * self.pw * snaps[N]) * fac
        dU_total = np.zeros_like(u_bl)
        for i in range(N - 1, -1, -1):
            lam, dU = self._step_T(lam, snaps[i], u_bl)
            dU_total += dU
            if integ:
                lam += -self.dt * 2.0 * self.pw * snaps[i]
        g_b = self.QT(lam) * self.mg ** 3
        # chain dU through the band-limit projection D Q of u_grid
        g_u = self.QT(self.DT(dU_total)) * self.mg ** 3
        return g_b, g_u
