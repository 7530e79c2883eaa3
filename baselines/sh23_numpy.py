"""CPU baseline: Swift-Hohenberg SH23 forward + hand-rolled discrete adjoint.

Stands in for the reference's CPU-Dedalus solve (the reference publishes no
numbers and Dedalus is not installable here; BASELINE.md). This is the same
discrete algorithm the reference executes — pseudo-spectral SBDF1 with
2x-oversampled nonlinear products (`FWD_Solve_SH23.py:279-332,496-529`) and
a reverse-sweep discrete adjoint with the compatibility terminal condition
and final-inversion undo (`:552-596,598-729`) — expressed directly in
numpy/pocketfft, i.e. the same FFTW-class native kernels Dedalus bottoms
out in, *without* Dedalus's per-step Python/MPI overhead. It is therefore a
strictly stronger baseline than reference-as-shipped.

It doubles as an independent cross-check of the JAX autodiff gradient
(tests/test_baseline_parity.py): both must agree to ~1e-12 in f64.

Adjoint construction notes. With A = diag(1/dt + L_k) and the step
u^{n+1} = A^{-1}(u^n/dt + Q G(D u^n)), where D: coeffs -> padded grid,
Q: grid -> truncated coeffs, G(v) = 1.8 v^2 - v^3, the reverse sweep uses
the real-pairing transposes measured against <a,b>_C = sum Re(conj(a) b):

    D^T v = rfft(v)[:K] * [1, 2, 2, ...]          (Hermitian double count)
    Q^T b = irfft(pad(b * [1, .5, .5, ...]), m) / m * m = irfft(pad(b*w))
"""

from __future__ import annotations

import numpy as np


class SH23Numpy:
    def __init__(self, npts=256, length=12.0 * np.pi, a=-0.3, dt=0.05,
                 n_iters=1000, pad_factor=2.0):
        self.npts, self.length, self.a, self.dt = npts, length, a, dt
        self.n_iters = n_iters
        self.mg = int(round(npts * pad_factor))      # oversampled grid
        self.K = npts // 2 + 1                       # retained rfft coeffs
        k = 2 * np.pi * np.fft.rfftfreq(npts, 1.0 / npts) / length
        self.L = (1.0 - k * k) ** 2 - a
        self.mask = np.ones(self.K)
        if npts % 2 == 0:
            self.mask[-1] = 0.0                      # Nyquist dropped
        self.Ainv = 1.0 / (1.0 / dt + self.L)
        # Parseval weights for (1/V) int u^2
        self.pw = np.full(self.K, 2.0)
        self.pw[0] = 1.0
        # transpose weights (derived + numerically verified)
        self.wD = np.full(self.K, 2.0); self.wD[0] = 1.0
        self.wQ = np.full(self.K, 0.5); self.wQ[0] = 1.0

    # --- linear transform maps and their real-pairing transposes ---
    def D(self, c):
        cp = np.zeros(self.mg // 2 + 1, complex)
        cp[: self.K] = c
        return np.fft.irfft(cp * self.mg, n=self.mg)

    def Q(self, v):
        return (np.fft.rfft(v)[: self.K] / self.mg) * self.mask

    def DT(self, v):
        return np.fft.rfft(v)[: self.K] * self.wD

    def QT(self, b):
        cp = np.zeros(self.mg // 2 + 1, complex)
        cp[: self.K] = b * self.mask * self.wQ
        return np.fft.irfft(cp, n=self.mg)

    # --- dynamics ---
    def to_coeff(self, u_grid):
        return self.Q(u_grid)

    def energy(self, c):
        return np.sum(self.pw * (c.real ** 2 + c.imag ** 2))

    def step(self, c):
        v = self.D(c)
        nl = self.Q(1.8 * v * v - v ** 3)
        return self.Ainv * (c / self.dt + nl)

    def forward(self, u0_grid, store=False):
        """Returns -J (and the snapshot trajectory if store), J = the
        Euler-rule cost dt * sum_{n=0..N} (1/V)||u_n||^2."""
        c = self.to_coeff(np.asarray(u0_grid, float))
        snaps = [c.copy()] if store else None
        J = self.energy(c)
        for _ in range(self.n_iters):
            c = self.step(c)
            if store:
                snaps.append(c.copy())
            J += self.energy(c)
        return (-self.dt * J, snaps) if store else -self.dt * J

    def gradient(self, u0_grid):
        """Riesz representative of d(-J)/du0 under (1/V) int f g — the
        reference's `ADJ_Solve_IVP_Lin` output convention."""
        _, snaps = self.forward(u0_grid, store=True)
        # lambda_n = d(-J)/dc_n along the reverse sweep (complex cotangent
        # in the Re-pairing convention: dE/dc for E = sum pw |c|^2 is
        # 2*pw*c under <a,b> = Re sum conj(a) b).
        lam = -self.dt * 2.0 * self.pw * snaps[self.n_iters]
        for n in range(self.n_iters - 1, -1, -1):
            cn = snaps[n]
            # transpose of step: lam_prev = (1/dt) Ainv lam + J_N^T Ainv lam
            w = self.Ainv * lam            # A^{-T} = A^{-1} (real diagonal)
            v = self.D(cn)
            gprime = 3.6 * v - 3.0 * v * v
            nl_t = self.DT(gprime * self.QT(w))
            lam = w / self.dt + nl_t - self.dt * 2.0 * self.pw * cn
        # chain through to_coeff (u0_grid -> c0): transpose is Q^T
        g_grid = self.QT(lam)
        # Riesz under IP(x,y) = mean(x*y): representative = grad / (1/mg)
        return g_grid * self.mg


def generate_ic_like(npts=256, pad_factor=2.0, seed=42, e0=0.0725,
                     length=12.0 * np.pi, a=-0.3):
    """Seeded filtered noise + prep smoothing, the baseline-side analogue
    of `Generate_IC` (`FWD_Solve_SH23.py:174-236`)."""
    sim = SH23Numpy(npts, length, a, dt=1e-2, n_iters=100, pad_factor=pad_factor)
    rng = np.random.RandomState(seed)
    noise = rng.standard_normal(sim.mg)
    c = sim.to_coeff(noise)
    idx = np.arange(sim.K) / float(npts // 2)
    c[idx > 0.5] = 0.0
    c *= np.sqrt(e0 / sim.energy(c))
    for _ in range(sim.n_iters):   # prep length = the constructor's 100
        c = sim.step(c)
    c *= np.sqrt(e0 / sim.energy(c))
    return sim.D(c)
