"""Swift-Hohenberg minimal-seed problem, 1D periodic (Fourier).

Reference: `Example_Problems/Periodic_Domain(Fourier)/Swift_Hohenberg/
FWD_Solve_SH23.py`. The optimisation is

    max_{u0} J(u0) = int_t int_x |u(x,t)|^2 dx dt
    s.t.  (1/V) int_x u0^2 dx = E0,
          du/dt + (1 + dx^2)^2 u - a*u = 1.8 u^2 - u^3,   a = -0.3,

on x in [0, 12*pi) with 256 Fourier modes, SBDF1 timestepping, and the
Dedalus `dealias=2` convention (nonlinear products on a 2x oversampled
grid; ref `FWD_Solve_SH23.py:202-204`).

TPU-first realisation (not a translation):
  * state lives in rfft coefficient space; the implicit operator
    L_k = (1 - k^2)^2 - a is diagonal, so the SBDF1 update is a single
    fused elementwise kernel between two batched FFTs
    (ref builds/solves Dedalus pencils instead, `FWD_Solve_SH23.py:308-332`)
  * the whole N-step integration is one `lax.scan` in one XLA executable
  * the gradient is `jax.grad` of the discrete forward — this reproduces
    the reference's `Adjoint_type="Discrete"` adjoint exactly, including
    the `Compatib_Cond` terminal LBVP (`FWD_Solve_SH23.py:552-596`) and
    the "undo last implicit inversion" post-step (`:701-713`), which are
    nothing but the VJP of the SBDF1 step
  * the per-step snapshot buffer (`GEN_BUFFER`, `:238-272`) becomes
    XLA-managed remat state via `jax.checkpoint`
  * the cost integral J = dt * sum_n (1/V)||u_n||^2 (Euler rule over
    n = 0..N_ITERS, ref `:528-529`) is evaluated spectrally by Parseval —
    no extra transform — with Kahan compensation for f32 TPU runs.

The public state vector is the 2x-oversampled grid representation (512
points for 256 modes), matching the reference's `Field_to_Vec` layout at
`scales=domain.dealias` (`FWD_Solve_SH23.py:89-128`), and the inner
product is the plain grid mean (1/V) int f g (`:158-172`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.ops.fourier import FourierBasis1D, filter_coeff_fraction
from spheremanopt_tpu.problems.base import riesz_gradient
from spheremanopt_tpu.solvers.scan_utils import kahan_add, kahan_zero


@dataclass(frozen=True)
class SH23Config:
    npts: int = 256
    length: float = 12.0 * np.pi
    a: float = -0.3
    dt: float = 0.05
    n_iters: int = 1000          # T/dt with T=50 (ref `__main__`, :752-755)
    e0: float = 0.0725
    pad_factor: float = 2.0      # Dedalus dealias=2
    dtype: str = "float64"       # "float32" on TPU
    remat: bool = True           # per-step jax.checkpoint in the scan


class SwiftHohenberg:
    """SH23 problem: callable triple + IC generation for the optimiser."""

    def __init__(self, cfg: SH23Config = SH23Config()):
        self.cfg = cfg
        self.basis = FourierBasis1D(cfg.npts, cfg.length, cfg.pad_factor)
        self.radii = [cfg.e0]
        rdtype = jnp.dtype(cfg.dtype)
        cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
        self._rdtype, self._cdtype = rdtype, cdtype

        k = self.basis.wavenumbers(rdtype)
        # (1 + dx^2)^2 - a  ->  (1 - k^2)^2 - a in Fourier space
        self._L = ((1.0 - k * k) ** 2 - cfg.a).astype(rdtype)
        # Parseval weights for (1/V) int u^2: |c_0|^2 + 2 sum_{k>0} |c_k|^2
        w = np.full(self.basis.n_coeff, 2.0)
        w[0] = 1.0
        self._parseval = jnp.asarray(w, rdtype)

        self._objective = jax.jit(self._objective_impl)
        self._gradient = jax.jit(
            riesz_gradient(self._objective_impl, [1.0 / self.basis.n_grid])
        )
        self._inner = jax.jit(lambda x, y: jnp.mean(x * y))

    # ------------------------------------------------------------------
    # dynamics
    # ------------------------------------------------------------------

    def _energy(self, c: jnp.ndarray) -> jnp.ndarray:
        """(1/V) int u^2 dx via Parseval (exact for the retained band)."""
        return jnp.sum(self._parseval * (c.real ** 2 + c.imag ** 2))

    def _nonlinear(self, c: jnp.ndarray) -> jnp.ndarray:
        """N(u) = 1.8 u^2 - u^3 on the oversampled grid, truncated back."""
        u = self.basis.to_grid(c)
        return self.basis.to_coeff(1.8 * u * u - u * u * u)

    def _sbdf1_step(self, c: jnp.ndarray) -> jnp.ndarray:
        """SBDF1: (1/dt + L) u^{n+1} = u^n/dt + N(u^n); L diagonal."""
        dt = self.cfg.dt
        rhs = c / dt + self._nonlinear(c)
        return rhs / (1.0 / dt + self._L)

    def _integrate(self, c0: jnp.ndarray, n_steps: int):
        """Run n_steps of SBDF1, accumulating J = dt * sum_n E(u_n)
        (energies of u_0..u_{n_steps}; Euler quadrature per ref :528-529)."""
        step = self._sbdf1_step
        if self.cfg.remat:
            step = jax.checkpoint(step)

        def body(carry, _):
            c, acc = carry
            acc = kahan_add(acc, self._energy(c))
            c = step(c)
            return (c, acc), None

        acc0 = kahan_zero(self._rdtype)
        (c, acc), _ = jax.lax.scan(body, (c0, acc0), xs=None, length=n_steps)
        acc = kahan_add(acc, self._energy(c))
        return c, self.cfg.dt * acc[0]

    def _objective_impl(self, x_list) -> jnp.ndarray:
        """Returns -J (the reference maximises by minimising -J, :545)."""
        c0 = self.basis.to_coeff(x_list[0].astype(self._rdtype))
        _, J = self._integrate(c0, self.cfg.n_iters)
        return -J

    # ------------------------------------------------------------------
    # public triple
    # ------------------------------------------------------------------

    def objective(self, x_list):
        return self._objective(list(x_list))

    def gradient(self, x_list):
        return self._gradient(list(x_list))

    def inner_product(self, x, y):
        return self._inner(x, y)

    @property
    def inner_products(self):
        return self.inner_product

    # ------------------------------------------------------------------
    # initial conditions (ref Generate_IC, `FWD_Solve_SH23.py:174-236`)
    # ------------------------------------------------------------------

    def final_state(self, x_list) -> jnp.ndarray:
        """u(x, T) on the oversampled grid (for diagnostics/plots)."""
        c0 = self.basis.to_coeff(jnp.asarray(x_list[0], self._rdtype))
        c, _ = self._integrate(c0, self.cfg.n_iters)
        return self.basis.to_grid(c)

    def generate_ic(self, seed: int = 42, e0: float = None) -> List[jnp.ndarray]:
        """Seeded filtered noise, prep-smoothed 100 steps of dt=1e-2,
        renormalised onto the sphere (ref :174-236 and
        `FWD_Solve_IVP_PREP` :334-407)."""
        e0 = self.cfg.e0 if e0 is None else e0
        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(key, (self.basis.n_grid,), self._rdtype)
        c = filter_coeff_fraction(self.basis.to_coeff(noise), self.cfg.npts, 0.5)

        def norm(c, target):
            return c * jnp.sqrt(target / self._energy(c))

        c = norm(c, e0)
        # prep smoothing: 100 SBDF1 steps at dt=1e-2
        prep = SwiftHohenberg(
            SH23Config(
                npts=self.cfg.npts, length=self.cfg.length, a=self.cfg.a,
                dt=1e-2, n_iters=100, e0=e0, pad_factor=self.cfg.pad_factor,
                dtype=self.cfg.dtype, remat=False,
            )
        )
        c, _ = prep._integrate(c, 100)
        c = norm(c, e0)
        return [self.basis.to_grid(c)]
