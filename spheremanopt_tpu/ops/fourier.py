"""Real-Fourier spectral primitives: padded transforms, wavenumbers, masks.

Replaces the FFTW-backed Fourier machinery the reference delegates to
Dedalus (`de.Fourier` bases + scale-toggled transforms, see
`FWD_Solve_SH23.py:203-204` and SURVEY.md section 2 component table). The
TPU realisation keeps state in rfft coefficient space and evaluates
nonlinear terms on a zero-padded (oversampled) grid:

  * `pad_factor = 2`  — Dedalus `dealias=2` convention (SH23/SHB23)
  * `pad_factor = 1.5` — classical 3/2-rule (kinematic dynamo, mixing)

Conventions: a basis of `n` points retains rfft modes k = 0..n/2 with the
Nyquist mode zeroed (Dedalus v2 Fourier keeps n/2 complex coefficients and
drops Nyquist). Transforms are unitary-free (numpy forward/backward
scaling); grid values at different oversampling factors represent the same
function, so `to_grid(to_coeff(u))` reproduces the band-limited part of u.

All functions are shape-static, jit/vmap/grad-safe, and dtype-generic
(f64 on CPU verification, f32 on TPU).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def wavenumbers_rfft(n: int, length: float, dtype=np.float64) -> np.ndarray:
    """Angular wavenumbers k_j = 2*pi*j/L for the rfft layout (j=0..n//2).

    Returns NUMPY (not a device array): wavenumber tensors are meant to
    be closed over by jitted steps as HLO constants — closing over jnp
    device arrays re-ships the buffer per call on the axon TPU
    (CLAUDE.md platform rule 1)."""
    return (2.0 * np.pi * np.fft.rfftfreq(n, d=1.0 / n) / length).astype(dtype)


def nyquist_mask_rfft(n: int) -> np.ndarray:
    """Boolean keep-mask zeroing the Nyquist mode (Dedalus drops it)."""
    m = np.ones(n // 2 + 1, dtype=bool)
    if n % 2 == 0:
        m[-1] = False
    return m


@dataclass(frozen=True)
class FourierBasis1D:
    """1D real-Fourier basis of `n` modes on [0, length).

    `n_grid` is the oversampled quadrature grid used for nonlinear
    products (n * pad_factor points).
    """

    n: int
    length: float
    pad_factor: float = 2.0

    @property
    def n_grid(self) -> int:
        return int(round(self.n * self.pad_factor))

    @property
    def n_coeff(self) -> int:
        return self.n // 2 + 1

    def grid(self, oversampled: bool = True) -> np.ndarray:
        m = self.n_grid if oversampled else self.n
        return np.arange(m) * (self.length / m)

    def wavenumbers(self, dtype=np.float64) -> np.ndarray:
        return wavenumbers_rfft(self.n, self.length, dtype)

    def to_coeff(self, u_grid: jnp.ndarray) -> jnp.ndarray:
        """Oversampled grid -> truncated rfft coefficients (band k <= n/2,
        Nyquist zeroed), normalised so coefficients are grid-size free."""
        m = u_grid.shape[-1]
        c = jnp.fft.rfft(u_grid, axis=-1) / m
        c = c[..., : self.n_coeff]
        mask = jnp.asarray(nyquist_mask_rfft(self.n))
        return jnp.where(mask, c, 0.0)

    def to_grid(self, c: jnp.ndarray, oversampled: bool = True) -> jnp.ndarray:
        """Coefficients -> (oversampled) grid via zero-padded inverse rfft."""
        m = self.n_grid if oversampled else self.n
        pad = m // 2 + 1 - c.shape[-1]
        cp = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
        return jnp.fft.irfft(cp * m, n=m, axis=-1)

    def derivative_factor(self, order: int = 1, dtype=np.float64) -> np.ndarray:
        """(ik)^order multiplier in coefficient space (numpy, so jitted
        closures embed it as an HLO constant — CLAUDE.md rule 1)."""
        k = self.wavenumbers(dtype)
        cdt = np.complex128 if np.dtype(dtype) == np.float64 else np.complex64
        return (1j * k.astype(cdt)) ** order


@dataclass(frozen=True)
class FourierBasis3D:
    """Triply periodic real-Fourier basis (kinematic dynamo,
    `FWD_Solve_KDyn.py:213-216`). State layout: coefficients of shape
    (n, n, n//2+1) with rfft over the last axis."""

    n: int
    length: float = 2.0 * np.pi
    pad_factor: float = 1.5

    @property
    def n_grid(self) -> int:
        return int(round(self.n * self.pad_factor))

    @property
    def coeff_shape(self) -> Tuple[int, int, int]:
        return (self.n, self.n, self.n // 2 + 1)

    def wavenumber_grids(self, dtype=np.float64):
        """(kx, ky, kz) numpy arrays broadcastable over the coefficient
        array (numpy so jitted closures embed HLO constants, rule 1)."""
        kfull = 2.0 * np.pi * np.fft.fftfreq(self.n, d=1.0 / self.n) / self.length
        kr = 2.0 * np.pi * np.fft.rfftfreq(self.n, d=1.0 / self.n) / self.length
        kx = kfull.astype(dtype)[:, None, None]
        ky = kfull.astype(dtype)[None, :, None]
        kz = kr.astype(dtype)[None, None, :]
        return kx, ky, kz

    def keep_mask(self) -> np.ndarray:
        """Mask dropping all Nyquist planes (Dedalus keeps k in
        (-n/2, n/2) exclusive). Built with INTEGER arithmetic: the former
        float test `abs(fftfreq(n)*n) != n//2` breaks both ways — fftfreq
        multiplies by a reciprocal, so at many even n (98, 196, 206, ...)
        the product lands on 48.999... and the Nyquist plane slips
        through, while at most odd n the equality hits and legitimate
        |k| = n//2 < n/2 modes were wrongly zeroed on x/y (the z axis,
        via `nyquist_mask_rfft`, kept them)."""
        idx = np.arange(self.n)
        k_int = np.where(idx <= self.n // 2, idx, idx - self.n)
        full = 2 * np.abs(k_int) < self.n      # |k| < n/2, exact
        r = nyquist_mask_rfft(self.n)
        return full[:, None, None] & full[None, :, None] & r[None, None, :]

    def to_coeff(self, u_grid: jnp.ndarray) -> jnp.ndarray:
        """Oversampled grid -> truncated, Nyquist-masked coefficients."""
        m = u_grid.shape[-1]
        c = jnp.fft.rfftn(u_grid, axes=(-3, -2, -1)) / (m ** 3)
        c = _truncate_3d(c, self.n)
        return jnp.where(jnp.asarray(self.keep_mask()), c, 0.0)

    def to_grid(self, c: jnp.ndarray, oversampled: bool = True) -> jnp.ndarray:
        m = self.n_grid if oversampled else self.n
        cp = _pad_3d(c, self.n, m)
        return jnp.fft.irfftn(cp * (m ** 3), s=(m, m, m), axes=(-3, -2, -1))


def _truncate_3d(c: jnp.ndarray, n: int) -> jnp.ndarray:
    """Keep the low |k| block of a full-resolution 3D rfftn array."""
    h = n // 2
    lo = c[..., : h + 1, :, :]
    hi = c[..., -(n - h - 1):, :, :] if n - h - 1 > 0 else None
    c1 = jnp.concatenate([lo, hi], axis=-3) if hi is not None else lo
    lo = c1[..., :, : h + 1, :]
    hi = c1[..., :, -(n - h - 1):, :] if n - h - 1 > 0 else None
    c2 = jnp.concatenate([lo, hi], axis=-2) if hi is not None else lo
    return c2[..., :, :, : n // 2 + 1]


def _pad_3d(c: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """Zero-pad truncated coefficients back to an m^3 rfftn layout."""
    if m == n:
        return c
    h = n // 2
    batch = c.shape[:-3]
    out = jnp.zeros(batch + (m, m, m // 2 + 1), dtype=c.dtype)
    out = out.at[..., : h + 1, : h + 1, : n // 2 + 1].set(
        c[..., : h + 1, : h + 1, :]
    )
    out = out.at[..., -(n - h - 1):, : h + 1, : n // 2 + 1].set(
        c[..., h + 1 :, : h + 1, :]
    )
    out = out.at[..., : h + 1, -(n - h - 1):, : n // 2 + 1].set(
        c[..., : h + 1, h + 1 :, :]
    )
    out = out.at[..., -(n - h - 1):, -(n - h - 1):, : n // 2 + 1].set(
        c[..., h + 1 :, h + 1 :, :]
    )
    return out


def filter_coeff_fraction(c: jnp.ndarray, n_basis: int, frac: float = 0.5) -> jnp.ndarray:
    """Zero the top (1-frac) fraction of 1D coefficient indices.

    Mirrors the reference's `filter_field` noise smoother
    (`FWD_Solve_SH23.py:28-53`): Dedalus stores n/2 complex Fourier
    coefficients indexed 0..n/2-1 and zeros those with index/(n/2) > frac.
    """
    n_coeff = c.shape[-1]
    idx = np.arange(n_coeff) / float(n_basis // 2)
    keep = jnp.asarray(idx <= frac)
    return jnp.where(keep, c, 0.0)
