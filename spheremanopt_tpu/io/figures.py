"""Result figures: energy time series, field snapshots, spectra.

TPU-framework counterpart of the reference's per-problem plot scripts
(`plot_figure_SH23_FULL.py`, `plot_figure_SHB23.py`, `plot_figure_KDyn.py`,
`plot_figure_Poiseuille.py` — component #22 in SURVEY.md): reads the
diagnostics dicts produced by each problem's `.diagnostics()` (or the
npz archives written by `io.timeseries`) and renders the same panels.
Headless (Agg)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_energy_series(diag: Dict, save_path: str, keys=None, logy=True) -> str:
    """KE/ME time-series panel (e.g. `plot_figure_SH23_FULL.py:42-76`)."""
    plt = _plt()
    keys = keys or [k for k in diag if k.endswith("energy")]
    fig, ax = plt.subplots(figsize=(7, 5))
    t = np.asarray(diag["sim_time"])
    for k in keys:
        y = np.asarray(diag[k])
        (ax.semilogy if logy else ax.plot)(t, y, linewidth=2, label=k)
    ax.set_xlabel("t")
    ax.legend()
    ax.grid(alpha=0.4)
    fig.tight_layout()
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path


def plot_profile(diag: Dict, field_key: str, grid_key: str, save_path: str) -> str:
    """1D state snapshot (initial vs final when both present)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    x = np.asarray(diag[grid_key])
    ax.plot(x, np.asarray(diag[field_key]), linewidth=2, label=field_key)
    other = field_key.replace("final", "initial")
    if other != field_key and other in diag:
        ax.plot(x, np.asarray(diag[other]), "--", linewidth=1.5, label=other)
    ax.set_xlabel(grid_key)
    ax.legend()
    ax.grid(alpha=0.4)
    fig.tight_layout()
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path


def plot_field2d(diag: Dict, field_key: str, save_path: str,
                 x_key: str = "x_grid", z_key: str = "z_grid") -> str:
    """2D pcolormesh snapshot (vorticity/density panels of
    `plot_figure_Poiseuille.py`)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4))
    f = np.asarray(diag[field_key])
    x, z = np.asarray(diag[x_key]), np.asarray(diag[z_key])
    pc = ax.pcolormesh(x, z, f.T, shading="auto", cmap="RdBu_r")
    fig.colorbar(pc, ax=ax)
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_title(field_key)
    fig.tight_layout()
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path


def plot_spectrum(coeffs: np.ndarray, save_path: str, label: str = "|u_k|") -> str:
    """Coefficient-magnitude spectrum (`plot_figure_SH23_FULL.py:137-166`)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    mag = np.abs(np.asarray(coeffs)).ravel()
    ax.semilogy(np.arange(len(mag)), np.maximum(mag, 1e-300), linewidth=1.5)
    ax.set_xlabel("mode index")
    ax.set_ylabel(label)
    ax.grid(alpha=0.4)
    fig.tight_layout()
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path
