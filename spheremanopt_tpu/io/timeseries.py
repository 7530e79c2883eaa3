"""Scalar time-series and state-snapshot outputs.

Replaces the reference's Dedalus file handlers ('scalar_data' KE series
every 20 iters, 'CheckPoints' state snapshots — `FWD_Solve_SH23.py:478-483`)
and the per-iteration copies made by `File_Manips` (`:731-746`) with
npz-based recorders:

  * `save_scalar_series`  — named 1D series + time axis ('scalar_data')
  * `save_snapshots`      — named field arrays + grids ('CheckPoints')
  * `IterationArchiver`   — optimiser callback that snapshots the current
    diagnostics to `<name>_iter_<k>.npz` every iteration, the
    `File_Manips` role without the shell copies.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np


def save_scalar_series(path: str, sim_time, **series) -> str:
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, sim_time=np.asarray(sim_time),
             **{k: np.asarray(v) for k, v in series.items()})
    return path


def load_scalar_series(path: str) -> Dict[str, np.ndarray]:
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_snapshots(path: str, grids: Dict[str, np.ndarray],
                   fields: Dict[str, np.ndarray]) -> str:
    if not path.endswith(".npz"):
        path = path + ".npz"
    payload = {f"grid_{k}": np.asarray(v) for k, v in grids.items()}
    payload.update({f"field_{k}": np.asarray(v) for k, v in fields.items()})
    np.savez(path, **payload)
    return path


def load_snapshots(path: str):
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    grids, fields = {}, {}
    with np.load(path) as data:
        for k in data.files:
            if k.startswith("grid_"):
                grids[k[5:]] = data[k]
            elif k.startswith("field_"):
                fields[k[6:]] = data[k]
    return grids, fields


class LightArchiver:
    """Optimiser callback: per iteration, archive ONLY quantities the
    iteration already produced — J history, residuals, step sizes, wall
    times, and (optionally) the current iterate — to
    `<prefix>_iter_<k>.npz`. No extra PDE solves.

    This is the default archive mode: the reference's `File_Manips` is a
    file COPY of already-written outputs (`FWD_Solve_SH23.py:731-746`),
    so per-iteration archiving must not cost a forward solve. Full
    diagnostics re-runs remain available via `IterationArchiver`
    (opt-in, `run.py --archive-full`).
    """

    def __init__(self, prefix: str, out_dir: str = ".",
                 save_iterate: bool = True):
        self.prefix = prefix
        self.out_dir = out_dir
        self.save_iterate = save_iterate
        os.makedirs(out_dir, exist_ok=True)
        self.paths = []

    def __call__(self, k: int, result) -> None:
        payload = {
            "iteration": np.asarray(k),
            "function_values": np.asarray(result.function_values),
            "residuals": np.asarray(
                [r[: len(result.step_sizes)] for r in result.residuals]),
            "step_sizes": np.asarray(result.step_sizes),
            "wall_times": np.asarray(result.wall_times),
            "function_evals": np.asarray(result.function_evals),
            "gradient_evals": np.asarray(result.gradient_evals),
        }
        if self.save_iterate and result.x_opt is not None:
            for i, x in enumerate(result.x_opt):
                payload[f"x_opt_{i}"] = np.asarray(x)
        path = os.path.join(self.out_dir, f"{self.prefix}_iter_{k}.npz")
        np.savez(path, **payload)
        self.paths.append(path)


class IterationArchiver:
    """Optimiser callback: per iteration, evaluate `diagnostics(x_opt)`
    (a dict of arrays/scalars) and write `<prefix>_iter_<k>.npz`.

    Reference behaviour: `File_Manips` copies the latest
    scalar_data/CheckPoints h5 outputs to `*_iter_k.h5` each iteration.
    NOTE: `diagnostics` re-runs the forward solve; at `--archive-every 1`
    this doubles optimisation cost. Prefer `LightArchiver` (zero extra
    solves) unless full field/spectra snapshots per iteration are needed.
    """

    def __init__(self, prefix: str, diagnostics: Callable, out_dir: str = "."):
        self.prefix = prefix
        self.diagnostics = diagnostics
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.paths = []

    def __call__(self, k: int, result) -> None:
        diag = self.diagnostics(result.x_opt)
        path = os.path.join(self.out_dir, f"{self.prefix}_iter_{k}.npz")
        np.savez(path, **{key: np.asarray(val) for key, val in diag.items()})
        self.paths.append(path)
