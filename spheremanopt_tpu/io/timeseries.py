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


class IterationArchiver:
    """Optimiser callback: per iteration, evaluate `diagnostics(x_opt)`
    (a dict of arrays/scalars) and write `<prefix>_iter_<k>.npz`.

    Reference behaviour: `File_Manips` copies the latest
    scalar_data/CheckPoints h5 outputs to `*_iter_k.h5` each iteration.
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
