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
from collections import OrderedDict
from typing import Callable, Dict

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


class FusedArchiver:
    """Optimiser callback that archives FULL diagnostics per iteration at
    ZERO extra PDE solves: it substitutes the problem's fused
    `objective_and_diagnostics` / `objective_gradient_and_diagnostics`
    callables for `f` / `f_and_g` in the optimiser, so every line-search
    trial's forward solve also yields its diagnostics payload, cached by
    the (exact) objective value. When the optimiser accepts an iterate
    and fires the callback, the accepted J — which is bit-identical to
    the trial evaluation that produced it — looks the payload up and it
    is written with no further compute.

    This is the fused analogue of the reference's design, where the
    scalar_data/CheckPoints handlers ride the SAME Dedalus FWD solve the
    cost uses and `File_Manips` merely copies the files per iteration
    (`FWD_Solve_SH23.py:478-483,731-746`); `IterationArchiver` (below)
    re-runs the forward instead and is kept as the fallback for problem
    configs without an aux-output objective (pallas kernels).

    Usage (see `run.py --archive-full`):

        arch = FusedArchiver("diag", problem, out_dir)
        optimise_on_multi_sphere(x0, radii, arch.f, problem.gradient,
                                 problem.inner_product,
                                 f_and_g=arch.f_and_g, callback=arch)
    """

    def __init__(self, prefix: str, problem, out_dir: str = ".",
                 keep: int = 8, async_writes: bool = True):
        if not getattr(problem, "has_fused_diagnostics", False):
            raise ValueError(
                "problem config has no fused-diagnostics objective; use "
                "IterationArchiver (re-runs diagnostics) instead")
        self.prefix = prefix
        self.problem = problem
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.paths = []
        self.fallback_recomputes = 0   # cache misses (should stay 0)
        self._keep = keep
        self._cache: "OrderedDict[float, dict]" = OrderedDict()
        # async_writes moves the device->host payload transfers + npz
        # writes off the optimisation's critical path (measured on-chip
        # r4: synchronous per-iterate transfers through the tunnel cost
        # +35% end-to-end vs +9% for the fused capture itself). The
        # payload arrays are immutable accepted-iterate snapshots, so a
        # deferred transfer reads identical data; call `flush()` (the
        # CLI does) before consuming `paths`.
        self._pool = None
        self._pending: list = []
        if async_writes:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=1)

    def _store(self, J: float, diag: dict) -> None:
        # diag values may be device arrays; keep them lazy (no host
        # transfer) until the accepted iterate is actually archived.
        # Keying on the exact float J is sound because lookups resolve
        # LATEST-wins: a same-J store from a different trial iterate is
        # overwritten here, and the accepted trial is by construction the
        # final evaluation at its J before the optimiser fires the
        # callback (line searches return immediately on accept), so the
        # payload retrieved is the accepted trial's. A key evicted by
        # more than `keep` later trials degrades to a CORRECT counted
        # recompute (`fallback_recomputes`), never a wrong payload.
        self._cache[J] = diag
        self._cache.move_to_end(J)
        while len(self._cache) > self._keep:
            self._cache.popitem(last=False)

    def f(self, xs):
        J, diag = self.problem.objective_and_diagnostics(xs)
        J = float(J)
        self._store(J, diag)
        return J

    def f_and_g(self, xs):
        J, g, diag = self.problem.objective_gradient_and_diagnostics(xs)
        self._store(float(J), diag)
        return J, g

    def __call__(self, k: int, result) -> None:
        # optimiser convention: function_values holds -J of the accepted
        # iterate (negation is exact, so the cache key matches bitwise)
        J = -float(result.function_values[-1])
        diag = self._cache.get(J)
        if diag is None:
            # e.g. resumed mid-run or a driver that bypassed f/f_and_g
            self.fallback_recomputes += 1
            diag = self.problem.diagnostics(result.x_opt)
        path = os.path.join(self.out_dir, f"{self.prefix}_iter_{k}.npz")
        if self._pool is not None:
            # `paths` lists only LANDED files: the append rides INSIDE
            # the worker task after a successful savez (single worker
            # -> FIFO order preserved; a done-callback would race
            # flush(), which can return before callbacks fire). A
            # consumer reading paths[-1] mid-run never races the async
            # write, and a failed write (flush() re-raises it) never
            # leaves a phantom path behind.
            self._pending.append(
                self._pool.submit(self._write_and_record, path,
                                  dict(diag)))
        else:
            self._write(path, diag)
            self.paths.append(path)

    @staticmethod
    def _write(path: str, diag: dict) -> None:
        np.savez(path, **{key: np.asarray(val) for key, val in diag.items()})

    def _write_and_record(self, path: str, diag: dict) -> None:
        self._write(path, diag)
        self.paths.append(path)   # only after the file landed

    def flush(self) -> None:
        """Wait for pending async archive writes (re-raising the first
        failure). Call before consuming `paths`; idempotent."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()


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
