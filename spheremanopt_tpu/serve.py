"""Warm-executable optimisation server.

The TPU cost model is compile-once / run-many: the first compile of a
device-loop executable costs ~20-40 s through the remote compile helper,
while warm steady calls land in milliseconds (BASELINE.md). The
reference's batch model re-pays full startup per study point (one
`mpiexec -np N python3 FWD_Solve_*.py` per run, rebuilding the Dedalus
solvers each time — `run_Poiseuille_problem.sh:16-17`). This server
inverts that: a long-running process holds compiled device-resident
optimisation loops (`optim/jit_driver.py`) keyed by problem+config and
serves requests over a Unix domain socket, so every request after the
first with a given shape runs at warm-executable speed.

Protocol: newline-delimited JSON, one object per line, one reply per
request.

  {"cmd": "optimise", "problem": "sh23", "seed": 3,
   "config": {"npts": 256, "n_iters": 1000},
   "driver": {"max_iters": 20, "line_search": "wolfe", "cg": true},
   "save": "/path/out.npz"}          # optional: persist x_opt + series
    -> {"ok": true, "J": [...], "residuals": [...], "step_sizes": [...],
        "iterations": n, "wall_s": ..., "cache_hit": bool}

  {"cmd": "sweep", "problem": "sh23", "seeds": [1,2,3],
   "e0": [0.02, 0.05, 0.08],          # optional per-point first-sphere
   "config": {...}, "driver": {...}}  # radius (radii_dyn sweep)
    -> per-point result rows from ONE vmapped executable (the batched
       capability of examples/sh23_batch_sweep.py as a service)

  {"cmd": "status"}   -> uptime, request count, cached executable keys,
                         and live occupancy: {"busy": {...}|null,
                         "queued": n} — answered IMMEDIATELY even while
                         a long sweep runs
  {"cmd": "shutdown"} -> stops the server loop

Concurrency model: connections are accepted on a THREADED server, so a
second client is never blocked behind a long-running first one — but
COMPUTE requests (optimise/sweep) are serialised through one worker
lock: TPU work must not run concurrently in this environment (two
concurrent heavy dispatches stall the remote compile helper, CLAUDE.md
platform rule 6 — one serialising server is the fix, not the victim).
Queued compute requests run FIFO; status/shutdown bypass the queue.

Start:  python -m spheremanopt_tpu.serve --socket /tmp/smo.sock
Client: spheremanopt_tpu.serve.request(path, {...}) -> dict
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import socketserver
import threading
import time
from typing import Any, Dict, Tuple

__all__ = ["OptimisationService", "request", "serve", "main"]


def _make_problem(name: str, config: Dict[str, Any]):
    """Problem factory from plain JSON-able config dicts (the CLI's
    `make_problem` speaks argparse; services speak dicts)."""
    config = dict(config or {})
    if name == "pca":
        from spheremanopt_tpu.problems.pca import PCAProblem, random_spd_matrix

        dim = int(config.pop("dim", 100))
        seed = int(config.pop("matrix_seed", 0))
        if config:
            raise ValueError(f"unknown pca config keys: {sorted(config)}")
        return PCAProblem(random_spd_matrix(dim, seed=seed))
    if name == "sh23":
        from spheremanopt_tpu.problems.swift_hohenberg import (
            SH23Config, SwiftHohenberg)

        return SwiftHohenberg(SH23Config(**config))
    if name == "shb23":
        from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
            SHB23Config, SwiftHohenbergBounded)

        return SwiftHohenbergBounded(SHB23Config(**config))
    if name == "kdyn":
        from spheremanopt_tpu.problems.kinematic_dynamo import (
            KDynConfig, KinematicDynamo)

        return KinematicDynamo(KDynConfig(**config))
    if name == "mixing":
        from spheremanopt_tpu.problems.optimal_mixing import (
            MixingConfig, OptimalMixing)

        return OptimalMixing(MixingConfig(**config))
    raise ValueError(f"unknown problem {name!r}")


class OptimisationService:
    """Request handler + executable cache (transport-agnostic: tests can
    call `handle` directly; the socket server wraps it)."""

    def __init__(self):
        self._cache: Dict[str, Tuple[Any, Any, Any]] = {}
        self._t0 = time.time()
        self._requests = 0
        self._hits = 0
        # compute serialisation: one worker at a time touches jax (see
        # module docstring); status/shutdown answer without this lock
        self._work_lock = threading.Lock()
        self._state_lock = threading.Lock()
        self._busy: Dict[str, Any] | None = None
        self._queued = 0

    # -- executable cache ------------------------------------------------

    def _key(self, kind: str, name: str, config: dict, driver: dict,
             batch: int = 0) -> str:
        return json.dumps({"kind": kind, "problem": name,
                           "config": config or {}, "driver": driver or {},
                           "batch": batch}, sort_keys=True)

    def _get_optimiser(self, name: str, config: dict, driver: dict):
        """(problem, optimise_callable, aux, cache_hit)"""
        from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere

        key = self._key("optimise", name, config, driver)
        with self._state_lock:
            hit = self._cache.get(key)
            if hit is not None:
                self._hits += 1
        if hit is not None:
            return (*hit, True)
        p = _make_problem(name, config)
        pair = getattr(p, "objective_and_gradient_aux", None)
        if pair is not None and pair[0] is not None:
            fg, aux = pair  # mixing: operand stacks; kdyn df64: traceable fg
        elif hasattr(p, "objective_and_gradient"):
            fg, aux = p.objective_and_gradient, None
        else:  # objective/gradient-only problems (pca)
            fg, aux = (lambda xs: (p.objective(xs), p.gradient(xs))), None
        radii = getattr(p, "radii", [1.0])  # pca: unit sphere (run.py:214)
        opt = jit_optimise_on_multi_sphere(
            fg, p.inner_product, radii, **(driver or {}))
        with self._state_lock:
            self._cache[key] = (p, opt, aux)
        return p, opt, aux, False

    # -- handlers ----------------------------------------------------------

    def handle(self, req: Dict[str, Any]) -> Dict[str, Any]:
        with self._state_lock:
            self._requests += 1
        try:
            cmd = req.get("cmd")
            if cmd == "status":
                # snapshot EVERYTHING under the lock: a compute thread
                # may be inserting a cache entry right now, and
                # sorted() over a resizing dict raises RuntimeError
                with self._state_lock:
                    busy = dict(self._busy) if self._busy else None
                    queued = self._queued
                    requests = self._requests
                    hits = self._hits
                    executables = sorted(self._cache)
                return {"ok": True, "uptime_s": round(time.time() - self._t0, 3),
                        "requests": requests,
                        "cache_hits": hits,
                        "busy": busy, "queued": queued,
                        "executables": executables}
            if cmd == "shutdown":
                return {"ok": True, "shutdown": True}
            if cmd in ("optimise", "sweep"):
                return self._run_serialised(cmd, req)
            return {"ok": False, "error": f"unknown cmd {cmd!r}"}
        except Exception as e:  # noqa: BLE001 — a server must not die
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}

    def _run_serialised(self, cmd: str, req: Dict[str, Any]):
        """FIFO-queue a compute request behind the single worker lock;
        a concurrent status request sees it under 'queued' until it
        starts, then under 'busy'."""
        with self._state_lock:
            self._queued += 1
        acquired = False
        try:
            self._work_lock.acquire()
            acquired = True
            with self._state_lock:
                self._queued -= 1
                self._busy = {"cmd": cmd,
                              "problem": req.get("problem"),
                              "since_s": round(time.time() - self._t0, 3)}
            try:
                return (self._optimise(req) if cmd == "optimise"
                        else self._sweep(req))
            finally:
                with self._state_lock:
                    self._busy = None
        finally:
            if acquired:
                self._work_lock.release()
            else:  # interrupted before the lock: undo the queue count
                with self._state_lock:
                    self._queued -= 1

    @staticmethod
    def _result_row(res, np):
        n = int(res.iterations)
        return {
            "J": [float(v) for v in np.asarray(res.function_values)[:n]],
            "residuals": np.asarray(res.residuals)[:n].tolist(),
            "step_sizes": [float(v) for v in np.asarray(res.step_sizes)[:n]],
            "iterations": n,
        }

    @staticmethod
    def _initial_condition(p, seed):
        if hasattr(p, "generate_ic"):
            return p.generate_ic(seed=seed)
        # pca: random start, unit sphere (run.py:208-214)
        import numpy as np

        return [np.random.RandomState(seed).rand(p.m.shape[0])]

    def _optimise(self, req):
        import numpy as np

        name = req["problem"]
        p, opt, aux, hit = self._get_optimiser(
            name, req.get("config"), req.get("driver"))
        x0 = self._initial_condition(p, int(req.get("seed", 42)))
        t0 = time.perf_counter()
        res = opt(list(x0), aux=aux) if aux is not None else opt(list(x0))
        import jax

        jax.block_until_ready(res.function_values)
        wall = time.perf_counter() - t0
        out = {"ok": True, "cache_hit": hit, "wall_s": round(wall, 6)}
        out.update(self._result_row(res, np))
        if req.get("save"):
            path = req["save"]
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.savez(path,
                     **{f"x_opt_{i}": np.asarray(x)
                        for i, x in enumerate(res.x_opt)},
                     function_values=np.asarray(res.function_values),
                     residuals=np.asarray(res.residuals),
                     step_sizes=np.asarray(res.step_sizes),
                     iterations=np.asarray(res.iterations))
            out["saved"] = path
        return out

    def _sweep(self, req):
        import jax
        import jax.numpy as jnp
        import numpy as np

        name = req["problem"]
        seeds = [int(s) for s in req["seeds"]]
        B = len(seeds)
        if B < 1:
            raise ValueError("sweep needs at least one seed")
        e0 = req.get("e0")
        if e0 is not None and len(e0) != B:
            raise ValueError("e0 must match seeds length")
        p, opt, aux, hit = self._get_optimiser(
            name, req.get("config"), req.get("driver"))
        ics = []
        for i, s in enumerate(seeds):
            if e0 is not None:
                ics.append(p.generate_ic(seed=s, e0=float(e0[i])))
            else:
                ics.append(self._initial_condition(p, s))
        xs = [jnp.stack([ic[j] for ic in ics]) for j in range(len(ics[0]))]
        base_radii = [float(r) for r in getattr(p, "radii", [1.0])]
        if e0 is not None:
            radii = jnp.asarray([[float(e0[i])] + base_radii[1:]
                                 for i in range(B)])
        else:
            radii = jnp.asarray([base_radii] * B)

        # cache the jitted vmapped executable too: a fresh jax.jit
        # wrapper per request would retrace on every warm sweep
        skey = self._key("sweep", name, req.get("config"),
                         req.get("driver"), batch=B)
        with self._state_lock:
            sweep_fn = self._cache.get(skey)
        if sweep_fn is None:
            def one(x_row, r_row, aux_op):
                kw = {"radii_dyn": [r_row[j] for j in range(len(base_radii))]}
                if aux_op is not None:
                    kw["aux"] = aux_op
                return opt(list(x_row), **kw)

            # aux (operator stacks — for mixing, hundreds of MB of device
            # arrays) rides as an UNBATCHED jit ARGUMENT (in_axes=None):
            # closing over it would embed the stacks in the program body
            # (CLAUDE.md platform rule 1; cf. examples/mixing_e0_sweep.py)
            jitted = jax.jit(jax.vmap(one, in_axes=(0, 0, None)))

            def sweep_fn(xs_, radii_, _j=jitted, _a=aux):
                return _j(xs_, radii_, _a)

            with self._state_lock:
                self._cache[skey] = sweep_fn
        else:
            with self._state_lock:
                self._hits += 1

        t0 = time.perf_counter()
        res = sweep_fn(xs, radii)
        jax.block_until_ready(res.function_values)
        wall = time.perf_counter() - t0
        fv = np.asarray(res.function_values)    # (B, max_iters)
        rs = np.asarray(res.residuals)          # (B, max_iters, n_spheres)
        ss = np.asarray(res.step_sizes)
        its = np.asarray(res.iterations)
        rows = []
        for i in range(B):
            n = int(its[i])
            row = {"J": fv[i, :n].tolist(), "residuals": rs[i, :n].tolist(),
                   "step_sizes": ss[i, :n].tolist(), "iterations": n,
                   "seed": seeds[i]}
            if e0 is not None:
                row["e0"] = float(e0[i])
            rows.append(row)
        return {"ok": True, "cache_hit": hit, "wall_s": round(wall, 6),
                "points": rows}


# -- transport -------------------------------------------------------------


def serve(socket_path: str, service: OptimisationService | None = None,
          ready_event=None):
    """Run the blocking server loop on a Unix domain socket. Connections
    are THREADED (a status client is answered while a sweep runs);
    compute requests serialise through the service's worker lock — TPU
    work must not run concurrently in this environment (two concurrent
    heavy dispatches stall the compile helper, CLAUDE.md platform rule
    6; one serialising worker is the fix, not the victim)."""
    service = service or OptimisationService()
    if os.path.exists(socket_path):
        os.unlink(socket_path)

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                line = line.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                except json.JSONDecodeError as e:
                    resp = {"ok": False, "error": f"bad json: {e}"}
                else:
                    resp = service.handle(req)
                self.wfile.write((json.dumps(resp) + "\n").encode())
                self.wfile.flush()
                if resp.get("shutdown"):
                    # stop accepting; must happen off-thread to not
                    # deadlock serve_forever's own handler
                    threading.Thread(target=self.server.shutdown,
                                     daemon=True).start()
                    return

    class Server(socketserver.ThreadingUnixStreamServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server(socket_path, Handler) as srv:
        if ready_event is not None:
            ready_event.set()
        srv.serve_forever(poll_interval=0.05)
    if os.path.exists(socket_path):
        os.unlink(socket_path)


def request(socket_path: str, obj: Dict[str, Any],
            timeout: float = 600.0) -> Dict[str, Any]:
    """One-shot client: send a request object, return the reply dict."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(timeout)
        s.connect(socket_path)
        s.sendall((json.dumps(obj) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(1 << 16)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode())


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="spheremanopt_tpu.serve",
        description="warm-executable optimisation server (unix socket)")
    ap.add_argument("--socket", default="/tmp/spheremanopt.sock")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (cpu)")
    ap.add_argument("--x64", action="store_true",
                    help="enable f64 (CPU only; the TPU is f32)")
    args = ap.parse_args(argv)
    import jax

    from spheremanopt_tpu.utils.platform import apply_platform

    # x64="auto" matches run.py: CPU serves f64 configs (the problem
    # defaults); without x64 their construction would raise
    # (problems.base.check_x64) on every request
    on_tpu = apply_platform(args.platform, x64=True if args.x64 else "auto")
    from spheremanopt_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    platform = jax.devices()[0].platform
    print(f"serving on {args.socket} (platform={platform})", flush=True)
    serve(args.socket)


if __name__ == "__main__":
    main()
