"""Environment diagnostic: `python -m spheremanopt_tpu.run doctor`.

The axon TPU platform has measured failure modes that look like hangs or
mystery errors to an operator (CLAUDE.md platform rules: wedged-tunnel
startup hangs, UNIMPLEMENTED after eager chains, 20-40 s remote
compiles). The reference has no operational tooling at all (its failure
mode is an mpiexec stack trace); a production serving deployment needs a
one-command health report. Every potentially-hanging check runs in a
SUBPROCESS with a timeout so the doctor itself can never wedge.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from typing import Any, Dict

__all__ = ["run_doctor"]


def _subprocess_probe(code: str, timeout_s: float) -> Dict[str, Any]:
    """Run `code` in a clean child; return {ok, seconds, out|err}."""
    t0 = time.perf_counter()
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"ok": False, "seconds": round(time.perf_counter() - t0, 1),
                "err": f"timeout after {timeout_s:.0f}s (wedged tunnel?)"}
    d = {"ok": out.returncode == 0,
         "seconds": round(time.perf_counter() - t0, 1)}
    if out.returncode == 0:
        d["out"] = out.stdout.strip().splitlines()[-1] if out.stdout else ""
    else:
        d["err"] = (out.stderr or "").strip().splitlines()[-1:]
    return d


def _dir_stats(path: str) -> Dict[str, Any]:
    if not os.path.isdir(path):
        return {"present": False, "path": path}
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            n += 1
            try:
                size += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return {"present": True, "path": path, "files": n,
            "mb": round(size / 1e6, 1)}


def _tpu_probe_ok(probe: Dict[str, Any]) -> bool:
    """True iff the TPU probe ran, on a NON-cpu platform, and computed
    the expected value. Probe output format: '<platform> <value>'."""
    if not probe.get("ok"):
        return False
    parts = str(probe.get("out", "")).split()
    return (len(parts) == 2 and parts[0] != "cpu"
            and parts[1].startswith("16384"))


def run_doctor(probe_timeout_s: float | None = None,
               verbose: bool = True) -> dict:
    """Collect the health report; print it when verbose. Returns the
    report dict; `report["cpu_ok"]` gates the exit code (the TPU being
    wedged is an environment state to report, not a failure of the
    installation). The TPU probe deadline defaults to 90 s (a healthy
    first compile through the tunnel takes 20-40 s); override with
    SMO_DOCTOR_PROBE_S for fast scripted checks."""
    if probe_timeout_s is None:
        probe_timeout_s = float(os.environ.get("SMO_DOCTOR_PROBE_S", "90"))
    rep: Dict[str, Any] = {}

    rep["python"] = sys.version.split()[0]
    try:
        import jax

        rep["jax"] = jax.__version__
    except Exception as e:  # noqa: BLE001
        rep["jax"] = f"IMPORT FAILED: {e}"
    rep["env"] = {k: v for k, v in os.environ.items()
                  if k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                           "SMO_OP_CACHE", "SMO_BENCH_BUDGET")}
    rep["axon_plugin_on_pythonpath"] = any(
        "axon" in p for p in os.environ.get("PYTHONPATH", "").split(":"))

    # CPU path: backend init + jit dispatch + x64, in a child so this
    # process's backend stays unconfigured for the caller
    rep["cpu"] = _subprocess_probe(
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import jax.numpy as jnp; "
        "x = jax.jit(lambda v: (v*v).sum())(jnp.ones(64, jnp.float64)); "
        "print(float(x))", timeout_s=60)
    rep["cpu_ok"] = bool(rep["cpu"].get("ok")) \
        and rep["cpu"].get("out") == "64.0"

    # TPU path: trivial compiled dispatch through the tunnel. A timeout
    # here is the measured wedge signature — report, don't hang. The
    # probe prints the executing platform alongside the value: without
    # the axon plugin JAX silently falls back to CPU and the value
    # alone would report a false 'TPU healthy' on CPU-only hosts.
    rep["tpu"] = _subprocess_probe(
        "import jax, jax.numpy as jnp; "
        "v = float(jax.jit(lambda x: (x*x).sum())(jnp.ones((128,128)))); "
        "print(jax.devices()[0].platform, v)", timeout_s=probe_timeout_s)
    rep["tpu_ok"] = _tpu_probe_ok(rep["tpu"])
    if not rep["tpu_ok"] and rep["tpu"].get("seconds", 0) >= probe_timeout_s:
        rep["tpu"]["hint"] = (
            "tunnel wedge signature: trivial dispatch hung. Measured "
            "self-recovery 20-90 min; retry later, do CPU work meanwhile")

    # caches
    rep["compile_cache"] = _dir_stats(
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/smo_jax_cache"))
    from spheremanopt_tpu.utils.opcache import _cache_dir

    od = _cache_dir()
    rep["op_cache"] = (_dir_stats(od) if od
                       else {"present": False, "disabled": "SMO_OP_CACHE=0"})

    # native async writer (builds from source on first load)
    try:
        from spheremanopt_tpu.io import native_io

        native_io._load()
        rep["native_io"] = {"available": True}
    except Exception as e:  # noqa: BLE001
        rep["native_io"] = {"available": False, "err": str(e)}

    rep["compilers"] = {t: shutil.which(t) is not None
                       for t in ("g++", "cmake", "ninja")}

    if verbose:
        print(json.dumps(rep, indent=2))
        verdict = ("OK (CPU + TPU healthy)" if rep["cpu_ok"] and rep["tpu_ok"]
                   else "DEGRADED (CPU ok; TPU unreachable/wedged)"
                   if rep["cpu_ok"] else "BROKEN (CPU path failed)")
        print(f"doctor: {verdict}")
    return rep
