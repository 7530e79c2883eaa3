"""`spheremanopt_tpu.run doctor` — the operator health report.

The TPU probe is budgeted to a short timeout here: on a healthy host it
answers fast, on a wedged one the probe child is killed at the deadline
either way — the doctor must never hang, that is its whole point."""

import json
import subprocess
import sys

from spheremanopt_tpu.utils.doctor import run_doctor


def test_report_shape_and_cpu_health():
    rep = run_doctor(probe_timeout_s=3.0, verbose=False)
    assert rep["cpu_ok"] is True, rep["cpu"]
    for key in ("python", "jax", "cpu", "tpu", "tpu_ok", "compile_cache",
                "op_cache", "native_io", "compilers"):
        assert key in rep, key
    # tpu_ok is an environment fact (may be wedged) — only shape-checked
    assert isinstance(rep["tpu_ok"], bool)
    assert rep["compilers"]["g++"] is True


def test_cli_doctor_exits_zero_and_emits_json():
    out = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "doctor"],
        capture_output=True, text=True, timeout=240,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "SMO_DOCTOR_PROBE_S": "3"})
    assert out.returncode == 0, out.stderr
    body = out.stdout[out.stdout.index("{"):out.stdout.rindex("}") + 1]
    rep = json.loads(body)
    assert rep["cpu_ok"] is True
    assert "doctor:" in out.stdout


def test_tpu_probe_rejects_cpu_fallback():
    """A silently-CPU probe (no axon plugin; value still 16384.0) must
    NOT report TPU healthy — the ADVICE r3 false-positive."""
    from spheremanopt_tpu.utils.doctor import _tpu_probe_ok

    assert _tpu_probe_ok({"ok": True, "out": "axon 16384.0"})
    assert _tpu_probe_ok({"ok": True, "out": "tpu 16384.0"})
    assert not _tpu_probe_ok({"ok": True, "out": "cpu 16384.0"})
    assert not _tpu_probe_ok({"ok": True, "out": "16384.0"})
    assert not _tpu_probe_ok({"ok": False, "out": "axon 16384.0"})
