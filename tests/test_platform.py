"""utils/platform.py::apply_platform — the shared in-process platform
force every entry point routes through (CLAUDE.md rule 5: env-var
platform selection either doesn't work or hangs startup on axon hosts,
so the dance must live in exactly one place).

Each case runs in a SUBPROCESS: apply_platform initialises the JAX
backend, and the test process's backend/x64 state must not leak between
cases (or into the rest of the suite, which owns its own CPU config)."""

import json
import os
import subprocess
import sys

import pytest

_PROBE = """
import json, sys
sys.path.insert(0, {repo!r})
from spheremanopt_tpu.utils.platform import apply_platform

on_tpu = apply_platform({args})
import jax
print(json.dumps({{
    "on_tpu": on_tpu,
    "platform": jax.devices()[0].platform,
    "x64": bool(jax.config.jax_enable_x64),
}}))
"""

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: str, env_extra=None):
    env = dict(os.environ)
    # never let the probe child touch the axon plugin: these tests must
    # pass (and not hang) on a host with a wedged tunnel
    env.pop("JAX_PLATFORMS", None)
    env.pop("PYTHONPATH", None)
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=_REPO, args=args)],
        capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_explicit_cpu_enables_x64_auto():
    r = _run("'cpu'")
    assert r == {"on_tpu": False, "platform": "cpu", "x64": True}


def test_env_var_request_is_honored_in_process():
    # JAX_PLATFORM_NAME=cpu alone initialises the axon plugin (measured
    # startup hang under a wedged tunnel); apply_platform must convert
    # it to the safe in-process force
    r = _run("None", env_extra={"JAX_PLATFORM_NAME": "cpu"})
    assert r["platform"] == "cpu" and r["x64"] is True


def test_x64_none_leaves_flag_untouched():
    r = _run("'cpu', x64=None")
    assert r["platform"] == "cpu" and r["x64"] is False


def test_x64_true_forces():
    r = _run("'cpu', x64=True")
    assert r["x64"] is True


def test_x64_false_is_untouched_alias():
    r = _run("'cpu', x64=False")
    assert r["x64"] is False


@pytest.mark.parametrize("entry", [
    "spheremanopt_tpu/run.py",
    "spheremanopt_tpu/serve.py",
    "examples/lbfgs_vs_cg.py",
    "examples/mixing_e0_sweep.py",
    "examples/sh23_batch_sweep.py",
    "examples/sh23_critical_seed.py",
    "examples/kdyn_critical_rm.py",
    "examples/kdyn_sharded_optimisation.py",
    "examples/mixing_sharded_optimisation.py",
    "baselines/make_mixing256_truth.py",
    "baselines/make_kdyn24_truth.py",
])
def test_entry_points_route_through_helper(entry):
    """No entry point may re-grow its own copy of the platform dance —
    a drifted copy silently reintroduces the wedge-hang (code-review
    r3). bench.py and __graft_entry__.py are exempt: the bench owns the
    tunnel-health machinery itself, and the graft entry must stay
    dependency-free for the driver."""
    src = open(os.path.join(_REPO, entry)).read()
    assert "apply_platform" in src, f"{entry} no longer uses the helper"
    assert 'config.update("jax_platforms"' not in src, (
        f"{entry} re-grew an inline jax_platforms update")
