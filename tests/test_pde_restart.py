"""PDE-state restart: mid-trajectory save/load and segment composition.

Reference analogue: Dedalus `IVP_FWD.load_state(filename)` continuation
(`FWD_Solve_SH23.py:459-460`). Every problem's solver state is a dict of
REAL arrays; advancing in segments with a save/load roundtrip in the
middle must reproduce the uninterrupted trajectory exactly.
"""

import numpy as np
import pytest

from spheremanopt_tpu.io.checkpoint import load_pde_state, save_pde_state
from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo
from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg
from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
    SHB23Config,
    SwiftHohenbergBounded,
)


def _problems():
    return [
        ("sh23", SwiftHohenberg(SH23Config(npts=48, n_iters=20, dt=0.05))),
        ("shb23", SwiftHohenbergBounded(SHB23Config(npts=48, n_iters=20, dt=0.01))),
        ("kdyn", KinematicDynamo(KDynConfig(npts=8, n_iters=10, dt=1e-3))),
        ("mixing", OptimalMixing(MixingConfig(nx=16, nz=16, n_iters=10, dt=5e-3))),
    ]


@pytest.mark.parametrize("name,p", _problems(), ids=lambda v: v if isinstance(v, str) else "")
def test_segment_composition_and_roundtrip(tmp_path, name, p):
    x0 = p.generate_ic(seed=7)
    s0 = p.initial_state(x0)

    # uninterrupted: 8 steps
    s_full = p.advance_state(s0, 8)

    # segmented with a save/load roundtrip after 3 steps
    s_mid = p.advance_state(s0, 3)
    path = str(tmp_path / f"{name}_state.npz")
    save_pde_state(path, {k: np.asarray(v) for k, v in s_mid.items()}, step=3,
                   meta={"problem": name})
    loaded, step, meta = load_pde_state(path)
    assert step == 3
    s_resumed = p.advance_state(loaded, 5)

    for k in s_full:
        np.testing.assert_array_equal(np.asarray(s_full[k]),
                                      np.asarray(s_resumed[k]),
                                      err_msg=f"{name}:{k}")
    # states are real (host-transferable on the TPU platform)
    for k, v in s_full.items():
        assert not np.iscomplexobj(np.asarray(v)), (name, k)
    # named fields come out real too
    for k, v in p.state_fields(s_full).items():
        assert np.isfinite(np.asarray(v)).all(), (name, k)


def test_cli_forward_solve_restart(tmp_path):
    """run.py --solve-steps resumes from a --state-in checkpoint and
    reproduces the uninterrupted in-process forward solve. (One
    subprocess: the segment math itself is covered by the in-process
    composition test above.)"""
    import json
    import subprocess
    import sys

    out = tmp_path / "fwd"
    out.mkdir()
    p = SwiftHohenberg(SH23Config(npts=48, n_iters=20, dt=0.05))
    x0 = p.generate_ic(seed=7)
    s0 = p.initial_state(x0)
    s_full = p.advance_state(s0, 8)
    s_mid = p.advance_state(s0, 3)
    mid_path = str(out / "mid.npz")
    save_pde_state(mid_path, {k: np.asarray(v) for k, v in s_mid.items()},
                   step=3, meta={"problem": "sh23"})

    import os

    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "spheremanopt_tpu.run", "sh23",
         "--npts", "48", "--dt", "0.05", "--seed", "7", "--dtype", "float64",
         "--out-dir", str(out), "--solve-steps", "5",
         "--state-in", mid_path, "--state-out", str(out / "resumed.npz")],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert info["from_step"] == 3 and info["to_step"] == 8

    s_res, step_r, _ = load_pde_state(str(out / "resumed.npz"))
    assert step_r == 8
    for k in s_res:
        np.testing.assert_allclose(np.asarray(s_full[k]), s_res[k],
                                   rtol=0, atol=0)
