"""Regenerate baselines/kdyn24_truth.npz — the pinned f64 truth for the
KDyn 24^3 reference-config bench accuracy rows (J + both sphere
gradients at the seed-42 IC, cross-validated jax-CPU-f64 vs the
hand-rolled numpy adjoint).

Run on CPU: python baselines/make_kdyn24_truth.py
The bench asserts its IC matches the stored one, so a generate_ic change
breaks visibly rather than silently shifting the accuracy reference
(same convention as the mixing pinned J64, bench.py::bench_mixing).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

# shared in-process CPU force + x64 (CLAUDE.md rule 5)
from spheremanopt_tpu.utils.platform import apply_platform  # noqa: E402

apply_platform("cpu", x64=True)

from spheremanopt_tpu.problems.kinematic_dynamo import (  # noqa: E402
    KDynConfig,
    KinematicDynamo,
)


def main():
    # IC exactly as the TPU bench generates it: f32 problem, seed 42
    p32 = KinematicDynamo(
        KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype="float32",
                   project_gradients=False))
    x0 = [np.asarray(x, np.float64) for x in p32.generate_ic(seed=42)]

    p64 = KinematicDynamo(
        KDynConfig(npts=24, n_iters=2000, dt=5e-4, dtype="float64",
                   project_gradients=False))
    J, g = p64.objective_and_gradient(x0)
    J = float(J)
    gb, gu = np.asarray(g[0]), np.asarray(g[1])

    # independent cross-validation: hand-rolled numpy reverse sweep —
    # BOTH the objective and the pinned gradients, so a reverse-sweep-only
    # autodiff regression cannot be baked into the truth artifact
    from kdyn_numpy import KDynNumpy

    sim = KDynNumpy(npts=24, dt=5e-4, n_iters=2000)
    J_np = sim.forward(x0[0], x0[1])
    rel = abs(J - J_np) / abs(J)
    assert rel < 1e-12, (J, J_np, rel)
    gb_np, gu_np = sim.gradient(x0[0], x0[1])
    rel_gb = np.linalg.norm(gb - gb_np) / np.linalg.norm(gb_np)
    rel_gu = np.linalg.norm(gu - gu_np) / np.linalg.norm(gu_np)
    assert rel_gb < 1e-9 and rel_gu < 1e-9, (rel_gb, rel_gu)

    out = os.path.join(os.path.dirname(__file__), "kdyn24_truth.npz")
    # f32 storage for the gradients (1.1 MB): adds ~6e-8 relative noise,
    # far below the 1e-4..1e-3 accuracy floors being measured
    np.savez_compressed(
        out, J=np.float64(J),
        gb=gb.astype(np.float32), gu=gu.astype(np.float32),
        b0=np.asarray(x0[0], np.float32), u0=np.asarray(x0[1], np.float32))
    print(f"wrote {out}: J = {J!r} (numpy cross-check J rel {rel:.1e}, "
          f"grad_B rel {rel_gb:.1e}, grad_U rel {rel_gu:.1e})")


if __name__ == "__main__":
    main()
