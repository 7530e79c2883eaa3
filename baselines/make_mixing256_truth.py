"""Regenerate baselines/mixing256_truth.npz — pinned f64 truth (J and
the fused gradient) for the mixing 256x128 s=1 reference config at the
SEED-42 F32 IC (the IC stream the TPU bench actually uses; jax.random
draws differ by dtype, so the old f64-IC pin J=0.03860067... carried
4.5e-5 of IC-mismatch noise into every reported accuracy).

Run on CPU: python baselines/make_mixing256_truth.py
Cross-validated against baselines/mixing_numpy.py at reduced steps by
tests/test_baseline_parity-style machinery; the full-config numpy
cross-check (726.7 s) was done once in r2 for the f64-IC pipeline
(BASELINE.md).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# shared in-process CPU force + x64 (CLAUDE.md rule 5)
from spheremanopt_tpu.utils.platform import apply_platform  # noqa: E402

apply_platform("cpu", x64=True)

from spheremanopt_tpu.problems.optimal_mixing import (  # noqa: E402
    MixingConfig,
    OptimalMixing,
)


def main():
    p32 = OptimalMixing(MixingConfig(dtype="float32", s=1))
    x0 = np.asarray(p32.generate_ic(seed=42)[0], np.float64)
    p = OptimalMixing(MixingConfig(dtype="float64", s=1))
    J, g = p.objective_and_gradient([x0])

    # independent cross-validation BEFORE writing, like the kdyn truth
    # maker: the hand-rolled numpy reverse sweep at REDUCED steps (the
    # full 1000-step sweep costs 726.7 s; 60 steps exercise the same
    # solve/transform/NL/mix-norm transposes at ~1/16 the cost), so an
    # autodiff regression in optimal_mixing.py cannot be baked into the
    # truth artifact
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mixing_numpy import MixingNumpy

    n_chk = 60
    p_chk = OptimalMixing(MixingConfig(dtype="float64", s=1,
                                       n_iters=n_chk))
    J_chk, g_chk = p_chk.objective_and_gradient([x0])
    sim = MixingNumpy(n_iters=n_chk)
    J_np = sim.forward(x0)
    rel_j = abs(float(J_chk) - J_np) / abs(J_np)
    assert rel_j < 1e-12, (float(J_chk), J_np, rel_j)
    g_np = sim.gradient(x0)
    rel_g = (np.linalg.norm(np.asarray(g_chk[0]) - g_np)
             / np.linalg.norm(g_np))
    assert rel_g < 1e-9, rel_g
    print(f"numpy cross-check ok at {n_chk} steps: "
          f"J rel {rel_j:.2e}, grad rel {rel_g:.2e}")

    out = os.path.join(os.path.dirname(__file__), "mixing256_truth.npz")
    np.savez_compressed(out, J=np.float64(float(J)),
                        g=np.asarray(g[0], np.float32),
                        x0=x0.astype(np.float32))
    print(f"wrote {out}: J = {float(J)!r}")


if __name__ == "__main__":
    main()
