"""Per-problem figure assemblies (reference plot_figure_*.py parity,
SURVEY.md component #22): every problem's assembly renders its full
panel set from small-config diagnostics without error."""

import os

import pytest

from spheremanopt_tpu.io.figures import PROBLEM_FIGURES
from spheremanopt_tpu.problems.kinematic_dynamo import KDynConfig, KinematicDynamo
from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing
from spheremanopt_tpu.problems.swift_hohenberg import SH23Config, SwiftHohenberg
from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
    SHB23Config,
    SwiftHohenbergBounded,
)

EXPECTED_PANELS = {"sh23": 3, "shb23": 3, "kdyn": 4, "mixing": 4}


def _make(name):
    return {
        "sh23": lambda: SwiftHohenberg(SH23Config(npts=48, n_iters=20, dt=0.05)),
        "shb23": lambda: SwiftHohenbergBounded(
            SHB23Config(npts=48, n_iters=20, dt=0.01)),
        "kdyn": lambda: KinematicDynamo(KDynConfig(npts=8, n_iters=10, dt=1e-3)),
        "mixing": lambda: OptimalMixing(
            MixingConfig(nx=16, nz=16, n_iters=10, dt=5e-3)),
    }[name]()


@pytest.mark.parametrize("name", sorted(PROBLEM_FIGURES))
def test_problem_figures_render(tmp_path, name):
    p = _make(name)
    x0 = p.generate_ic(seed=7)
    paths = PROBLEM_FIGURES[name](p, x0, str(tmp_path))
    assert len(paths) == EXPECTED_PANELS[name]
    for pth in paths:
        assert os.path.exists(pth) and os.path.getsize(pth) > 1000, pth
