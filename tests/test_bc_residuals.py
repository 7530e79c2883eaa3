"""Bounded-problem BC-residual monitoring (VERDICT r4 missing item 3).

The reference logs dz(b) wall residuals along the mixing forward solve
(`FWD_Solve_Poiseuille.py:726-727,747`). The rebuild's tau solve
enforces the BCs EXACTLY per step (they are rows of the inverted block
systems), so the monitored series must sit at tau-solve roundoff for
every post-solve state — these tests pin that, making any operator-
assembly regression (wrong BC row, broken parity split) loudly visible
in the monitoring surface the reference exposes.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def prob():
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    return OptimalMixing(MixingConfig(nx=32, nz=16, n_iters=25, dt=1e-2,
                                      prep_steps=10))


def test_bc_residual_series_shape_and_content(prob):
    x0 = prob.generate_ic(seed=0)
    d = prob.diagnostics(x0)
    bc = np.asarray(d["bc_residuals"])
    # (T+1, wall z=-1 / z=+1, [dz rho, u, w])
    assert bc.shape == (prob.cfg.n_iters + 1, 2, 3)
    assert np.all(np.isfinite(bc)) and np.all(bc >= 0.0)


def test_bc_residuals_pinned_at_tau_solve_roundoff(prob):
    """Every POST-solve state (index >= 1; index 0 is the IC, whose
    2/3-rule dealias mask perturbs the prep solve's exact BCs) must
    satisfy dz(rho)=0 and u=w=0 at z=+-1 to f64 solve roundoff,
    relative to the fields' own scale."""
    x0 = prob.generate_ic(seed=0)
    d = prob.diagnostics(x0)
    bc = np.asarray(d["bc_residuals"])[1:]
    # field scales: wall values are compared against O(1)-normalised
    # state magnitudes (KE ~ e0); 1e-10 is ~1e4 x f64 eps accumulated
    # through the solve chain — far below any physical signal, far
    # above roundoff flakiness
    assert bc.max() < 1e-10, bc.max()


def test_bc_residuals_ride_the_fused_solve(prob):
    """The series must come from the SAME solve as the objective (the
    architecture's zero-extra-solve archiving invariant): the fused
    (J, diag) pair and diagnostics() agree exactly."""
    x0 = prob.generate_ic(seed=0)
    J, diag = prob.objective_and_diagnostics(x0)
    d2 = prob.diagnostics(x0)
    np.testing.assert_array_equal(np.asarray(diag["bc_residuals"]),
                                  np.asarray(d2["bc_residuals"]))
    assert float(J) == float(prob.objective(x0))


def test_adjoint_bc_residuals_pinned_at_roundoff():
    """The continuous-adjoint sweep's wall residuals (dz b_adj, u_adj,
    w_adj at z=+-1) sit at solve roundoff for every step — the
    transposed tau assembly enforces the adjoint BCs exactly."""
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig,
        OptimalMixing,
    )

    p = OptimalMixing(MixingConfig(nx=32, nz=16, n_iters=20, dt=1e-2,
                                   prep_steps=10, adjoint="continuous"))
    x0 = p.generate_ic(seed=0)
    bc = p.adjoint_bc_residuals(x0)
    assert bc.shape == (p.cfg.n_iters, 2, 3)
    assert np.all(np.isfinite(bc))
    assert bc.max() < 1e-10, bc.max()
    # the gradient itself is unchanged by the monitored variant
    g_plain = np.asarray(p.gradient(x0)[0])
    g_mon = np.asarray(p._adj_bc(p._solve_ops(), x0)[0][0])
    np.testing.assert_array_equal(g_plain, g_mon)


def test_adjoint_bc_residuals_rejects_discrete_mode(prob):
    with pytest.raises(ValueError, match="continuous"):
        prob.adjoint_bc_residuals(prob.generate_ic(seed=0))
