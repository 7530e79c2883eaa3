"""Flat-vector state coercion (utils/regrid.reshape_flat_state): a
reference `DAL_PROGRESS.h5` stores each optimisation component as the
FLAT Dedalus vector `Field_to_Vec` produces (C-order flatten +
concatenate — `/root/reference/Sphere_Grad_Descent.py:821-826` dumps
vars(R) verbatim), so `--resume <h5>` must reshape those vectors into
this framework's channel-major layouts before the solvers see them.
Covered: size-matching flat vectors reshape in place for every problem
family, shaped states pass through untouched, KDyn's unambiguous
coarse/fine flat cube is shaped for --regrid, and anything else fails
loudly with the expected-shape message."""

import numpy as np
import pytest

from spheremanopt_tpu.utils.regrid import (
    expected_state_shapes, reshape_flat_state)


def _sh23():
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)
    return SwiftHohenberg(SH23Config(npts=64, n_iters=4))


def _kdyn():
    from spheremanopt_tpu.problems.kinematic_dynamo import (
        KDynConfig, KinematicDynamo)
    return KinematicDynamo(KDynConfig(npts=8, n_iters=2, dt=1e-3))


def _mixing():
    from spheremanopt_tpu.problems.optimal_mixing import (
        MixingConfig, OptimalMixing)
    return OptimalMixing(MixingConfig(nx=32, nz=24, n_iters=2, dt=1e-3))


def test_expected_shapes_match_generate_ic():
    for make in (_sh23, _kdyn, _mixing):
        p = make()
        exp = expected_state_shapes(p)
        ic = p.generate_ic(seed=0)
        assert [tuple(np.shape(x)) for x in ic] == [tuple(s) for s in exp]


def test_flat_vectors_reshape_for_every_family():
    for make in (_sh23, _kdyn, _mixing):
        p = make()
        ic = [np.asarray(x, np.float64) for x in p.generate_ic(seed=1)]
        flat = [x.ravel() for x in ic]  # Field_to_Vec byte order
        out = reshape_flat_state(p, flat)
        for got, want in zip(out, ic):
            assert got.shape == want.shape
            np.testing.assert_array_equal(got, want)


def test_shaped_states_pass_through():
    p = _mixing()
    ic = [np.asarray(x) for x in p.generate_ic(seed=2)]
    out = reshape_flat_state(p, ic)
    assert out[0] is ic[0] or np.shares_memory(out[0], ic[0]) or (
        out[0].shape == ic[0].shape)
    np.testing.assert_array_equal(out[0], ic[0])


def test_kdyn_flat_cube_other_resolution_shaped_for_regrid():
    p = _kdyn()          # mg from npts=8
    mg_src = 6           # a DIFFERENT resolution's flat cube
    v = np.arange(3 * mg_src ** 3, dtype=np.float64)
    out = reshape_flat_state(p, [v.copy(), v.copy()])
    assert out[0].shape == (3, mg_src, mg_src, mg_src)
    np.testing.assert_array_equal(out[0].ravel(), v)


def test_wrong_size_fails_loudly():
    # mixing expects (2, mgx, mgz): a flat vector of unrelated size has
    # no valid interpretation and must fail HERE, not in a solver einsum
    p = _mixing()
    with pytest.raises(ValueError, match="does not match the expected"):
        reshape_flat_state(p, [np.zeros(17)])
    # component-count mismatch is always loud
    with pytest.raises(ValueError, match="components"):
        reshape_flat_state(_sh23(), [np.zeros(4), np.zeros(4)])


def test_sh23_other_length_1d_passes_as_regrid_source():
    # 1-D families: a different-length vector IS a valid --regrid
    # source (coarse/fine state), so it passes through unchanged
    p = _sh23()
    v = np.arange(32, dtype=np.float64)
    out = reshape_flat_state(p, [v])
    assert out[0] is v


def test_pca_passthrough():
    from spheremanopt_tpu.problems.pca import PCAProblem
    p = PCAProblem(np.eye(6))
    assert expected_state_shapes(p) is None
    xs = [np.ones(6)]
    out = reshape_flat_state(p, xs)
    assert len(out) == 1 and out[0] is xs[0]
