"""On-disk operator cache (utils/opcache.py): the mixing tau assembly
is served from a content-keyed npz after the first build (CLAUDE.md
compile-cache policy applied to the f64 operator assembly)."""

import glob
import os

import numpy as np
import pytest

from spheremanopt_tpu.problems.optimal_mixing import MixingConfig, OptimalMixing

CFG = dict(nx=8, nz=8, n_iters=2, prep_steps=2, dtype="float64",
           device_ops=False)


def _files(d):
    return sorted(glob.glob(os.path.join(d, "ops_*.npz")))


def test_cache_roundtrip_and_sabotaged_rebuild(tmp_path, monkeypatch):
    monkeypatch.setenv("SMO_OP_CACHE", str(tmp_path))
    p1 = OptimalMixing(MixingConfig(**CFG))
    files = _files(str(tmp_path))
    assert len(files) == 1, files   # one entry: (S, MN) together

    # second construction must come FROM the cache: sabotage the builder
    monkeypatch.setattr(
        OptimalMixing, "_build_operators_uncached",
        lambda self, *a, **k: (_ for _ in ()).throw(
            AssertionError("builder called despite warm cache")))
    p2 = OptimalMixing(MixingConfig(**CFG))
    np.testing.assert_array_equal(p1._S_np, p2._S_np)
    np.testing.assert_array_equal(p1._MN_np, p2._MN_np)
    assert p2._S_np.dtype == np.complex128   # exact f64 bits preserved


def test_cache_key_sensitivity(tmp_path, monkeypatch):
    monkeypatch.setenv("SMO_OP_CACHE", str(tmp_path))
    OptimalMixing(MixingConfig(**CFG))
    OptimalMixing(MixingConfig(**{**CFG, "reynolds": 250.0}))
    OptimalMixing(MixingConfig(**{**CFG, "dt": 1e-3}))
    assert len(_files(str(tmp_path))) == 3   # every knob changes the key


def test_cache_none_payload_for_prep_stack(tmp_path, monkeypatch):
    """build_mixnorm=False entries round-trip MN=None (the prep-dt and
    continuous-adjoint builds)."""
    monkeypatch.setenv("SMO_OP_CACHE", str(tmp_path))
    p = OptimalMixing(MixingConfig(**CFG))
    S1, MN1 = p._build_operators(dt=p.cfg.prep_dt, build_mixnorm=False)
    assert MN1 is None
    S2, MN2 = p._build_operators(dt=p.cfg.prep_dt, build_mixnorm=False)
    assert MN2 is None
    np.testing.assert_array_equal(S1, S2)


def test_cache_disabled(monkeypatch):
    from spheremanopt_tpu.utils import opcache

    monkeypatch.setenv("SMO_OP_CACHE", "0")
    assert opcache._cache_dir() is None
    calls = []

    def builder():
        calls.append(1)
        return (np.ones(3), None)

    for _ in range(2):   # every call rebuilds: nothing is persisted
        S, MN = opcache.cached_arrays({"k": 1}, builder, ("S", "MN"))
        assert MN is None
    assert len(calls) == 2


def test_corrupt_entry_rebuilds(tmp_path, monkeypatch):
    monkeypatch.setenv("SMO_OP_CACHE", str(tmp_path))
    p1 = OptimalMixing(MixingConfig(**CFG))
    f = _files(str(tmp_path))[0]
    with open(f, "wb") as fh:
        fh.write(b"torn")
    p2 = OptimalMixing(MixingConfig(**CFG))   # must rebuild, not crash
    np.testing.assert_array_equal(p1._S_np, p2._S_np)


def test_ozaki_split_served_from_cache(tmp_path, monkeypatch):
    """OzakiOp's exact f64 split is served from the on-disk op cache
    (one bench run builds THREE df64 engines; the splits are ~30-90 s
    of pure-CPU work at the mixing reference configs) — bitwise equal
    through the roundtrip, keyed by operator bytes + split geometry."""
    import numpy as np

    from spheremanopt_tpu.ops.doublefloat import OzakiOp

    monkeypatch.setenv("SMO_OP_CACHE", str(tmp_path))
    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 48))
    op1 = OzakiOp(A, "nz,kzc->knc", "nz,knc->kzc")
    files = list(tmp_path.glob("ops_*.npz"))
    assert len(files) == 1          # split cached
    op2 = OzakiOp(A, "nz,kzc->knc", "nz,knc->kzc")
    np.testing.assert_array_equal(op1.slices_np, op2.slices_np)
    assert len(list(tmp_path.glob("ops_*.npz"))) == 1   # served, not rebuilt
    # a different operator gets its own entry (no key collision)
    OzakiOp(A + 1.0, "nz,kzc->knc", "nz,knc->kzc")
    assert len(list(tmp_path.glob("ops_*.npz"))) == 2
