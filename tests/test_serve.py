"""Warm-executable optimisation server (spheremanopt_tpu/serve.py):
protocol, executable-cache reuse, sweep batching, persistence, and the
full socket transport round-trip.

The reference has no serving analogue (its batch model is one mpiexec
per study point, `run_Poiseuille_problem.sh:16-17`); the server is the
TPU-idiomatic inversion — compile once, serve many."""

import os
import threading

import numpy as np
import pytest

from spheremanopt_tpu.serve import OptimisationService, request, serve


@pytest.fixture(scope="module")
def svc():
    return OptimisationService()


SH23_CFG = {"npts": 64, "n_iters": 50, "dt": 0.05, "e0": 0.0725}
DRIVER = {"max_iters": 5, "line_search": "wolfe", "cg": True}


def test_status(svc):
    out = svc.handle({"cmd": "status"})
    assert out["ok"] and out["requests"] == 1 and out["executables"] == []


def test_optimise_pca_and_cache_reuse(svc):
    req = {"cmd": "optimise", "problem": "pca",
           "config": {"dim": 24, "matrix_seed": 0}, "seed": 1,
           "driver": {"max_iters": 12, "cg": True}}
    a = svc.handle(req)
    assert a["ok"], a
    assert not a["cache_hit"]
    assert a["iterations"] >= 1
    # maximisation: -J_k (reference convention) is non-decreasing
    J = a["J"]
    assert all(x <= y + 1e-12 for x, y in zip(J, J[1:])), J
    b = svc.handle(dict(req, seed=2))
    assert b["ok"] and b["cache_hit"]
    # warm executable: no recompile -> at least as fast, same key
    st = svc.handle({"cmd": "status"})
    assert len(st["executables"]) == 1


def test_optimise_lbfgs_driver_passthrough(svc):
    """The driver dict forwards straight into jit_optimise_on_multi_sphere,
    so the L-BFGS direction is servable with no protocol change."""
    out = svc.handle({"cmd": "optimise", "problem": "pca",
                      "config": {"dim": 24, "matrix_seed": 0}, "seed": 1,
                      "driver": {"max_iters": 12, "line_search": "wolfe",
                                 "direction": "lbfgs"}})
    assert out["ok"], out
    J = out["J"]
    assert all(x <= y + 1e-12 for x, y in zip(J, J[1:])), J


def test_optimise_matches_direct_driver_call(svc):
    out = svc.handle({"cmd": "optimise", "problem": "sh23",
                      "config": SH23_CFG, "driver": DRIVER, "seed": 3})
    assert out["ok"], out

    from spheremanopt_tpu.optim.jit_driver import jit_optimise_on_multi_sphere
    from spheremanopt_tpu.problems.swift_hohenberg import (
        SH23Config, SwiftHohenberg)

    p = SwiftHohenberg(SH23Config(**SH23_CFG))
    opt = jit_optimise_on_multi_sphere(p.objective_and_gradient,
                                       p.inner_product, p.radii, **DRIVER)
    res = opt(p.generate_ic(seed=3))
    n = int(res.iterations)
    np.testing.assert_allclose(out["J"],
                               np.asarray(res.function_values)[:n],
                               rtol=1e-12)


def test_sweep_rows_match_individual_optimise(svc):
    sweep = svc.handle({"cmd": "sweep", "problem": "sh23",
                        "config": SH23_CFG, "driver": DRIVER,
                        "seeds": [3, 5], "e0": [0.0725, 0.05]})
    assert sweep["ok"], sweep
    assert len(sweep["points"]) == 2
    # the first sweep point (e0 = config default) must equal the plain
    # optimise of the previous test, row for row
    single = svc.handle({"cmd": "optimise", "problem": "sh23",
                         "config": SH23_CFG, "driver": DRIVER, "seed": 3})
    row = sweep["points"][0]
    assert row["iterations"] == single["iterations"]
    np.testing.assert_allclose(row["J"], single["J"], rtol=1e-12)
    # distinct radii -> genuinely different trajectories
    assert sweep["points"][1]["J"] != row["J"]


def test_sweep_mixing_aux_operand_path(svc):
    """The sweep executable must carry the mixing operator stacks as an
    UNBATCHED vmapped jit argument (in_axes=None), not a closure —
    closing over the stacks embeds hundreds of MB in the program body on
    TPU (CLAUDE.md platform rule 1). Rows must match plain optimise."""
    cfg = {"nx": 32, "nz": 24, "n_iters": 30, "dt": 5e-3, "s": 1}
    driver = {"max_iters": 3, "line_search": "wolfe", "cg": True}
    sweep = svc.handle({"cmd": "sweep", "problem": "mixing",
                        "config": cfg, "driver": driver, "seeds": [3, 5]})
    assert sweep["ok"], sweep
    assert len(sweep["points"]) == 2
    single = svc.handle({"cmd": "optimise", "problem": "mixing",
                         "config": cfg, "driver": driver, "seed": 3})
    assert single["ok"], single
    row = sweep["points"][0]
    assert row["iterations"] == single["iterations"]
    np.testing.assert_allclose(row["J"], single["J"], rtol=1e-10)


def test_sweep_executable_is_cached(svc):
    req = {"cmd": "sweep", "problem": "sh23", "config": SH23_CFG,
           "driver": DRIVER, "seeds": [3, 5], "e0": [0.0725, 0.05]}
    before = svc.handle({"cmd": "status"})["cache_hits"]
    out = svc.handle(req)
    assert out["ok"]
    after = svc.handle({"cmd": "status"})["cache_hits"]
    # optimiser-cache hit + sweep-executable hit on the repeat call
    assert after >= before + 2
    keys = svc.handle({"cmd": "status"})["executables"]
    assert any('"kind": "sweep"' in k and '"batch": 2' in k for k in keys)


def test_save_persists_result(svc, tmp_path):
    path = str(tmp_path / "serve_out.npz")
    out = svc.handle({"cmd": "optimise", "problem": "pca",
                      "config": {"dim": 24, "matrix_seed": 0}, "seed": 1,
                      "driver": {"max_iters": 12, "cg": True},
                      "save": path})
    assert out["ok"] and out["saved"] == path
    dat = np.load(path)
    assert dat["x_opt_0"].shape == (24,)
    assert int(dat["iterations"]) == out["iterations"]


def test_errors_are_replies_not_crashes(svc):
    out = svc.handle({"cmd": "optimise", "problem": "nope"})
    assert not out["ok"] and "unknown problem" in out["error"]
    out = svc.handle({"cmd": "optimise", "problem": "sh23",
                      "config": {"bogus_key": 1}})
    assert not out["ok"]
    out = svc.handle({"cmd": "frobnicate"})
    assert not out["ok"] and "unknown cmd" in out["error"]
    # service must still be alive
    assert svc.handle({"cmd": "status"})["ok"]


def test_socket_transport_round_trip(tmp_path):
    sock = str(tmp_path / "smo.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    st = request(sock, {"cmd": "status"})
    assert st["ok"] and st["executables"] == []
    out = request(sock, {"cmd": "optimise", "problem": "pca",
                         "config": {"dim": 16, "matrix_seed": 0},
                         "seed": 7, "driver": {"max_iters": 8}})
    assert out["ok"] and out["iterations"] >= 1
    bad = request(sock, {"cmd": "optimise", "problem": "nope"})
    assert not bad["ok"]
    bye = request(sock, {"cmd": "shutdown"})
    assert bye["ok"]
    t.join(10)
    assert not t.is_alive()
    assert not os.path.exists(sock)


def test_concurrent_clients_status_during_long_compute(tmp_path):
    """Two concurrent clients (VERDICT r3 item 5): a status request is
    answered IMMEDIATELY while a long compute runs (threaded accept),
    the occupancy is visible ('busy'/'queued'), and a second compute
    queues FIFO without corruption."""
    import time as _time

    sock = str(tmp_path / "smo.sock")
    ready = threading.Event()
    t = threading.Thread(target=serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(10)

    # slow compute: first-time compile of a fresh executable dominates
    slow = {"cmd": "optimise", "problem": "pca",
            "config": {"dim": 48, "matrix_seed": 3}, "seed": 1,
            "driver": {"max_iters": 30, "cg": True}}
    done = {}

    def long_call(key, req):
        done[key] = request(sock, req, timeout=300.0)

    t1 = threading.Thread(target=long_call, args=("a", slow), daemon=True)
    t1.start()
    # a second compute queues behind the first
    t2 = threading.Thread(
        target=long_call,
        args=("b", dict(slow, seed=2)), daemon=True)
    t2.start()

    # while the computes run, status must answer promptly and report
    # occupancy at least once
    saw_busy = False
    deadline = _time.time() + 120
    while (t1.is_alive() or t2.is_alive()) and _time.time() < deadline:
        t0 = _time.time()
        st = request(sock, {"cmd": "status"}, timeout=30.0)
        assert st["ok"]
        assert "busy" in st and "queued" in st
        if st["busy"] is not None or st["queued"] > 0:
            saw_busy = True
            # status latency while busy: the threaded accept answers
            # without waiting for the worker lock
            assert _time.time() - t0 < 5.0
        _time.sleep(0.05)
    t1.join(120)
    t2.join(120)
    assert done["a"]["ok"] and done["b"]["ok"], done
    assert saw_busy, "status never observed the busy/queued occupancy"
    # both computes produced untangled, valid rows
    assert done["a"]["iterations"] >= 1 and done["b"]["iterations"] >= 1
    assert done["a"]["J"] != done["b"]["J"]  # different seeds
    request(sock, {"cmd": "shutdown"})
    t.join(10)
