"""`--direction rtr` on the TPU-default CLI paths (VERDICT r4 item 6).

The Pallas kernels and df64 Ozaki ops carry custom_vjp reverse rules
only, so RTR's forward-linearized HVPs cannot trace them. The CLI now
AUTO-SUBSTITUTES the equivalent pure-autodiff XLA objective (same
discretisation) with a loud note instead of hard-rejecting — the
measured-best optimiser must run from the default TPU configs. These
tests pin the substitution and its trajectory parity with the explicit
matmul config.
"""

import json

import pytest

from spheremanopt_tpu.run import build_parser, main, make_problem


def _args(argv):
    return build_parser().parse_args(argv)


def test_rtr_pallas_substitutes_matmul_objective(capsys):
    a = _args(["sh23", "--direction", "rtr", "--method", "pallas",
               "--npts", "32", "--n-iters", "10"])
    p, _, _ = make_problem(a)
    assert p.cfg.method == "matmul"
    assert "substituting" in capsys.readouterr().out


def test_rtr_pallas_substitutes_xla_for_kdyn(capsys):
    a = _args(["kdyn", "--direction", "rtr", "--method", "pallas",
               "--npts", "8", "--n-iters", "5"])
    p, _, _ = make_problem(a)
    assert p.cfg.method == "xla"
    out = capsys.readouterr().out
    assert "substituting" in out


def test_rtr_df64_substitutes_standard_precision(capsys):
    a = _args(["mixing", "--direction", "rtr", "--precision", "df64",
               "--nx", "16", "--nz", "8", "--n-iters", "5"])
    p, _, _ = make_problem(a)
    assert p._dfe is None          # df64 engine not built
    assert "substituting" in capsys.readouterr().out


def test_rtr_pallas_cli_trajectory_matches_explicit_matmul(tmp_path):
    """End-to-end: `run.py sh23 --direction rtr --method pallas` lands
    the IDENTICAL trajectory as the explicit matmul config (the
    substitution IS the matmul objective, so parity is exact)."""
    outs = {}
    for method in ("pallas", "matmul"):
        out = str(tmp_path / method)
        rc = main(["sh23", "--direction", "rtr", "--method", method,
                   "--npts", "32", "--n-iters", "20", "--max-iters",
                   "3", "--quiet", "--out-dir", out])
        assert rc == 0
        outs[method] = json.loads(
            (tmp_path / method / "summary.json").read_text())
    assert outs["pallas"]["iterations"] == outs["matmul"]["iterations"]
    assert outs["pallas"]["J_final"] == outs["matmul"]["J_final"]
    assert (outs["pallas"]["residuals_final"]
            == outs["matmul"]["residuals_final"])


def test_rtr_without_pallas_is_untouched():
    a = _args(["sh23", "--direction", "rtr", "--npts", "32",
               "--n-iters", "10"])
    p, _, _ = make_problem(a)
    assert p.cfg.method in ("matmul", "fft")   # CPU default path


def test_df_adjoint_cli_wire(tmp_path):
    """--df-adjoint composes with --precision df64 on BOTH problems
    (mixing + kdyn) and is rejected loudly without it."""
    from spheremanopt_tpu.run import build_parser, make_problem

    a = build_parser().parse_args(
        ["mixing", "--precision", "df64", "--df-adjoint",
         "--dtype", "float32",   # the df64 engine is the f32 TPU mode
         "--nx", "16", "--nz", "8", "--n-iters", "5"])
    p, _, _ = make_problem(a)
    assert p._dfe is not None and p._dfe.with_adjoint
    a = build_parser().parse_args(
        ["kdyn", "--precision", "df64", "--df-adjoint",
         "--dtype", "float32", "--npts", "8", "--n-iters", "5"])
    p, _, _ = make_problem(a)
    assert p._dfe is not None and p._dfe.with_adjoint
    for prob in ("mixing", "kdyn"):
        a = build_parser().parse_args(
            [prob, "--df-adjoint", "--n-iters", "5"])
        with pytest.raises(SystemExit, match="df64"):
            make_problem(a)


def test_df_adjoint_rejected_outside_df64_problems():
    """--df-adjoint on problems without a df64 engine must fail loudly,
    not silently drop the flag (r5 self-review finding)."""
    from spheremanopt_tpu.run import build_parser, make_problem

    a = build_parser().parse_args(
        ["sh23", "--precision", "df64", "--df-adjoint", "--npts", "32"])
    with pytest.raises(SystemExit, match="no df64 mode"):
        make_problem(a)


def test_rtr_substitution_also_drops_df_adjoint(capsys):
    """--direction rtr --precision df64 --df-adjoint must substitute
    (df_adjoint rides the dropped df64 engine), not abort with a
    misleading 'requires --precision df64' (r5 self-review finding)."""
    from spheremanopt_tpu.run import build_parser, make_problem

    a = build_parser().parse_args(
        ["mixing", "--direction", "rtr", "--precision", "df64",
         "--df-adjoint", "--dtype", "float32",
         "--nx", "16", "--nz", "8", "--n-iters", "5"])
    p, _, _ = make_problem(a)
    assert p._dfe is None
    assert "substituting" in capsys.readouterr().out
