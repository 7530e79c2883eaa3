"""Assembly-only problem construction in non-x64 processes.

The bench child runs ON THE TPU with jax x64 DISABLED (platform rule 2)
yet must read the exact f64 numpy operators of the SHB23/mixing problems
for the CPU baselines (`baselines/{shb23,mixing}_numpy.py`). The
`device_ops=False` mode constructs those operators without creating any
jax array — so `check_x64`'s truncation hazard cannot occur — while
every solve entry point fails loudly. Regression test for the r3 bench
breakage where the construction-time check_x64 guard rejected the
legitimate assembly-only f64 constructions and degraded the whole bench
run to `_error` (bench.py's retry emitted `both attempts failed`).

These run in a SUBPROCESS because conftest enables x64 globally.
"""

import subprocess
import sys

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")   # rule 5: in-process only
assert not jax.config.jax_enable_x64

import numpy as np

from spheremanopt_tpu.problems.swift_hohenberg_bounded import (
    SHB23Config, SwiftHohenbergBounded)
from spheremanopt_tpu.problems.optimal_mixing import (
    MixingConfig, OptimalMixing)

# 1. f64 + device placement in a non-x64 process: loud construction error
for make in (
    lambda: SwiftHohenbergBounded(SHB23Config(npts=32, n_iters=4,
                                              dtype="float64")),
    lambda: OptimalMixing(MixingConfig(nx=8, nz=8, n_iters=2,
                                       dtype="float64")),
):
    try:
        make()
    except ValueError as e:
        assert "x64" in str(e)
    else:
        raise AssertionError("f64 construction should raise without x64")

# 2. assembly-only f64 construction works and the operators ARE f64 numpy
p = SwiftHohenbergBounded(SHB23Config(npts=32, n_iters=4, dtype="float64",
                                      device_ops=False))
assert isinstance(p._A_lin, np.ndarray) and p._A_lin.dtype == np.float64
assert isinstance(np.asarray(p._w), np.ndarray)
assert np.asarray(p._w).dtype == np.float64

m = OptimalMixing(MixingConfig(nx=8, nz=8, n_iters=2, dtype="float64",
                               device_ops=False))
assert isinstance(m._S_np, np.ndarray) and m._S_np.dtype == np.complex128
assert m._ops is None

# 3. solve paths refuse the assembly-only mode instead of truncating
x_shb = [np.zeros(32)]
x_mix = [np.zeros((2, 12, 12))]
for fn in (lambda: p.objective(x_shb),
           lambda: p.gradient(x_shb),
           lambda: p.objective_and_gradient(x_shb),
           lambda: p.generate_ic(),
           lambda: m.objective(x_mix),
           lambda: m.objective_and_gradient(x_mix),
           lambda: m.generate_ic()):
    try:
        fn()
    except RuntimeError as e:
        assert "device_ops" in str(e)
    else:
        raise AssertionError("solve should raise in assembly-only mode")

# 4. the baseline classes construct end-to-end in this non-x64 process
#    (exactly what the bench child does) and carry f64 operators
sys_path_baselines = True
from baselines.shb23_numpy import SHB23Numpy
from baselines.mixing_numpy import MixingNumpy

b = SHB23Numpy(npts=32, n_iters=4)
assert b.A_lin.dtype == np.float64
mm = MixingNumpy(nx=8, nz=8, n_iters=2)
assert mm.S.dtype == np.complex128

print("ASSEMBLY_ONLY_OK")
"""


def test_assembly_only_f64_in_non_x64_process():
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], capture_output=True, text=True,
        timeout=300, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ASSEMBLY_ONLY_OK" in out.stdout
