"""Problem protocol: the callable triple the optimiser and gradient test
consume, plus shared helpers.

The reference's contract is functional — each problem supplies
`(f, Grad_f, Inner_Product)` over lists of flat vectors (`README.md:25-29`).
Here a `Problem` exposes the same triple as jitted methods over lists of
jnp arrays, together with the sphere radii and IC generation, so one
object fully specifies an optimisation:

    p = SwiftHohenberg(cfg)
    x0 = p.generate_ic(seed=42)
    res = optimise_on_multi_sphere(x0, p.radii, p.objective, p.gradient,
                                   p.inner_products, ...)
"""

from __future__ import annotations

from typing import Callable, List, Protocol, Sequence, runtime_checkable

import jax
import jax.numpy as jnp


def check_x64(dtype) -> None:
    """Fail loudly when a float64 problem config is constructed in a
    process with jax x64 disabled. Without this, every jnp.asarray /
    device_put would silently truncate the f64 operator stacks and scan
    carries to f32 (a UserWarning at most) while the f32 compensation
    machinery stays off — a 1000-step trajectory then carries f32-class
    error under a config labelled float64. Tests/CLI enable x64
    (tests/conftest.py, run.py); library users get this check."""
    if jnp.dtype(dtype) == jnp.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "dtype='float64' requires jax x64 — call "
            "jax.config.update('jax_enable_x64', True) before "
            "constructing the problem, or use dtype='float32' (the TPU "
            "runs f32; arrays would otherwise be silently truncated)")


def check_choice(field: str, value, allowed) -> None:
    """Loud validation for string config switches: an unrecognised value
    (e.g. method='fft' on a problem whose paths are matmul|pallas, or a
    capitalised adjoint='Continuous') must not silently select a
    fallback compute path or gradient/inner-product pairing."""
    if value not in allowed:
        raise ValueError(
            f"{field} must be one of {sorted(allowed)!r}, got {value!r}")


@runtime_checkable
class Problem(Protocol):
    radii: Sequence[float]

    def objective(self, x_list: List[jnp.ndarray]) -> jnp.ndarray: ...

    def gradient(self, x_list: List[jnp.ndarray]) -> List[jnp.ndarray]: ...

    @property
    def inner_products(self): ...

    def generate_ic(self, seed: int = 42) -> List[jnp.ndarray]: ...


class SegmentAdvance:
    """Cached jitted n-step solver advances for PDE-state restart.

    Problems expose `initial_state(x_list) -> dict[str, real array]` and
    `advance_state(state, n_steps) -> state` built on this helper — the
    TPU analogue of the reference's Dedalus `IVP_FWD.load_state`
    restart path (`FWD_Solve_SH23.py:459-460`). States are dicts of REAL
    arrays (complex fields ride as stacked re/im planes: complex
    host<->device transfers are unsupported on this platform), so they
    round-trip through `io.checkpoint.save_pde_state`/`load_pde_state`.

    `step_fn(state, *consts) -> state` must be jittable; `consts` carry
    device-resident operator stacks (e.g. the mixing per-kx solves) as
    jit ARGUMENTS rather than closures (axon rule: captured device
    buffers re-ship per call). One executable is compiled and cached per
    distinct segment length.
    """

    def __init__(self, step_fn: Callable):
        self._step = step_fn
        self._cache = {}

    def __call__(self, state: dict, n_steps: int, *consts):
        n = int(n_steps)
        if n not in self._cache:
            step = self._step

            def run(state, *consts):
                def body(s, _):
                    return step(s, *consts), None

                s, _ = jax.lax.scan(body, state, xs=None, length=n)
                return s

            self._cache[n] = jax.jit(run)
        return self._cache[n](state, *consts)


def riesz_gradient(objective: Callable, weights) -> Callable:
    """Gradient of `objective` as Riesz representatives under weighted
    inner products IP_i(x, y) = sum(w_i * x * y).

    jax.grad returns covectors g with dJ[v] = sum(g * v); the optimiser's
    geometry needs the representative r with IP(r, v) = dJ[v], i.e.
    r = g / w. `weights` is one array/scalar per state component
    (scalar 1/n for volume-mean products on uniform grids, trapezoid
    vectors on Chebyshev grids — ref `FWD_Solve_SHB23.py:69-81`).
    """
    grad_fn = jax.grad(lambda xs: objective(xs))

    def gradient(x_list):
        raw = grad_fn(list(x_list))
        return [g / w for g, w in zip(raw, weights)]

    return gradient
