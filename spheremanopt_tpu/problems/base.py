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


@runtime_checkable
class Problem(Protocol):
    radii: Sequence[float]

    def objective(self, x_list: List[jnp.ndarray]) -> jnp.ndarray: ...

    def gradient(self, x_list: List[jnp.ndarray]) -> List[jnp.ndarray]: ...

    @property
    def inner_products(self): ...

    def generate_ic(self, seed: int = 42) -> List[jnp.ndarray]: ...


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
