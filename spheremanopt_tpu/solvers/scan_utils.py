"""Timestepping scan helpers: checkpointed adjoints and compensated sums.

The reference stores the complete forward trajectory in RAM for adjoint
replay (`GEN_BUFFER`, `FWD_Solve_SH23.py:238-272`). Here the adjoint is
autodiff of the discrete forward; memory policy is expressed through
`jax.checkpoint`:

  * `checkpointed_scan`   — remat each step: the backward pass stores one
    carry per step (exactly the reference's snapshot buffer, but managed
    by XLA in HBM) and recomputes the step internals (FFTs, products).
  * `nested_checkpoint_scan` — sqrt(N) binomial-style nesting: stores
    O(sqrt(N)) carries and recomputes each chunk once, for trajectories
    whose full snapshot buffer would not fit in HBM (the reference prints
    a GB estimate and hopes, `FWD_Solve_KDyn.py:341-345`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def checkpointed_scan(step: Callable, carry, xs=None, length: Optional[int] = None):
    """lax.scan with per-step rematerialisation."""
    return lax.scan(jax.checkpoint(step), carry, xs=xs, length=length)


def offload_checkpoint(step: Callable) -> Callable:
    """Per-step remat whose carry residual lives in HOST memory.

    Like `jax.checkpoint(step)` (the "step" remat mode: one stored carry
    per step, step internals recomputed on the reverse sweep), but the
    stored carries are offloaded to pinned host memory instead of HBM —
    the true analogue of the reference's store-all `GEN_BUFFER`
    (`FWD_Solve_SH23.py:238-272`, host-RAM snapshots) at accelerator
    scale: HBM holds O(1) state while the trajectory streams to/from the
    host over PCIe. Complements `nested_checkpoint_scan` (sqrt(N) HBM,
    one extra recompute) for trajectories too big even for sqrt(N)
    nesting, at the price of host-link bandwidth per step.
    """
    from jax.ad_checkpoint import checkpoint_name

    policy = jax.checkpoint_policies.save_and_offload_only_these_names(
        names_which_can_be_saved=[],
        names_which_can_be_offloaded=["smo_offload_carry"],
        offload_src="device",
        offload_dst="pinned_host",
    )

    def named(carry, *rest):
        carry = checkpoint_name(carry, "smo_offload_carry")
        return step(carry, *rest)

    return jax.checkpoint(named, policy=policy)


def nested_checkpoint_scan(
    step: Callable,
    carry,
    length: int,
    inner: Optional[int] = None,
    return_series: bool = False,
):
    """Two-level checkpointed scan over `length` steps with no per-step xs.

    `step(carry) -> (carry, y)` where y must be a scalar/small pytree that
    is summed across steps (sufficient for cost-functional accumulation;
    the summation is hierarchical — XLA pairwise jnp.sum within each
    chunk, then across chunks — whose f32 error is log-factor class,
    well below the per-step solve rounding; it is NOT Kahan, unlike the
    flat-scan paths' kahan_add).
    Returns (final_carry, summed_y), or with `return_series=True`
    (final_carry, summed_y, per_step_ys) — the stacked per-step y series
    is tiny (scalars) so keeping it does not defeat the sqrt(N) carry
    memory policy; the summed_y arithmetic is identical either way.
    """
    if inner is None:
        inner = max(1, int(length ** 0.5))
    outer, rem = divmod(length, inner)

    def one(c, _):
        c, y = step(c)
        return c, y

    @jax.checkpoint
    def chunk(c):
        c, ys = lax.scan(jax.checkpoint(one), c, xs=None, length=inner)
        tot = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), ys)
        return c, ((tot, ys) if return_series else tot)

    def outer_body(c, _):
        return chunk(c)

    carry, ys = lax.scan(outer_body, carry, xs=None, length=outer)
    if return_series:
        ys, series = ys
    total = jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0), ys)
    # remainder steps: checkpointed like the chunked body — an unwrapped
    # tail would store up to inner-1 steps of FULL internals as backward
    # residuals, defeating the sqrt(N) memory policy exactly at the
    # large-trajectory scales it exists for (primal arithmetic is
    # unchanged; jax.checkpoint only changes what the reverse pass saves)
    ck_step = jax.checkpoint(step)
    rem_ys = []
    for _ in range(rem):
        carry, y = ck_step(carry)
        total = jax.tree_util.tree_map(jnp.add, total, y)
        rem_ys.append(y)
    if not return_series:
        return carry, total
    # (outer, inner, ...) chunk series -> flat per-step order + remainder
    series = jax.tree_util.tree_map(
        lambda a: a.reshape((outer * inner,) + a.shape[2:]), series)
    if rem_ys:
        tail = jax.tree_util.tree_map(
            lambda *ys_: jnp.stack(ys_, axis=0), *rem_ys)
        series = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), series, tail)
    return carry, total, series


def strided_energy_scan(step: Callable, energy: Callable, s0, n_steps: int,
                        stride: int, rdtype, dt: float):
    """Integrate `n_steps` of `step` while (a) Kahan-accumulating the
    time-integrated energy cost and (b) scanning out the energy series
    every `stride` steps — the fused 'scalar_data'-riding-the-FWD-solve
    capture shared by SH23 and SHB23 (single implementation so the
    chunked-Kahan op order cannot drift between them). The J op sequence
    is identical to the plain no-series integration, so objective values
    match bitwise. Per-step ys materialisation is the measured cost of
    stride=1 (BASELINE r3); stride>1 advances `stride` steps in an inner
    scan with no ys and records the chunk-start energy. `stride` need
    not divide `n_steps` (the reference's every-N handler cadence,
    FWD_Solve_SH23.py:499-503, has no such constraint): a short final
    chunk records its start energy too, so the series steps are
    `strided_steps(n_steps, stride)` and the final-step energy is
    always last.
    Returns (final_state, dt * integrated_energy, series)."""

    def body(carry, _):
        s, acc = carry
        e = energy(s)
        acc = kahan_add(acc, e)
        return (step(s), acc), e

    acc0 = kahan_zero(rdtype)
    if stride == 1:
        (s, acc), es = lax.scan(body, (s0, acc0), xs=None, length=n_steps)
    else:
        def outer(carry, _):
            # first of the chunk's `stride` steps inlined so the recorded
            # chunk-start energy IS the accumulated one (XLA cannot CSE a
            # second energy() across the inner scan boundary); op order
            # per step is unchanged, so J still matches the plain
            # integration bitwise
            s_c, acc_c = carry
            e0 = energy(s_c)
            acc_c = kahan_add(acc_c, e0)
            carry, _ = lax.scan(lambda c, x: (body(c, x)[0], None),
                                (step(s_c), acc_c), xs=None,
                                length=stride - 1)
            return carry, e0

        (s, acc), es = lax.scan(outer, (s0, acc0), xs=None,
                                length=n_steps // stride)
        rem = n_steps % stride
        if rem:
            # short final chunk: record its start energy, then advance
            # the remaining steps with the same per-step op order
            s_c, acc_c = (s, acc)
            e0 = energy(s_c)
            acc_c = kahan_add(acc_c, e0)
            (s, acc), _ = lax.scan(lambda c, x: (body(c, x)[0], None),
                                   (step(s_c), acc_c), xs=None,
                                   length=rem - 1)
            es = jnp.concatenate([es, e0[None]])
    eN = energy(s)
    acc = kahan_add(acc, eN)
    return s, dt * acc[0], jnp.concatenate([es, eN[None]])


def strided_steps(n_steps: int, stride: int) -> np.ndarray:
    """Step indices of the `strided_energy_scan` series entries: every
    chunk start plus the final step (which is also the start index of a
    short final chunk's energy when stride does not divide n_steps —
    there the series carries BOTH that chunk start and step n)."""
    steps = np.arange(0, n_steps + 1, stride)
    if n_steps % stride:
        steps = np.append(steps, n_steps)
    return steps


def kahan_add(acc: Tuple[jnp.ndarray, jnp.ndarray], value):
    """Compensated (Kahan) accumulation step: acc = (sum, compensation).

    Keeps cost integrals accurate over thousands of f32 steps on TPU,
    where f64 is unavailable (axon TPUs reject f64 kernels).
    """
    s, comp = acc
    y = value - comp
    t = s + y
    comp = (t - s) - y
    return (t, comp)


def kahan_zero(dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    z = jnp.zeros((), dtype)
    return (z, z)
