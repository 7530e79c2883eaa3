"""Generalised VMEM-resident fused integrator: u' = A u + B g(u).

Covers every 1D problem in the framework:
  * SH23:  u' = M(u/dt + 1.8u^2 - u^3): ONE matrix — served by the
    shared-matrix variant `fused_objective_shared` (u' = B(lin u + g),
    a single MXU dot per forward step and a single transposed dot per
    reverse step — half the two-matrix form's MXU work)
  * SHB23: u' = A_lin u + A_nl (2u^2 - u^3): genuinely two matrices
    (A_nl carries the dealias projector), two-dot `fused_objective`

Both the FORWARD (timestepping + weighted Euler-rule cost accumulation +
trajectory capture) and the BACKWARD (reverse sweep with the transposed
matrices) run as single Pallas kernels with the operator matrices pinned
in VMEM for the whole scan — the XLA scan restreams them from HBM every
step, which makes these solves bandwidth-bound (BASELINE.md). VMEM
budget at the reference configs: 2 x 1 MB matrices + a 2000 x 512 f32
trajectory (4 MB) fits comfortably in ~16 MB.

`fused_objective(A, B, w, c2, c3, dt, n_steps)` is a custom_vjp pair:
J = -dt * sum_{n=0..N} sum_j w_j u_n,j^2, gradients w.r.t. u0 AND both
operator matrices are exact (FD-verified in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _mm(mat, vec_tile):
    return jax.lax.dot_general(
        vec_tile, mat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _mmT(mat, vec_tile):
    # vec @ mat = mat^T applied to the row vector
    return jax.lax.dot_general(
        vec_tile, mat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _kadd(acc, comp, value):
    # Kahan-compensated accumulation (repo precision policy: f32 cost
    # sums over thousands of steps carry compensation)
    from spheremanopt_tpu.solvers.scan_utils import kahan_add

    return kahan_add((acc, comp), value)


def _fwd_kernel(a_ref, b_ref, w_ref, u0_ref, sc_ref, uT_ref, j_ref,
                *rest, n_steps: int, has_traj: bool = False,
                has_ser: bool = False):
    """Forward: timestepping + weighted Kahan cost accumulation. When
    `has_traj` (grad contexts, via the custom_vjp forward rule) every
    pre-step state is stored for the reverse sweep; the primal objective
    runs trajectory-free — no HBM flush of a trajectory nobody reads.
    When `has_ser` the per-step energies feeding the Kahan sum are ALSO
    stored (lane-replicated rows — the proven dynamic-row-store
    pattern), so fused archiving costs a (n_steps+1, 128) store instead
    of a second forward solve; the J arithmetic is op-identical."""
    c2 = sc_ref[0, 0]
    c3 = sc_ref[0, 1]
    a = a_ref[:]
    b = b_ref[:]
    w = w_ref[:]
    traj_ref = rest[0] if has_traj else None
    ser_ref = rest[1 if has_traj else 0] if has_ser else None

    def body(i, carry):
        u, acc, comp = carry
        if traj_ref is not None:  # static: flags fix the variant
            traj_ref[i, :] = u[0, :]
        e = jnp.sum(w[0, :] * u[0, :] * u[0, :])
        if ser_ref is not None:
            ser_ref[i, :] = jnp.full((ser_ref.shape[-1],), e, jnp.float32)
        acc, comp = _kadd(acc, comp, e)
        g = c2 * u * u + c3 * u * u * u
        u_new = _mm(a, u) + _mm(b, g)
        return (u_new, acc, comp)

    u, acc, comp = jax.lax.fori_loop(
        0, n_steps, body, (u0_ref[:], jnp.float32(0.0), jnp.float32(0.0))
    )
    eN = jnp.sum(w[0, :] * u[0, :] * u[0, :])
    if ser_ref is not None:
        ser_ref[n_steps, :] = jnp.full((ser_ref.shape[-1],), eN, jnp.float32)
    acc, _ = _kadd(acc, comp, eN)
    uT_ref[:] = u
    j_ref[0, 0] = acc


def _bwd_kernel(a_ref, b_ref, w_ref, uT_ref, traj_ref, sc_ref,
                lam_ref, da_ref, db_ref, *, n_steps: int, op_grads: bool):
    """Reverse sweep with A^T/B^T (still VMEM-resident):
    lam_n = A^T lam_{n+1} + g'(u_n) (B^T lam_{n+1}) + scale * w * u_n,
    dA += lam_{n+1} (x) u_n,  dB += lam_{n+1} (x) g(u_n)."""
    c2 = sc_ref[0, 0]
    c3 = sc_ref[0, 1]
    scale = sc_ref[0, 2]   # = -gbar * dt * 2
    a = a_ref[:]
    b = b_ref[:]
    w = w_ref[:]

    da_ref[:] = jnp.zeros_like(da_ref)
    db_ref[:] = jnp.zeros_like(db_ref)
    lam0 = scale * (w * uT_ref[:])

    def body(k, lam):
        i = n_steps - 1 - k
        # rows 1..7 of lam are identically zero (w zero there), so all
        # row-0 quantities can broadcast as (1, mg) — Mosaic has no
        # scatter, so never build tiles via .at[].set
        u_row = traj_ref[i, :].reshape(1, -1)
        g_row = c2 * u_row * u_row + c3 * u_row * u_row * u_row
        if op_grads:  # static: operator cotangents requested
            # dA += lam_{n+1} (x) u_n, dB += lam_{n+1} (x) g(u_n)
            lam_col = lam[0, :].reshape(-1, 1)
            da_ref[:, :] += lam_col * u_row
            db_ref[:, :] += lam_col * g_row
        wa = _mmT(a, lam)
        wb = _mmT(b, lam)
        gprime = 2.0 * c2 * u_row + 3.0 * c3 * u_row * u_row
        lam_new = wa + gprime * wb + scale * (w * u_row)
        return lam_new

    lam = jax.lax.fori_loop(0, n_steps, body, lam0)
    lam_ref[:] = lam


# ---------------------------------------------------------------------------
# shared-matrix variant: u' = B (lin u + g(u))
#
# SH23's step is ONE matrix — u' = M(u/dt + g), i.e. A = B/dt — so the
# generalised two-matrix kernel runs twice the MXU work it needs. The
# shared form folds the linear term into the nonlinear rhs and runs ONE
# dot per forward step and ONE transposed dot per reverse step.
# ---------------------------------------------------------------------------


def _fwd_kernel_shared(b_ref, w_ref, u0_ref, sc_ref, uT_ref, j_ref,
                       *rest, n_steps: int, has_traj: bool = False,
                       has_ser: bool = False):
    """Shared-matrix forward; optional traj/series outputs as in
    `_fwd_kernel`."""
    c2 = sc_ref[0, 0]
    c3 = sc_ref[0, 1]
    lin = sc_ref[0, 2]
    b = b_ref[:]
    w = w_ref[:]
    traj_ref = rest[0] if has_traj else None
    ser_ref = rest[1 if has_traj else 0] if has_ser else None

    def body(i, carry):
        u, acc, comp = carry
        if traj_ref is not None:  # static: flags fix the variant
            traj_ref[i, :] = u[0, :]
        e = jnp.sum(w[0, :] * u[0, :] * u[0, :])
        if ser_ref is not None:
            ser_ref[i, :] = jnp.full((ser_ref.shape[-1],), e, jnp.float32)
        acc, comp = _kadd(acc, comp, e)
        v = lin * u + c2 * u * u + c3 * u * u * u
        return (_mm(b, v), acc, comp)

    u, acc, comp = jax.lax.fori_loop(
        0, n_steps, body, (u0_ref[:], jnp.float32(0.0), jnp.float32(0.0))
    )
    eN = jnp.sum(w[0, :] * u[0, :] * u[0, :])
    if ser_ref is not None:
        ser_ref[n_steps, :] = jnp.full((ser_ref.shape[-1],), eN, jnp.float32)
    acc, _ = _kadd(acc, comp, eN)
    uT_ref[:] = u
    j_ref[0, 0] = acc


def _bwd_kernel_shared(b_ref, w_ref, uT_ref, traj_ref, sc_ref,
                       lam_ref, db_ref, *, n_steps: int, op_grads: bool):
    """Reverse sweep of the shared-matrix step (one transposed dot):
    lam_n = (lin + g'(u_n)) . (B^T lam_{n+1}) + scale * w * u_n,
    dB += lam_{n+1} (x) (lin u_n + g(u_n))."""
    c2 = sc_ref[0, 0]
    c3 = sc_ref[0, 1]
    lin = sc_ref[0, 2]
    scale = sc_ref[0, 3]   # = -gbar * dt * 2
    b = b_ref[:]
    w = w_ref[:]

    db_ref[:] = jnp.zeros_like(db_ref)
    lam0 = scale * (w * uT_ref[:])

    def body(k, lam):
        i = n_steps - 1 - k
        u_row = traj_ref[i, :].reshape(1, -1)
        if op_grads:  # static: operator cotangent requested
            v_row = lin * u_row + c2 * u_row * u_row \
                + c3 * u_row * u_row * u_row
            db_ref[:, :] += lam[0, :].reshape(-1, 1) * v_row
        wb = _mmT(b, lam)
        vprime = lin + 2.0 * c2 * u_row + 3.0 * c3 * u_row * u_row
        return vprime * wb + scale * (w * u_row)

    lam = jax.lax.fori_loop(0, n_steps, body, lam0)
    lam_ref[:] = lam


def _aux_outputs(store_traj, store_series, n_steps, mg):
    """(extra out_shape, extra out_specs) for the optional trajectory /
    energy-series outputs. Ordering: traj (grad contexts), then the
    lane-replicated per-step energy series (fused archiving)."""
    shapes, specs = [], []
    if store_traj:
        shapes.append(jax.ShapeDtypeStruct((n_steps, mg), jnp.float32))
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if store_series:
        shapes.append(jax.ShapeDtypeStruct((n_steps + 1, 128), jnp.float32))
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return shapes, specs


def _run_fwd(a, b, w, u0, c2, c3, n_steps, interpret, store_traj=True,
             store_series=False):
    mg = u0.shape[-1]
    u0_t = jnp.zeros((8, mg), jnp.float32).at[0, :].set(u0)
    w_t = jnp.zeros((8, mg), jnp.float32).at[0, :].set(w)
    sc = jnp.asarray([[c2, c3]], jnp.float32)
    tshape, tspecs = _aux_outputs(store_traj, store_series, n_steps, mg)
    out = pl.pallas_call(
        partial(_fwd_kernel, n_steps=n_steps, has_traj=store_traj,
                has_ser=store_series),
        out_shape=(
            jax.ShapeDtypeStruct((8, mg), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            *tshape,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *tspecs,
        ),
        interpret=interpret,
    )(a, b, w_t, u0_t, sc)
    uT, Jsum = out[0], out[1][0, 0]
    return (uT, Jsum, *out[2:])


def _run_fwd_shared(b, w, u0, c2, c3, lin, n_steps, interpret,
                    store_traj=True, store_series=False):
    mg = u0.shape[-1]
    u0_t = jnp.zeros((8, mg), jnp.float32).at[0, :].set(u0)
    w_t = jnp.zeros((8, mg), jnp.float32).at[0, :].set(w)
    sc = jnp.asarray([[c2, c3, lin]], jnp.float32)
    tshape, tspecs = _aux_outputs(store_traj, store_series, n_steps, mg)
    out = pl.pallas_call(
        partial(_fwd_kernel_shared, n_steps=n_steps, has_traj=store_traj,
                has_ser=store_series),
        out_shape=(
            jax.ShapeDtypeStruct((8, mg), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            *tshape,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *tspecs,
        ),
        interpret=interpret,
    )(b, w_t, u0_t, sc)
    uT, Jsum = out[0], out[1][0, 0]
    return (uT, Jsum, *out[2:])


def _run_bwd_shared(b, w, uT, traj, c2, c3, lin, scale, n_steps, interpret,
                    op_grads=True):
    mg = uT.shape[-1]
    w_t = jnp.zeros((8, mg), jnp.float32).at[0, :].set(w)
    sc = jnp.asarray([[c2, c3, lin, scale]], jnp.float32)
    lam, db = pl.pallas_call(
        partial(_bwd_kernel_shared, n_steps=n_steps, op_grads=op_grads),
        out_shape=(
            jax.ShapeDtypeStruct((8, mg), jnp.float32),
            jax.ShapeDtypeStruct((mg, mg), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(b, w_t, uT, traj, sc)
    return lam[0, :], db


def _run_bwd(a, b, w, uT, traj, c2, c3, scale, n_steps, interpret,
             op_grads=True):
    mg = uT.shape[-1]
    w_t = jnp.zeros((8, mg), jnp.float32).at[0, :].set(w)
    sc = jnp.asarray([[c2, c3, scale]], jnp.float32)
    lam, da, db = pl.pallas_call(
        partial(_bwd_kernel, n_steps=n_steps, op_grads=op_grads),
        out_shape=(
            jax.ShapeDtypeStruct((8, mg), jnp.float32),
            jax.ShapeDtypeStruct((mg, mg), jnp.float32),
            jax.ShapeDtypeStruct((mg, mg), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={},
        interpret=interpret,
    )(a, b, w_t, uT, traj, sc)
    return lam[0, :], da, db


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_objective(a, b, w, u0, c2: float, c3: float, dt: float,
                    n_steps: int, interpret: bool = False,
                    op_grads: bool = True):
    """-J with J = dt * sum_{n=0..n_steps} sum_j w_j u_n,j^2 under
    u' = A u + B (c2 u^2 + c3 u^3). Differentiable in u0, A, B (and w).

    op_grads=False SKIPS the dA/dB accumulation in the reverse kernel
    (returning zero cotangents for A/B) — an explicit opt-out for the
    common case where the operators are fixed problem data; leave it
    True whenever differentiating w.r.t. the operators."""
    # primal-only call: trajectory-free kernel (no HBM flush of a
    # trajectory nobody reads); grad contexts go through _vjp_fwd below
    return -dt * _run_fwd(a, b, w, u0, c2, c3, n_steps, interpret,
                          store_traj=False)[1]


def _vjp_fwd(a, b, w, u0, c2, c3, dt, n_steps, interpret, op_grads):
    uT, Jsum, traj = _run_fwd(a, b, w, u0, c2, c3, n_steps, interpret)
    return -dt * Jsum, (a, b, w, uT, traj)


def _vjp_bwd(c2, c3, dt, n_steps, interpret, op_grads, res, gbar):
    a, b, w, uT, traj = res
    # scale folds the cost-term derivative and the incoming cotangent:
    # lam is linear in it, so dA/dB (outer products of lam) carry gbar too
    lam, da, db = _run_bwd(a, b, w, uT, traj, c2, c3,
                           jnp.float32(-2.0 * dt) * gbar, n_steps, interpret,
                           op_grads=op_grads)
    # w cotangent: dJ/dw_j = -dt * sum_n u_n,j^2
    dw = gbar * (-dt) * (jnp.sum(traj * traj, axis=0) + uT[0, :] * uT[0, :])
    return (da, db, dw, lam)


fused_objective.defvjp(_vjp_fwd, _vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def fused_objective_shared(b, w, u0, c2: float, c3: float, lin: float,
                           dt: float, n_steps: int, interpret: bool = False,
                           op_grads: bool = True):
    """Shared-matrix form of `fused_objective`: -J with
    J = dt * sum_{n=0..n_steps} sum_j w_j u_n,j^2 under
    u' = B (lin u + c2 u^2 + c3 u^3). Differentiable in u0, B, w.

    Equivalent to `fused_objective(lin*B, B, ...)` but runs ONE MXU dot
    per forward step and ONE transposed dot per reverse step instead of
    two — SH23's step is exactly this shape (u' = M(u/dt + g), so
    B = M, lin = 1/dt; `FWD_Solve_SH23.py:308-325`'s SBDF1 LHS)."""
    return -dt * _run_fwd_shared(b, w, u0, c2, c3, lin, n_steps, interpret,
                                 store_traj=False)[1]


def _vjp_fwd_shared(b, w, u0, c2, c3, lin, dt, n_steps, interpret, op_grads):
    uT, Jsum, traj = _run_fwd_shared(b, w, u0, c2, c3, lin, n_steps,
                                     interpret, store_traj=True)
    return -dt * Jsum, (b, w, uT, traj)


def _vjp_bwd_shared(c2, c3, lin, dt, n_steps, interpret, op_grads, res, gbar):
    b, w, uT, traj = res
    lam, db = _run_bwd_shared(b, w, uT, traj, c2, c3, lin,
                              jnp.float32(-2.0 * dt) * gbar, n_steps,
                              interpret, op_grads=op_grads)
    dw = gbar * (-dt) * (jnp.sum(traj * traj, axis=0) + uT[0, :] * uT[0, :])
    return (db, dw, lam)


fused_objective_shared.defvjp(_vjp_fwd_shared, _vjp_bwd_shared)


# ---------------------------------------------------------------------------
# fused-diagnostics variants: (J, energy series, final state) from the
# SAME kernel pass — the archiver's payload without a second forward
# solve (the reference's scalar_data handler rides the cost's FWD solve,
# FWD_Solve_SH23.py:478-483). J arithmetic is OP-IDENTICAL to the plain
# kernels (the stored per-step energies are the very values the Kahan
# sum consumes), so archiving leaves optimisation trajectories bitwise
# unchanged. The aux outputs carry NO adjoint path: only J's cotangent
# propagates in the backward rule — problems wrap them in stop_gradient
# so autodiff can never silently route cotangents into them.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _fused_objective_diag_vjp(a, b, w, u0, c2: float, c3: float, dt: float,
                              n_steps: int, interpret: bool = False,
                              op_grads: bool = True):
    uT, Jsum, ser = _run_fwd(a, b, w, u0, c2, c3, n_steps, interpret,
                             store_traj=False, store_series=True)
    return -dt * Jsum, ser[:, 0], uT[0, :]


def fused_objective_diag(a, b, w, u0, c2: float, c3: float, dt: float,
                         n_steps: int, interpret: bool = False,
                         op_grads: bool = True):
    """`fused_objective` that also returns (energies, uT): the per-step
    weighted energies sum_j w_j u_n,j^2 for n = 0..n_steps and the final
    state row. Differentiable in u0 (and A/B/w) through J ONLY — the
    aux outputs are stop_gradient'd HERE (structurally), matching the
    custom bwd rule that consumes only J's cotangent; differentiating
    through energies/uT yields a true zero instead of a silently-wrong
    gradient."""
    J, ser, uT = _fused_objective_diag_vjp(a, b, w, u0, c2, c3, dt,
                                           n_steps, interpret, op_grads)
    return J, jax.lax.stop_gradient(ser), jax.lax.stop_gradient(uT)


def _vjp_fwd_diag(a, b, w, u0, c2, c3, dt, n_steps, interpret, op_grads):
    uT, Jsum, traj, ser = _run_fwd(a, b, w, u0, c2, c3, n_steps, interpret,
                                   store_traj=True, store_series=True)
    return (-dt * Jsum, ser[:, 0], uT[0, :]), (a, b, w, uT, traj)


def _vjp_bwd_diag(c2, c3, dt, n_steps, interpret, op_grads, res, gbars):
    gbar = gbars[0]   # aux cotangents are structurally zero (the
    #                   public wrapper stop_gradients energies/uT)
    a, b, w, uT, traj = res
    lam, da, db = _run_bwd(a, b, w, uT, traj, c2, c3,
                           jnp.float32(-2.0 * dt) * gbar, n_steps, interpret,
                           op_grads=op_grads)
    dw = gbar * (-dt) * (jnp.sum(traj * traj, axis=0) + uT[0, :] * uT[0, :])
    return (da, db, dw, lam)


_fused_objective_diag_vjp.defvjp(_vjp_fwd_diag, _vjp_bwd_diag)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_objective_shared_diag_vjp(b, w, u0, c2: float, c3: float,
                                     lin: float, dt: float, n_steps: int,
                                     interpret: bool = False,
                                     op_grads: bool = True):
    uT, Jsum, ser = _run_fwd_shared(b, w, u0, c2, c3, lin, n_steps,
                                    interpret, store_traj=False,
                                    store_series=True)
    return -dt * Jsum, ser[:, 0], uT[0, :]


def fused_objective_shared_diag(b, w, u0, c2: float, c3: float, lin: float,
                                dt: float, n_steps: int,
                                interpret: bool = False,
                                op_grads: bool = True):
    """`fused_objective_shared` that also returns (energies, uT); aux
    outputs stop_gradient'd structurally — see `fused_objective_diag`."""
    J, ser, uT = _fused_objective_shared_diag_vjp(
        b, w, u0, c2, c3, lin, dt, n_steps, interpret, op_grads)
    return J, jax.lax.stop_gradient(ser), jax.lax.stop_gradient(uT)


def _vjp_fwd_shared_diag(b, w, u0, c2, c3, lin, dt, n_steps, interpret,
                         op_grads):
    uT, Jsum, traj, ser = _run_fwd_shared(b, w, u0, c2, c3, lin, n_steps,
                                          interpret, store_traj=True,
                                          store_series=True)
    return (-dt * Jsum, ser[:, 0], uT[0, :]), (b, w, uT, traj)


def _vjp_bwd_shared_diag(c2, c3, lin, dt, n_steps, interpret, op_grads,
                         res, gbars):
    gbar = gbars[0]   # aux cotangents are structurally zero (the
    #                   public wrapper stop_gradients energies/uT)
    b, w, uT, traj = res
    lam, db = _run_bwd_shared(b, w, uT, traj, c2, c3, lin,
                              jnp.float32(-2.0 * dt) * gbar, n_steps,
                              interpret, op_grads=op_grads)
    dw = gbar * (-dt) * (jnp.sum(traj * traj, axis=0) + uT[0, :] * uT[0, :])
    return (db, dw, lam)


_fused_objective_shared_diag_vjp.defvjp(_vjp_fwd_shared_diag,
                                        _vjp_bwd_shared_diag)
