"""Device-resident strong-Wolfe line search: bracket + zoom as ONE
`lax.while_loop` state machine.

Mirrors the host implementation (`optim/linesearch.py::wolfe_search`,
itself the scipy/Nocedal-Wright Algorithms 3.5/3.6 the reference embeds,
`Sphere_Grad_Descent.py:344-613`) evaluation-for-evaluation: each loop
iteration performs exactly one fused (phi, derphi) evaluation at the
trial point chosen by the same bracketing/zoom interpolation rules
(cubic -> quadratic -> bisection with the same end-margin guards), so a
device-driver optimisation trajectory reproduces the host driver's in
f64. Differences, all documented: (a) the device search fuses derphi
into every phi evaluation (the host's fused-phi path does the same — the
accept/reject DECISIONS are identical because derphi is consulted at the
same alphas); (b) on bracket-maxiter exhaustion both searches evaluate
one further doubled trial and return it unchecked (host
`linesearch.py:264-272`) — the host disables the gradient-reuse handoff
there (derphi_star=None) while the device hands off the fused gradient,
which equals what the host's next iteration recomputes at the same
point; (c) a NaN phi/derphi trial fails the device search IMMEDIATELY
(ok=False, iterate frozen by the driver) — the host burns the remaining
bracket/zoom evaluations on the NaN before its driver's non-finite
guard (`optimiser.py`) terminates; same outcome, fewer wasted PDE
solves. An overflowed INF trial is handled like the host: it enters
zoom (inf fails the sufficient-decrease test) whose interpolant guards
fall back to bisection toward the finite a_lo, so recoverable
overflows keep optimising instead of terminating early. Loop
termination is guaranteed by the maxiter/max_zoom counters either way.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# phases
_BRACKET, _ZOOM, _DONE, _FAIL = 0, 1, 2, 3


def _quad_min(a, fa, dfa, b, fb):
    db = b - a
    curv = (fb - fa - dfa * db) / (db * db)
    xmin = a - dfa / (2.0 * curv)
    return xmin, jnp.isfinite(xmin)


def _cubic_min(a, fa, dfa, b, fb, c, fc):
    db, dc = b - a, c - a
    denom = (db * dc) ** 2 * (db - dc)
    r1 = fb - fa - dfa * db
    r2 = fc - fa - dfa * dc
    A = (dc * dc * r1 - db * db * r2) / denom
    B = (-(dc ** 3) * r1 + db ** 3 * r2) / denom
    rad = B * B - 3.0 * A * dfa
    xmin = a + (-B + jnp.sqrt(jnp.abs(rad))) / (3.0 * A)
    return xmin, (rad >= 0.0) & jnp.isfinite(xmin)


class _WolfeState(NamedTuple):
    phase: jnp.ndarray
    last: jnp.ndarray         # bracket maxiter exhausted: accept the next
    #                           (already-doubled) trial unchecked, like the
    #                           host's post-loop return (linesearch.py:272)
    i: jnp.ndarray            # bracket iteration counter
    j: jnp.ndarray            # zoom iteration counter
    alpha_prev: jnp.ndarray
    phi_prev: jnp.ndarray
    derphi_prev: jnp.ndarray
    alpha_cur: jnp.ndarray    # next bracket trial
    a_lo: jnp.ndarray
    phi_lo: jnp.ndarray
    derphi_lo: jnp.ndarray
    a_hi: jnp.ndarray
    phi_hi: jnp.ndarray
    a_rec: jnp.ndarray
    phi_rec: jnp.ndarray
    a_star: jnp.ndarray
    phi_star: jnp.ndarray
    aux: tuple                # pytree from eval_fn at the accepted point


def device_wolfe(
    eval_fn: Callable,
    phi0,
    derphi0,
    aux0,
    old_phi0,
    has_old_phi0,
    *,
    c1: float = 1e-4,
    c2: float = 0.4,
    amax: float = 1.0,
    maxiter: int = 10,
    max_zoom: int = 10,
):
    """Run the strong-Wolfe search on device.

    eval_fn(alpha) -> (phi, derphi, aux) must be jittable; aux (any
    pytree, e.g. the retracted iterate and its tangent gradient) from
    the ACCEPTED evaluation is returned, giving the caller the
    reference's gradient-reuse handoff (`Sphere_Grad_Descent.py:336-341`)
    for free. Returns (alpha_star, phi_star, aux_star, ok).
    """
    dtype = jnp.asarray(phi0).dtype
    f = lambda v: jnp.asarray(v, dtype)

    phi0 = f(phi0)
    derphi0 = f(derphi0)
    old_phi0 = f(old_phi0)

    # initial trial: interpolate from the previous objective decrease
    # (host lines 183-192)
    a1 = jnp.where(
        has_old_phi0 & (derphi0 != 0.0),
        jnp.minimum(
            1.0,
            1.01 * 2.0 * (phi0 - old_phi0)
            / jnp.where(derphi0 != 0.0, derphi0, 1.0),
        ),
        1.0,
    )
    a1 = jnp.where(a1 < 0.0, 1.0, a1)
    a1 = jnp.minimum(a1, amax)

    z = f(0.0)
    init = _WolfeState(
        phase=jnp.int32(_BRACKET), last=jnp.asarray(False),
        i=jnp.int32(0), j=jnp.int32(0),
        alpha_prev=z, phi_prev=f(phi0), derphi_prev=f(derphi0),
        alpha_cur=f(a1),
        a_lo=z, phi_lo=f(phi0), derphi_lo=f(derphi0),
        a_hi=z, phi_hi=f(phi0), a_rec=z, phi_rec=f(phi0),
        a_star=z, phi_star=f(phi0), aux=aux0,
    )

    def zoom_trial(st):
        """Host zoom lines 204-219: cubic (j>0) -> quadratic -> bisection
        with the same signed end-margin guards."""
        dalpha = st.a_hi - st.a_lo
        lo_end = jnp.where(dalpha < 0, st.a_hi, st.a_lo)
        hi_end = jnp.where(dalpha < 0, st.a_lo, st.a_hi)

        cj, c_ok = _cubic_min(st.a_lo, st.phi_lo, st.derphi_lo,
                              st.a_hi, st.phi_hi, st.a_rec, st.phi_rec)
        chk_c = 0.2 * dalpha
        c_ok = c_ok & (st.j > 0) & (cj <= hi_end - chk_c) & (cj >= lo_end + chk_c)

        qj, q_ok = _quad_min(st.a_lo, st.phi_lo, st.derphi_lo,
                             st.a_hi, st.phi_hi)
        chk_q = 0.1 * dalpha
        q_ok = q_ok & (qj <= hi_end - chk_q) & (qj >= lo_end + chk_q)

        bis = st.a_lo + 0.5 * dalpha
        return jnp.where(c_ok, cj, jnp.where(q_ok, qj, bis))

    def cond(st):
        return st.phase < _DONE

    def body(st):
        a_t = jnp.where(st.phase == _BRACKET, st.alpha_cur, zoom_trial(st))
        phi_t, derphi_t, aux_t = eval_fn(a_t)
        phi_t, derphi_t = f(phi_t), f(derphi_t)
        in_br = st.phase == _BRACKET
        finite = jnp.isfinite(phi_t) & jnp.isfinite(derphi_t)
        # Fail fast ONLY on NaN (a poisoned PDE state never recovers and
        # NaN comparisons are all-false, so letting it flow would burn
        # every remaining evaluation exactly like the host does before
        # its driver guard fires). An overflowed +inf trial is DIFFERENT:
        # the host recovers from it — to_zoom1 fires (inf > threshold)
        # and zoom bisects back toward the finite a_lo — so inf must take
        # the same transitions here or the device driver terminates runs
        # the host continues.
        nan_t = jnp.isnan(phi_t) | jnp.isnan(derphi_t)
        # maxiter-exhausted final trial: accept unchecked, like the host's
        # post-loop return of the freshly doubled evaluation (:264-272)
        in_last = in_br & st.last

        # ---- bracket transition (host lines 237-269) ----
        br_fail = ((st.alpha_cur == 0.0) | (st.alpha_prev == amax)
                   | nan_t)
        to_zoom1 = (phi_t > phi0 + c1 * a_t * derphi0) | (
            (phi_t >= st.phi_prev) & (st.i > 0))
        br_done = jnp.abs(derphi_t) <= -c2 * derphi0
        to_zoom2 = derphi_t >= 0.0
        br_maxed = st.i + 1 >= maxiter  # exhausted: one final doubled trial

        # continuation values
        alpha_next = jnp.minimum(2.0 * a_t, amax)

        # zoom entry (lo, hi) for the two cases
        z1 = (st.alpha_prev, st.phi_prev, st.derphi_prev, a_t, phi_t)
        z2 = (a_t, phi_t, derphi_t, st.alpha_prev, st.phi_prev)
        zsel = lambda i1, i2: jnp.where(to_zoom1, i1, i2)
        za_lo, zphi_lo, zderphi_lo, za_hi, zphi_hi = (
            zsel(z1[k], z2[k]) for k in range(5))

        # Acceptance requires a FINITE trial everywhere (not only on the
        # maxiter path): a -inf phi with a small finite derphi would
        # otherwise satisfy br_done/zm_done, the driver's commit guard
        # would block the step but leave `active` True, and the frozen
        # iterate would re-run the identical failing search every
        # remaining iteration. A would-be accept of a non-finite trial
        # is a terminal failure (ok=False -> the driver clears active),
        # matching the host driver's non-finite-objective early return.
        br_phase = jnp.where(
            in_last, jnp.where(finite, _DONE, _FAIL),
            jnp.where(
                br_fail, _FAIL,
                jnp.where(to_zoom1, _ZOOM,
                          jnp.where(br_done,
                                    jnp.where(finite, _DONE, _FAIL),
                                    jnp.where(to_zoom2, _ZOOM,
                                              _BRACKET)))))
        br_accept = jnp.where(
            in_last, finite,
            (~br_fail) & (~to_zoom1) & br_done & finite)
        last_next = in_br & (~in_last) & (~br_fail) & (~to_zoom1) & (
            ~br_done) & (~to_zoom2) & br_maxed

        # ---- zoom transition (host zoom lines 221-234) ----
        zm_hi_move = (phi_t > phi0 + c1 * a_t * derphi0) | (phi_t >= st.phi_lo)
        zm_done = (~zm_hi_move) & (jnp.abs(derphi_t) <= -c2 * derphi0)
        zm_flip = derphi_t * (st.a_hi - st.a_lo) >= 0.0
        zm_fail = (st.j + 1 > max_zoom) | nan_t

        n_a_lo = jnp.where(zm_hi_move, st.a_lo, a_t)
        n_phi_lo = jnp.where(zm_hi_move, st.phi_lo, phi_t)
        n_derphi_lo = jnp.where(zm_hi_move, st.derphi_lo, derphi_t)
        n_a_hi = jnp.where(zm_hi_move, a_t,
                           jnp.where(zm_flip, st.a_lo, st.a_hi))
        n_phi_hi = jnp.where(zm_hi_move, phi_t,
                             jnp.where(zm_flip, st.phi_lo, st.phi_hi))
        n_a_rec = jnp.where(zm_hi_move | zm_flip, st.a_hi, st.a_lo)
        n_phi_rec = jnp.where(zm_hi_move | zm_flip, st.phi_hi, st.phi_lo)

        zm_phase = jnp.where(zm_done, jnp.where(finite, _DONE, _FAIL),
                             jnp.where(zm_fail, _FAIL, _ZOOM))

        # ---- merge ----
        phase = jnp.where(in_br, br_phase, zm_phase).astype(jnp.int32)
        accepted = jnp.where(in_br, br_accept, zm_done & finite)

        new = _WolfeState(
            phase=phase,
            last=last_next,
            i=st.i + jnp.where(in_br, 1, 0).astype(jnp.int32),
            j=(jnp.where(in_br, 0, st.j + 1).astype(jnp.int32)),
            alpha_prev=jnp.where(in_br, a_t, st.alpha_prev),
            phi_prev=jnp.where(in_br, phi_t, st.phi_prev),
            derphi_prev=jnp.where(in_br, derphi_t, st.derphi_prev),
            alpha_cur=jnp.where(in_br, alpha_next, st.alpha_cur),
            a_lo=jnp.where(in_br, za_lo, n_a_lo),
            phi_lo=jnp.where(in_br, zphi_lo, n_phi_lo),
            derphi_lo=jnp.where(in_br, zderphi_lo, n_derphi_lo),
            a_hi=jnp.where(in_br, za_hi, n_a_hi),
            phi_hi=jnp.where(in_br, zphi_hi, n_phi_hi),
            a_rec=jnp.where(in_br, z, n_a_rec),
            phi_rec=jnp.where(in_br, phi0, n_phi_rec),
            a_star=jnp.where(accepted, a_t, st.a_star),
            phi_star=jnp.where(accepted, phi_t, st.phi_star),
            aux=jax.tree_util.tree_map(
                lambda t, s: jnp.where(accepted, t, s), aux_t, st.aux),
        )
        return new

    st = jax.lax.while_loop(cond, body, init)
    ok = st.phase == _DONE
    return st.a_star, st.phi_star, st.aux, ok


# ---------------------------------------------------------------------------
# Interpolated Armijo (host `armijo_search` / scipy scalar_search_armijo)
# ---------------------------------------------------------------------------

_A_FIRST, _A_QUAD, _A_CUBIC, _A_DONE, _A_FAIL = 0, 1, 2, 3, 4


class _ArmijoState(NamedTuple):
    phase: jnp.ndarray
    trial: jnp.ndarray     # next alpha to evaluate
    a0: jnp.ndarray        # previous-previous point
    phi_a0: jnp.ndarray
    a1: jnp.ndarray        # previous point
    phi_a1: jnp.ndarray
    a_star: jnp.ndarray
    phi_star: jnp.ndarray
    aux: tuple


def device_armijo(
    eval_fn: Callable,
    phi0,
    derphi0,
    aux0,
    *,
    alpha0: float = 1.0,
    c1: float = 1e-4,
    amin: float = 1e-6,
):
    """Backtracking with quadratic-then-cubic interpolation, mirroring
    the host `armijo_search` evaluation-for-evaluation — including the
    scipy step-halving guard quirk (the guard relabels the NEXT bracket
    point alpha2 -> alpha1/2 while keeping phi evaluated at the original
    alpha2; `optim/linesearch.py:124-128`). eval_fn as in device_wolfe;
    returns (alpha, phi, aux, ok)."""
    dtype = jnp.asarray(phi0).dtype
    f = lambda v: jnp.asarray(v, dtype)
    phi0, derphi0 = f(phi0), f(derphi0)
    z = f(0.0)

    init = _ArmijoState(
        phase=jnp.int32(_A_FIRST), trial=f(alpha0),
        a0=f(alpha0), phi_a0=phi0, a1=f(alpha0), phi_a1=phi0,
        a_star=z, phi_star=phi0, aux=aux0,
    )

    def _cubic_next(a0, phi_a0, a1, phi_a1):
        factor = a0 * a0 * a1 * a1 * (a1 - a0)
        r0 = phi_a0 - phi0 - derphi0 * a0
        r1 = phi_a1 - phi0 - derphi0 * a1
        a_coef = (a0 * a0 * r1 - a1 * a1 * r0) / factor
        b_coef = (-(a0 ** 3) * r1 + a1 ** 3 * r0) / factor
        return (-b_coef + jnp.sqrt(jnp.abs(b_coef * b_coef
                                           - 3.0 * a_coef * derphi0))) / (
            3.0 * a_coef)

    def cond(st):
        return st.phase < _A_DONE

    def body(st):
        a_t = st.trial
        phi_t, _derphi_t, aux_t = eval_fn(a_t)
        phi_t = f(phi_t)
        # require a finite objective for acceptance: phi = -inf would
        # otherwise "satisfy" the Armijo test and commit garbage (the
        # host driver catches this with its non-finite-J guard)
        accept = (phi_t <= phi0 + c1 * a_t * derphi0) & jnp.isfinite(phi_t)

        # FIRST reject -> quadratic trial from (alpha0, phi_t)
        quad = -derphi0 * a_t * a_t / (
            2.0 * (phi_t - phi0 - derphi0 * a_t))

        # QUAD reject -> cubic from (a0=alpha0, phi_a0) and (a_t, phi_t)
        cub_q = _cubic_next(st.a0, st.phi_a0, a_t, phi_t)

        # CUBIC reject -> shift with the scipy guard, then next cubic
        alpha2 = a_t
        guard = ((st.a1 - alpha2) > st.a1 / 2.0) | (
            (1.0 - alpha2 / st.a1) < 0.96)
        alpha2 = jnp.where(guard, st.a1 / 2.0, alpha2)
        cub_c = _cubic_next(st.a1, st.phi_a1, alpha2, phi_t)

        is_first = st.phase == _A_FIRST
        is_quad = st.phase == _A_QUAD

        n_a0 = jnp.where(is_first, a_t, jnp.where(is_quad, st.a0, st.a1))
        n_phi_a0 = jnp.where(is_first, phi_t,
                             jnp.where(is_quad, st.phi_a0, st.phi_a1))
        n_a1 = jnp.where(is_first, a_t, jnp.where(is_quad, a_t, alpha2))
        n_phi_a1 = phi_t
        n_trial = jnp.where(is_first, quad,
                            jnp.where(is_quad, cub_q, cub_c))

        # Failure tests are written NaN-closed (~(x > y), not x <= y) so a
        # non-finite phi or interpolant — e.g. an overflowed first trial,
        # whose quadratic interpolates to +-0.0 — terminates the
        # lax.while_loop instead of cycling on NaN comparisons forever
        # (the host exits its `while alpha1 > amin` loop the same way).
        underflow = (~is_first) & ~(n_a1 > amin)
        bad_trial = ~(n_trial > 0.0) | ~jnp.isfinite(n_trial)
        phase = jnp.where(
            accept, _A_DONE,
            jnp.where(underflow | bad_trial, _A_FAIL,
                      jnp.where(is_first, _A_QUAD, _A_CUBIC))).astype(jnp.int32)

        return _ArmijoState(
            phase=phase, trial=n_trial,
            a0=n_a0, phi_a0=n_phi_a0, a1=n_a1, phi_a1=n_phi_a1,
            a_star=jnp.where(accept, a_t, st.a_star),
            phi_star=jnp.where(accept, phi_t, st.phi_star),
            aux=jax.tree_util.tree_map(
                lambda t, s: jnp.where(accept, t, s), aux_t, st.aux),
        )

    st = jax.lax.while_loop(cond, body, init)
    ok = st.phase == _A_DONE
    return st.a_star, st.phi_star, st.aux, ok
