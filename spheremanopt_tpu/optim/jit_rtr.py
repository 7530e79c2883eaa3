"""Device-resident RTR: the whole trust-region optimisation in one jit.

The host RTR driver (`optim/rtr.py`) already fuses gradient + tCG +
trial into one dispatch per outer iteration; what remains on the host
is the rho-based accept/reject decision, the radius update, and the
loop itself — one device->host value pull per trial (~25 ms round-trip
through the axon tunnel; CLAUDE.md platform rule 4). This driver
compiles ALL of it: the outer trust-region loop runs as a
`lax.while_loop` whose body is the fused full step plus the
Absil-Baker-Gallivan radius/acceptance logic, with the same early-exit
semantics as `jit_driver._early_exit_loop` — a converged (or floored)
run stops paying for PDE solves immediately.

Decision semantics mirror the host driver's exactly, in order
(`optimise_rtr`, optim/rtr.py):
  1. residual <= err_tol          -> stop (converged)
  2. accepted iterations == max_iters -> stop
  3. pred <= 0 or non-finite      -> stop (gradient at roundoff)
  4. pred < 4*eps_J*(1+|J|)       -> stop (rho would be pure noise)
  5. rho = (J - J_trial)/pred; radius shrink/grow; accept if
     rho > rho_accept; a rejected trial that collapsed the radius
     below delta_min -> stop.
Histories are recorded per ACCEPTED iterate (the host counts rejected
trust-region trials only in the message), residuals from the
pre-update gradient (reference convention, Sphere_Grad_Descent.py:796).

Like the other device loops this one vmaps: a WHOLE FAMILY of
second-order optimisations (seed/radius sweeps) runs as one executable,
rows masked independently by the batched while_loop semantics.

Scope: same as host RTR — `grad_f` must be forward-linearizable
(pure-autodiff methods; not the Pallas/df64 custom_vjp-only paths).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.manifold import sphere as geom
from spheremanopt_tpu.optim.rtr import build_full_step


class JitRTRResult(NamedTuple):
    x_opt: List[jnp.ndarray]
    function_values: jnp.ndarray   # (max_iters,) -J_k (reference convention)
    residuals: jnp.ndarray         # (max_iters, n_spheres)
    step_sizes: jnp.ndarray        # (max_iters,) ||eta||_x of accepted steps
    iterations: jnp.ndarray        # scalar int: ACCEPTED iterations
    converged: jnp.ndarray         # scalar bool: residual <= err_tol
    trials: jnp.ndarray            # scalar int: full_step evaluations
    hvp_evals: jnp.ndarray         # scalar int: tCG tangent sweeps total


def jit_optimise_rtr(
    f: Callable,
    grad_f: Callable,
    inner_prod,
    radii: Sequence[float],
    *,
    err_tol: float = 1e-6,
    max_iters: int = 200,
    delta0: Optional[float] = None,
    delta_max: Optional[float] = None,
    rho_accept: float = 0.1,
    rho_max: Optional[float] = None,
    theta: float = 1.0,
    kappa: float = 0.1,
    max_cg: int = 50,
    max_trials: Optional[int] = None,
) -> Callable:
    """Build a jitted `optimise(x0_list, radii_dyn=None, aux=None) ->
    JitRTRResult`.

    `f(x_list) -> J` and `grad_f(x_list) -> [nab_J]` must be jittable
    (the problems' callable triple); with `aux` they are called as
    `f(aux, x_list)` / `grad_f(aux, x_list)` so oversized operator
    stacks ride as jit operands (cf. jit_driver's aux path).
    `max_trials` bounds total full-step evaluations (accepted +
    rejected); default 2*max_iters + 64 — the radius shrinks 4x per
    reject and collapses below delta_min after ~17 consecutive ones,
    so the bound is never the binding stop in practice.
    """
    n = len(radii)
    radii_static = tuple(float(r) for r in radii)
    ips = geom._as_list(inner_prod, n)
    sphere_scale = float(np.sqrt(sum(radii_static)))
    dmax_s = 2.0 * sphere_scale if delta_max is None else float(delta_max)
    d0_s = dmax_s / 8.0 if delta0 is None else float(delta0)
    hi = int(max_trials) if max_trials is not None else 2 * max_iters + 64

    @jax.jit
    def optimise(x0_list, radii_dyn=None, aux=None):
        rr = list(radii_static) if radii_dyn is None else list(radii_dyn)
        f_b = f if aux is None else (lambda xs_: f(aux, xs_))
        g_b = grad_f if aux is None else (lambda xs_: grad_f(aux, xs_))
        full_step = build_full_step(rr, ips, f_b, g_b, theta, kappa,
                                    int(max_cg), float(err_tol))

        xs = [geom.normalise_sphere(x, r, ip)
              for x, r, ip in zip(list(x0_list), rr, ips)]
        J0 = f_b(xs)
        dtype = J0.dtype
        j_eps = float(jnp.finfo(dtype).eps)
        delta0_t = jnp.asarray(d0_s, dtype)
        delta_min = 1e-10 * delta0_t

        J_hist = jnp.zeros(max_iters, dtype)
        r_hist = jnp.zeros((max_iters, n), dtype)
        s_hist = jnp.zeros(max_iters, dtype)

        def cond(state):
            t, carry = state
            # the check-only cap pass (k == max_iters) is exempt from
            # the max_trials bound: a user-supplied tight `hi` that runs
            # out exactly as k reaches the cap must not skip the final
            # convergence check the host driver always performs (its
            # body sets live=False, so it runs at most once)
            at_cap = carry[4] >= max_iters
            return jnp.logical_and(jnp.logical_or(t < hi, at_cap),
                                   carry[3])

        def body(state):
            t, (xs, J, delta, live, k, conv, nhvp, hists) = state
            J_hist, r_hist, s_hist = hists
            # Host parity at the iteration cap: the host's `while True`
            # computes one more gradient/residual AFTER the max_iters-th
            # accept and may declare convergence there before its
            # max_iters break (optim/rtr.py). `at_cap` marks that final
            # check-only pass: full_step skips the tCG subproblem and
            # the trial solve (check_only — gradient/residuals only,
            # n_hvp = 0, J_trial = +inf and never consumed), the
            # convergence test below still runs, every state mutation
            # is gated off, and the loop stops at the end of the pass.
            at_cap = k >= max_iters
            err, eta_norm, pred, hit, n_hvp, x_trial, J_trial = \
                full_step(xs, delta, at_cap)
            # `live` gates EVERY state mutation: under vmap the batched
            # while_loop keeps running frozen rows until all rows stop,
            # and an ungated body would let them keep stepping
            # (row-exactness vs the unbatched driver would break)
            nhvp = nhvp + jnp.where(live, n_hvp, 0)

            # host decision ladder, in order (see module docstring)
            converged = jnp.max(err) <= err_tol
            pred_bad = jnp.logical_or(pred <= 0.0,
                                      ~jnp.isfinite(pred))
            pred_noise = pred < 4.0 * j_eps * (1.0 + jnp.abs(J))
            stop_now = jnp.logical_or(converged,
                                      jnp.logical_or(pred_bad, pred_noise))

            rho = jnp.where(jnp.isfinite(J_trial),
                            (J - J_trial) / pred,
                            jnp.asarray(-jnp.inf, dtype))
            if rho_max is not None:
                # model-breakdown guard, host-parity (optim/rtr.py):
                # a cliff inside the trust region (KDyn's CFL
                # instability) is rejected like a failed trial
                rho = jnp.where(rho > rho_max,
                                jnp.asarray(-jnp.inf, dtype), rho)
            # Absil-Baker-Gallivan radius update (host order: before the
            # acceptance test), frozen on a terminating trial
            delta_new = jnp.where(
                rho < 0.25, delta * 0.25,
                jnp.where(jnp.logical_and(rho > 0.75, hit),
                          jnp.minimum(2.0 * delta, dmax_s), delta))
            delta = jnp.where(
                jnp.logical_and(live,
                                jnp.logical_and(~stop_now, ~at_cap)),
                delta_new, delta)

            accept = jnp.logical_and(
                jnp.logical_and(live, ~at_cap),
                jnp.logical_and(rho > rho_accept, ~stop_now))
            xs = [jnp.where(accept, xt, x) for xt, x in zip(x_trial, xs)]
            J = jnp.where(accept, J_trial, J)
            # record the accepted iterate at slot k (pre-update
            # residuals, -J per the reference convention)
            J_hist = J_hist.at[k].set(
                jnp.where(accept, -J_trial, J_hist[k]))
            r_hist = r_hist.at[k].set(
                jnp.where(accept, err, r_hist[k]))
            s_hist = s_hist.at[k].set(
                jnp.where(accept, eta_norm, s_hist[k]))
            k = k + accept.astype(k.dtype)

            conv = jnp.logical_or(conv, jnp.logical_and(live, converged))
            rejected = jnp.logical_and(live,
                                       jnp.logical_and(~accept, ~stop_now))
            collapsed = jnp.logical_and(rejected, delta < delta_min)
            active = jnp.logical_and(
                live,
                ~jnp.logical_or(stop_now,
                                jnp.logical_or(collapsed, at_cap)))
            return (t + jnp.where(live, 1, 0),
                    (xs, J, delta, active, k, conv, nhvp,
                     (J_hist, r_hist, s_hist)))

        init = (jnp.asarray(0, jnp.int32),
                (xs, J0, delta0_t, jnp.asarray(True),
                 jnp.asarray(0, jnp.int32), jnp.asarray(False),
                 jnp.asarray(0, jnp.int32),
                 (J_hist, r_hist, s_hist)))
        t, (xs, J, delta, active, k, conv, nhvp,
            (J_hist, r_hist, s_hist)) = jax.lax.while_loop(
            cond, body, init)
        return JitRTRResult(xs, J_hist, r_hist, s_hist, k, conv, t, nhvp)

    return optimise
