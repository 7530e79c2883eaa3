"""Device-resident optimisation driver: the whole SD/CG loop in one jit.

The host-driven driver (`optim/optimiser.py`) mirrors the reference's
control flow exactly — including scipy-style Wolfe with cubic
interpolation — at the cost of a few host<->device round trips per
iteration. This driver is the production-serving alternative the
reference cannot express: the COMPLETE optimisation (gradient solves,
tangent projection, hybrid FR-PR CG directions, Armijo backtracking
line search, retraction updates, convergence masking and history
recording) compiles to a single XLA executable. Per-iteration overhead
is zero; a full PCA optimisation or a many-iteration PDE optimisation
runs without the host in the loop.

Two line-search modes:
  * `line_search="wolfe"` (production parity): strong Wolfe via
    `optim/device_wolfe.py` — the same bracket/zoom/interpolation state
    machine as the host search, evaluation-for-evaluation, with the
    reference's iteration-0 Armijo, SD-until-third-pass direction rule,
    old-phi0 interpolated initial trials, and gradient-reuse handoff
    (`Sphere_Grad_Descent.py:198-479,740-776`). A PDE-problem trajectory
    matches the host driver's in f64 (tests/test_jit_driver.py).
  * `line_search="armijo"` (default; compiled-loop classic): fixed-shrink
    backtracking.

Deltas vs the host driver (documented, deliberate):
  * a failed line search freezes the iterate (masked no-op) rather than
    early-returning;
  * armijo mode: fixed shrink instead of quadratic/cubic interpolation,
    CG from the second pass, step-size carry-over from the last accepted
    step;
  * wolfe mode, iteration 0: the interpolated Armijo mirrors the host
    evaluation-for-evaluation, but every trial is a fused (phi, derphi)
    evaluation — rejected backtracking trials pay an unused adjoint
    sweep the host's phi-only Armijo avoids (first-trial accepts
    dominate in practice; cf. the use_fused_phi trade-off note in
    optimiser.py).
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from spheremanopt_tpu.manifold import sphere as geom
from spheremanopt_tpu.optim.device_wolfe import device_armijo, device_wolfe
from spheremanopt_tpu.optim.optimiser import _curv_eps


def _early_exit_loop(lo: int, hi: int, body, init, *, active_idx: int):
    """`fori_loop(lo, hi, body, init)` that STOPS once the carry's
    `active` flag (position `active_idx`) goes False — each masked
    post-convergence iteration of the optimiser body still costs full
    forward+adjoint PDE solves, so a max_iters=200 run that converges
    at 7 would otherwise pay 200 (measured: SHB23 pallas device loop,
    max_iters=50, converged at 11: 3.45 s as fori vs the work of 11).
    Under `jax.vmap` the predicate is batch-reduced by while_loop
    semantics (runs until EVERY row converges, inactive rows masked by
    the body exactly as before), preserving row-exactness of batched
    sweeps. History tails differ from the fori form only in padding:
    frozen -J/residual fill becomes zeros past the last live iteration
    (`iterations` counts are unchanged)."""

    def cond(state):
        i, carry = state
        return jnp.logical_and(i < hi, jnp.any(carry[active_idx]))

    def wbody(state):
        i, carry = state
        return (i + 1, body(i, carry))

    _, carry = jax.lax.while_loop(cond, wbody, (jnp.asarray(lo), init))
    return carry


class JitOptResult(NamedTuple):
    x_opt: List[jnp.ndarray]
    function_values: jnp.ndarray   # (max_iters,) -J_k (reference convention)
    residuals: jnp.ndarray         # (max_iters, n_spheres)
    step_sizes: jnp.ndarray        # (max_iters,)
    iterations: jnp.ndarray        # scalar int: iterations actually taken


def jit_optimise_on_multi_sphere(
    f_and_g: Callable,
    inner_prod,
    radii: Sequence[float],
    *,
    max_iters: int = 100,
    alpha0: float = 1.0,
    c1: float = 1e-4,
    shrink: float = 0.5,
    grow: float = 2.0,
    max_backtracks: int = 30,
    err_tol: float = 1e-6,
    cg: bool = True,
    line_search: str = "armijo",
    c2: float = 0.4,
    direction: str = None,
    lbfgs_memory: int = 8,
) -> Callable:
    """Build a jitted `optimise(x0_list) -> JitOptResult`.

    `f_and_g(x_list) -> (J, [nab_J])` must be jittable (problems provide
    `objective_and_gradient`); `inner_prod` is one callable or a list.

    `direction` selects sd|cg|lbfgs (None = legacy `cg` flag). The
    lbfgs mode compiles the Riemannian L-BFGS of the host driver into
    the loop: fixed-size ring buffers of transported curvature pairs
    with validity masking (static history length `lbfgs_memory`, so the
    two-loop recursion unrolls into the executable); requires
    line_search="wolfe".
    """
    if direction is None:
        direction = "cg" if cg else "sd"
    if direction not in ("sd", "cg", "lbfgs"):
        raise ValueError(f"direction must be sd|cg|lbfgs, got {direction!r}")
    use_lbfgs = direction == "lbfgs"
    if use_lbfgs and line_search != "wolfe":
        raise ValueError("direction='lbfgs' requires line_search='wolfe'")
    cg = direction == "cg"
    mlb = int(lbfgs_memory)
    n = len(radii)
    radii = tuple(float(r) for r in radii)
    ips = geom._as_list(inner_prod, n)

    def tangent(xs, nabs):
        return [geom.tangent_project(x, v, ip) for x, v, ip in zip(xs, nabs, ips)]

    def slope(gs, ds):
        return sum(ip(g, d) for g, d, ip in zip(gs, ds, ips))

    def residuals(gs):
        return jnp.stack([jnp.sqrt(ip(g, g)) for g, ip in zip(gs, ips)])

    def cg_direction(xs, gs, gs_old, ds_old):
        beta_fr = 0.0
        beta_pr = 0.0
        tds = []
        for x, g, g_old, d_old, ip in zip(xs, gs, gs_old, ds_old, ips):
            gg = ip(g, g)
            gg_old = ip(g_old, g_old)
            beta_fr = beta_fr + gg / gg_old
            tg = geom.transport(x, g_old, ip)
            beta_pr = beta_pr + (gg - ip(g, tg)) / gg_old
            tds.append(geom.transport(x, d_old, ip))
        beta = jnp.maximum(0.0, jnp.minimum(beta_fr, beta_pr))
        return [-g + beta * td for g, td in zip(gs, tds)]

    # ---- L-BFGS building blocks (direction="lbfgs"): the host driver's
    # transported-pair two-loop (`optimiser.ManifoldKernels.lbfgs_*`)
    # restructured for a fixed-shape fori_loop carry — ring buffers of
    # `mlb` slots per component, newest pair last, with a validity mask
    # instead of a growing tuple. Invalid slots are exact no-ops
    # (rho = a = 0), so the unrolled recursion matches the host's
    # variable-length kernel to roundoff.

    def lbfgs_two_loop(xs, gs, S, Y, valid, gamma):
        """d = -H.g via Nocedal & Wright Alg. 7.4; returns (d, <g,d>)."""
        one = jnp.asarray(1.0, gamma.dtype)
        q = list(gs)
        coeffs = []
        for j in range(mlb - 1, -1, -1):           # newest -> oldest
            s_j = [Sc[j] for Sc in S]
            y_j = [Yc[j] for Yc in Y]
            sy_j = slope(y_j, s_j)
            rho = jnp.where(valid[j],
                            one / jnp.where(valid[j], sy_j, one), 0.0)
            a = rho * slope(s_j, q)
            q = [qi - a * yi for qi, yi in zip(q, y_j)]
            coeffs.append((j, rho, a))
        r = [gamma * qi for qi in q]
        for (j, rho, a) in reversed(coeffs):       # oldest -> newest
            s_j = [Sc[j] for Sc in S]
            y_j = [Yc[j] for Yc in Y]
            b = rho * slope(y_j, r)
            r = [ri + (a - b) * si for ri, si in zip(r, s_j)]
        d = tangent(xs, [-ri for ri in r])
        return d, slope(gs, d)

    def lbfgs_update(xs, gs, gs_old, ds_old, alpha_prev, stepped_prev,
                     S, Y, valid, gamma):
        """Pair formation + history transport at the current iterate,
        masked by whether the previous iteration actually stepped
        (host: `lbfgs_shift` is only called with a pending step)."""
        s_new = tangent(xs, [alpha_prev * d for d in ds_old])
        tg = tangent(xs, gs_old)
        y_new = [gn - t for gn, t in zip(gs, tg)]
        sy = slope(s_new, y_new)
        yy = slope(y_new, y_new)
        ss = slope(s_new, s_new)
        keep = jnp.logical_and(
            stepped_prev,
            jnp.logical_and(
                sy > _curv_eps(sy.dtype)
                * jnp.sqrt(jnp.maximum(ss, 0.0) * jnp.maximum(yy, 0.0)),
                yy > 0.0))
        S2, Y2 = [], []
        for x, Sc, Yc, s_c, y_c, ip in zip(xs, S, Y, s_new, y_new, ips):
            tr = jax.vmap(lambda v, _x=x, _ip=ip: geom.tangent_project(
                _x, v, _ip))
            St = jnp.where(stepped_prev, tr(Sc), Sc)
            Yt = jnp.where(stepped_prev, tr(Yc), Yc)
            S2.append(jnp.where(keep,
                                jnp.concatenate([St[1:], s_c[None]], 0), St))
            Y2.append(jnp.where(keep,
                                jnp.concatenate([Yt[1:], y_c[None]], 0), Yt))
        valid2 = jnp.where(keep,
                           jnp.concatenate([valid[1:],
                                            jnp.ones((1,), bool)]), valid)
        gamma2 = jnp.where(keep, sy / jnp.where(yy > 0.0, yy, 1.0), gamma)
        return S2, Y2, valid2, gamma2

    @jax.jit
    def optimise(x0_list, radii_dyn=None, aux=None):
        """radii_dyn: optional traced per-sphere radii overriding the
        static ones — lets one compiled executable serve a sweep of
        constraint levels (e.g. critical-seed bisection). aux: optional
        operand pytree passed through to `f_and_g(aux, xs)` as a real
        jit ARGUMENT — required when the problem's operator stacks are
        too large to embed as program constants (the axon compile tunnel
        rejects oversized program bodies with HTTP 413; measured on the
        mixing device-loop)."""
        rr = list(radii) if radii_dyn is None else list(radii_dyn)
        fg = f_and_g if aux is None else (lambda xs_: f_and_g(aux, xs_))

        def retract(xs, alpha, ds):
            return [geom.retract(x, alpha, d, r, ip)
                    for x, d, r, ip in zip(xs, ds, rr, ips)]

        def armijo(xs, ds, J0, slope0, alpha_start):
            """lax.while_loop backtracking; returns (alpha, J_new, ok)."""

            def cond(state):
                alpha, J_new, k = state
                insufficient = J_new > J0 + c1 * alpha * slope0
                return jnp.logical_and(insufficient, k < max_backtracks)

            def body(state):
                alpha, _, k = state
                alpha = alpha * shrink
                J_new, _ = fg(retract(xs, alpha, ds))
                return (alpha, J_new, k + 1)

            J_first, _ = fg(retract(xs, alpha_start, ds))
            alpha, J_new, k = jax.lax.while_loop(
                cond, body, (jnp.asarray(alpha_start, J0.dtype), J_first, 0)
            )
            ok = J_new <= J0 + c1 * alpha * slope0
            return alpha, J_new, ok

        xs = [geom.normalise_sphere(x, r, ip)
              for x, r, ip in zip(list(x0_list), rr, ips)]
        J0, nab0 = fg(xs)
        g0 = tangent(xs, nab0)
        dtype = J0.dtype

        J_hist = jnp.zeros(max_iters, dtype)
        r_hist = jnp.zeros((max_iters, n), dtype)
        a_hist = jnp.zeros(max_iters, dtype)

        def body(i, carry):
            xs, J, gs, gs_old, ds_old, alpha_prev, active, hists = carry
            J_hist, r_hist, a_hist = hists

            ds_sd = [-g for g in gs]
            if cg:
                ds_cg = cg_direction(xs, gs, gs_old, ds_old)
                # fall back to steepest descent on iteration 0 and when
                # the CG direction is not a descent direction (hybrid
                # FR-PR does not guarantee descent with inexact searches)
                use_cg = jnp.logical_and(i > 0, slope(gs, ds_cg) < 0)
                ds = [jnp.where(use_cg, dc, dsd) for dc, dsd in zip(ds_cg, ds_sd)]
            else:
                ds = ds_sd

            slope0 = slope(gs, ds)
            alpha, J_new, ok = armijo(xs, ds, J, slope0,
                                      jnp.minimum(alpha_prev * grow, alpha0 * 1e3))

            # never commit a non-finite objective (host driver's guard,
            # optimiser.py; one runaway trial must not poison the carry)
            step = jnp.logical_and(active,
                                   jnp.logical_and(ok, jnp.isfinite(J_new)))
            xs_new = retract(xs, alpha, ds)
            xs = [jnp.where(step, xn, x) for xn, x in zip(xs_new, xs)]
            J = jnp.where(step, J_new, J)

            res = residuals(gs)
            J_hist = J_hist.at[i].set(-J)
            r_hist = r_hist.at[i].set(res)
            a_hist = a_hist.at[i].set(jnp.where(step, alpha, 0.0))

            # next gradient (only meaningful while active; masked cheaply
            # by reusing the old state when frozen)
            _, nab = fg(xs)
            gs_new = tangent(xs, nab)
            gs_old_n = gs
            ds_old_n = ds
            gs = [jnp.where(step, gn, g) for gn, g in zip(gs_new, gs)]

            active = jnp.logical_and(active,
                                     jnp.logical_and(ok, res.max() > err_tol))
            alpha_prev = jnp.where(step, alpha, alpha_prev)
            return (xs, J, gs, gs_old_n, ds_old_n, alpha_prev, active,
                    (J_hist, r_hist, a_hist))

        init = (xs, J0, g0, g0, [-g for g in g0],
                jnp.asarray(alpha0 / 2.0, dtype), jnp.asarray(True),
                (J_hist, r_hist, a_hist))
        carry = _early_exit_loop(0, max_iters, body, init, active_idx=6)
        xs, J, gs, _, _, _, active, (J_hist, r_hist, a_hist) = carry
        n_done = jnp.sum(a_hist > 0)
        return JitOptResult(xs, J_hist, r_hist, a_hist, n_done)

    @jax.jit
    def optimise_wolfe(x0_list, radii_dyn=None, aux=None):
        """Strong-Wolfe mode with host-driver semantics (see module
        docstring): iteration 0 is Armijo at alpha0, subsequent
        iterations run the device Wolfe state machine with gradient
        handoff; CG directions start at the third pass. aux: see
        `optimise`."""
        rr = list(radii) if radii_dyn is None else list(radii_dyn)
        fg = f_and_g if aux is None else (lambda xs_: f_and_g(aux, xs_))

        def retract(xs, alpha, ds):
            return [geom.retract(x, alpha, d, r, ip)
                    for x, d, r, ip in zip(xs, ds, rr, ips)]

        xs = [geom.normalise_sphere(x, r, ip)
              for x, r, ip in zip(list(x0_list), rr, ips)]
        J0, nab0 = fg(xs)
        g0 = tangent(xs, nab0)
        dtype = J0.dtype

        J_hist = jnp.zeros(max_iters, dtype)
        r_hist = jnp.zeros((max_iters, n), dtype)
        a_hist = jnp.zeros(max_iters, dtype)

        # ---- iteration 0: INTERPOLATED Armijo at alpha0, mirroring the
        # host exactly (`if R.iterations == 0 ... armijo_search(...,
        # alpha0=alpha_k)` with quadratic/cubic backtracking).
        ds0 = [-g for g in g0]
        slope00 = slope(g0, ds0)

        def eval0(a):
            xs_t = retract(xs, a, ds0)
            J_t, nab_t = fg(xs_t)
            gs_t = tangent(xs_t, nab_t)
            return J_t, jnp.zeros((), dtype), (xs_t, gs_t)

        alpha_a, J_a, (xs1, gs1), ok0 = device_armijo(
            eval0, J0, slope00, (xs, g0), alpha0=alpha0, c1=c1)

        xs = [jnp.where(ok0, xn, x) for xn, x in zip(xs1, xs)]
        J = jnp.where(ok0, J_a, J0)
        res0 = residuals(g0)
        J_hist = J_hist.at[0].set(-J)
        r_hist = r_hist.at[0].set(res0)
        a_hist = a_hist.at[0].set(jnp.where(ok0, alpha_a, 0.0))

        # gradient at x_1: the host's pass 2 computes grad_f(x_1) fresh
        # (no Armijo handoff); the fused eval at the accepted trial
        # already produced the identical value.
        gs = [jnp.where(ok0, gn, g) for gn, g in zip(gs1, g0)]

        active = jnp.logical_and(ok0, res0.max() > err_tol)
        J_old = J0                       # host J_k_old: None until the
        has_old = jnp.asarray(False)     # first successful Wolfe search

        def body(i, carry):
            xs, J, J_old, has_old, gs, gs_old, ds_old, active, lb, hists = carry
            J_hist, r_hist, a_hist = hists

            ds_sd = [-g for g in gs]
            if use_lbfgs:
                S, Y, valid, gamma, alpha_prev, stepped_prev = lb
                S, Y, valid, gamma = lbfgs_update(
                    xs, gs, gs_old, ds_old, alpha_prev, stepped_prev,
                    S, Y, valid, gamma)
                d_lb, slope_lb = lbfgs_two_loop(xs, gs, S, Y, valid, gamma)
                # host semantics: two-loop only with a non-empty history
                # AND a descent result; otherwise steepest descent and
                # (when non-descent with pairs) a history reset
                has_pairs = valid.any()
                ok_dir = jnp.logical_and(has_pairs, slope_lb < 0)
                reset = jnp.logical_and(has_pairs,
                                        jnp.logical_not(slope_lb < 0))
                valid = jnp.where(reset, jnp.zeros_like(valid), valid)
                gamma = jnp.where(reset, jnp.ones_like(gamma), gamma)
                ds = [jnp.where(ok_dir, dl, dsd)
                      for dl, dsd in zip(d_lb, ds_sd)]
                slope0 = jnp.where(ok_dir, slope_lb, slope(gs, ds_sd))
            elif cg:
                ds_cg = cg_direction(xs, gs, gs_old, ds_old)
                # host/reference: CG only from the third pass (i > 1,
                # `Sphere_Grad_Descent.py:750`), and only if descent
                use_cg = jnp.logical_and(i > 1, slope(gs, ds_cg) < 0)
                ds = [jnp.where(use_cg, dc, dsd)
                      for dc, dsd in zip(ds_cg, ds_sd)]
                slope0 = slope(gs, ds)
            else:
                ds = ds_sd
                slope0 = slope(gs, ds)

            def eval_fn(a):
                xs_t = retract(xs, a, ds)
                J_t, nab_t = fg(xs_t)
                gs_t, slope_t = [], jnp.zeros((), dtype)
                for x_t, nb, d, ip in zip(xs_t, nab_t, ds, ips):
                    g_t = geom.tangent_project(x_t, nb, ip)
                    gs_t.append(g_t)
                    slope_t = slope_t + ip(g_t, geom.transport(x_t, d, ip))
                return J_t, slope_t, (xs_t, gs_t)

            a_star, J_new, (xs_new, gs_new), ok = device_wolfe(
                eval_fn, J, slope0, (xs, gs), J_old, has_old,
                c1=c1, c2=c2,
                amax=alpha0 * (16.0 if use_lbfgs else 1.0),
            )

            # never commit a non-finite objective (host driver's guard)
            step = jnp.logical_and(active,
                                   jnp.logical_and(ok, jnp.isfinite(J_new)))
            xs = [jnp.where(step, xn, x) for xn, x in zip(xs_new, xs)]
            res = residuals(gs)
            J_hist = J_hist.at[i].set(-jnp.where(step, J_new, J))
            r_hist = r_hist.at[i].set(res)
            a_hist = a_hist.at[i].set(jnp.where(step, a_star, 0.0))

            gs_old_n = gs
            ds_old_n = ds
            gs = [jnp.where(step, gn, g) for gn, g in zip(gs_new, gs)]
            J_old = jnp.where(step, J, J_old)
            has_old = jnp.logical_or(has_old, step)
            J = jnp.where(step, J_new, J)

            if use_lbfgs:
                lb = (S, Y, valid, gamma,
                      jnp.where(step, a_star, lb[4]), step)

            active = jnp.logical_and(active,
                                     jnp.logical_and(ok, res.max() > err_tol))
            return (xs, J, J_old, has_old, gs, gs_old_n, ds_old_n, active,
                    lb, (J_hist, r_hist, a_hist))

        if use_lbfgs:
            lb0 = ([jnp.zeros((mlb,) + jnp.shape(g), g.dtype) for g in g0],
                   [jnp.zeros((mlb,) + jnp.shape(g), g.dtype) for g in g0],
                   jnp.zeros((mlb,), bool),
                   jnp.asarray(1.0, dtype),
                   jnp.asarray(alpha_a, dtype),
                   ok0)
        else:
            lb0 = ()
        init = (xs, J, J_old, has_old, gs, g0, ds0, active, lb0,
                (J_hist, r_hist, a_hist))
        carry = _early_exit_loop(1, max_iters, body, init, active_idx=7)
        xs, J, _, _, gs, _, _, active, _, (J_hist, r_hist, a_hist) = carry
        n_done = jnp.sum(a_hist > 0)
        return JitOptResult(xs, J_hist, r_hist, a_hist, n_done)

    if line_search == "wolfe":
        return optimise_wolfe
    return optimise
