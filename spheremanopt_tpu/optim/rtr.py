"""Riemannian trust-region Newton (RTR) on a product of spheres.

A second-order optimiser the reference lacks entirely (its driver is
SD/CG + line search, `Sphere_Grad_Descent.py:692-838`): the classic
RTR of Absil, Baker & Gallivan ('Trust-region methods on Riemannian
manifolds', FoCM 2007) with a Steihaug-Toint truncated-CG subproblem
solver, built on exact Hessian-vector products that JAX gives for free
via forward-over-reverse autodiff: the gradient is `jax.linearize`d
ONCE per outer iteration, so every tCG HVP is a tangent sweep over the
shared residuals (~one gradient-cost each; no Hessian is ever
materialised).

Geometry. For a sphere component {x : <x,x>_M = r} embedded in a
linear space with a CONSTANT metric <.,.>_M (the problems' quadrature/
Parseval inner products), with P_x the tangent projection and
nabla f(x) the Riesz-representative ambient gradient the problems
already return, the Riemannian Hessian is

    Hess f(x)[v] = P_x( D nabla f(x)[v] ) - (<x, nabla f>_M / <x,x>_M) v

for tangent v — the projected directional derivative of the ambient
gradient plus the sphere's Weingarten (curvature) correction. The
second term is what makes RTR see the *constrained* curvature: it is
the reason the leading eigenvector of an indefinite matrix is a
genuine local minimum of the PCA problem on the sphere even though
the ambient Hessian -M is indefinite.

Why it pays: the tCG stopping rule ||r_j|| <= ||r_0|| min(||r_0||, k)
(theta = 1) gives local Q-quadratic convergence — near the optimum the
residual SQUARES each outer iteration, where SD/CG/L-BFGS contract
linearly. Each outer iteration costs 1 objective + 1 gradient +
(a few) HVP evaluations, all device-resident jitted kernels.

Scope: the HVP needs a FORWARD-linearizable gradient path. Every
pure-autodiff method (the default XLA solvers) qualifies; gradients of
custom_vjp objectives often do too (the jvp differentiates the bwd
rule itself), but paths whose primitives have no JVP rule at all
(Pallas kernels) raise a TypeError with guidance, and `run.py` guards
the known-bad CLI combinations loudly.

The gradient, the whole tCG loop, and the trial evaluation fuse into
ONE jitted executable (`lax.while_loop` with the linearized HVP traced
into the body; the trust radius is a traced scalar operand) — a single
device dispatch per outer iteration regardless of how many inner CG
steps run, where CG+Wolfe pays a dispatch plus a host round-trip per
line-search trial. In line with the repo's one-dispatch-per-decision
architecture (CLAUDE.md platform rule 4).
"""

from __future__ import annotations

import time
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spheremanopt_tpu.manifold import sphere as geom
from spheremanopt_tpu.optim.optimiser import OptimiseResult


def riemannian_hvp(xs, vs, grad_f, inner_prod):
    """Hessian-vector product Hess f(xs)[vs] on the product of spheres.

    `grad_f` must return the list of Riesz-representative ambient
    gradients under `inner_prod` (the problems' contract); `vs` must be
    tangent at `xs`. Traceable: safe to call inside jit/while_loop.
    """
    ips = geom._as_list(inner_prod, len(xs))
    nab, dnab = jax.jvp(grad_f, (list(xs),), (list(vs),))
    out = []
    for x, n, dn, v, ip in zip(xs, nab, dnab, vs, ips):
        pdn = dn - (ip(x, dn) / ip(x, x)) * x          # P_x(D nabla[v])
        out.append(pdn - (ip(x, n) / ip(x, x)) * v)    # Weingarten term
    return out


def build_full_step(radii, inner_prod, f: Callable, grad_f: Callable,
                    theta: float, kappa: float, max_cg: int,
                    err_tol: float) -> Callable:
    """Build the fused RTR step: gradient/residuals -> Steihaug-Toint
    tCG -> trial point + J, as one traceable function
    `full_step(xs, delta, check_only=False) -> (err, eta_norm, pred,
    hit, n_hvp, x_trial, J_trial)`. Shared by the host driver
    (`optimise_rtr`, which jits it per outer iteration) and the
    device-resident loop (`optim/jit_rtr.py`, which traces it into a
    while_loop body). `radii` entries may be traced scalars
    (dynamic-radius sweeps).

    `check_only` (static bool on the host path, traced scalar in the
    device loop) marks the FINAL pass at the max_iters cap: only the
    gradient/residuals are needed for the last convergence check, so
    the tCG subproblem is skipped (done at init) and the trial
    objective — a full PDE solve — is not evaluated (J_trial returns
    +inf, never consumed: the drivers' ladders break on converged/
    max_iters before touching it). Without this, a cap-terminated run
    would spend up to max_cg discarded HVP sweeps plus one discarded
    trial solve on its last dispatch."""
    n = len(radii)
    ips = geom._as_list(inner_prod, n)

    def _slope(a, b):
        return sum(ip(x, y) for x, y, ip in zip(a, b, ips))

    def _tangent(xs, vs):
        return [geom.tangent_project(x, v, ip)
                for x, v, ip in zip(xs, vs, ips)]

    def _full_step(xs, delta, check_only=False):
        nab, dgrad = jax.linearize(grad_f, list(xs))
        g = _tangent(xs, list(nab))
        err = jnp.stack([jnp.sqrt(ip(gi, gi))
                         for gi, ip in zip(g, ips)])
        coeff = [ip(x, nb) / ip(x, x)
                 for x, nb, ip in zip(xs, nab, ips)]

        def hvp(vs):
            pdn = _tangent(xs, list(dgrad(list(vs))))
            return [pd - c * v for pd, c, v in zip(pdn, coeff, vs)]

        # --- Steihaug-Toint tCG:
        # min_eta <g,eta> + 0.5 <eta, H eta>  s.t. ||eta|| <= delta
        rr0 = _slope(g, g)
        norm_r0 = jnp.sqrt(rr0)
        # superlinear stopping (theta=1 -> local Q-quadratic)
        stop = norm_r0 * jnp.minimum(norm_r0 ** theta, kappa)
        zeros = [jnp.zeros_like(gi) for gi in g]

        def cond(st):
            _eta, _r, _p, _rr, _m, j, done, _hit = st
            return jnp.logical_and(~done, j < max_cg)

        def body(st):
            eta, r, p, rr, mval, j, _done, hit = st
            hp = hvp(p)
            php = _slope(p, hp)
            pp = _slope(p, p)
            ep = _slope(eta, p)
            ee = _slope(eta, eta)
            pr = _slope(p, r)
            # step to the trust boundary along p (positive root)
            disc = jnp.maximum(ep * ep + pp * (delta * delta - ee), 0.0)
            tau = (-ep + jnp.sqrt(disc)) / pp
            alpha = rr / php
            ee_after = ee + 2.0 * alpha * ep + alpha * alpha * pp
            boundary = jnp.logical_or(php <= 0.0,
                                      ee_after >= delta * delta)
            step = jnp.where(boundary, tau, alpha)
            eta2 = [e + step * pi for e, pi in zip(eta, p)]
            # model change along p, computed directly (robust to CG
            # orthogonality drift): step*<p,r> + 0.5 step^2 <p,Hp>
            mval2 = mval + step * pr + 0.5 * step * step * php
            r2 = [ri + step * hi for ri, hi in zip(r, hp)]
            rr2 = _slope(r2, r2)
            small = jnp.sqrt(rr2) <= stop
            done2 = jnp.logical_or(boundary, small)
            beta = rr2 / rr
            p2 = [-r2i + beta * pi for r2i, pi in zip(r2, p)]
            return (eta2, r2, p2, rr2, mval2, j + 1, done2,
                    jnp.logical_or(hit, boundary))

        # skip the subproblem entirely when the outer loop is about
        # to declare convergence (same predicate the host checks) —
        # a near-zero gradient would otherwise send tCG on a long
        # pointless residual-squaring run — or when this is the
        # check-only final pass at the iteration cap
        already_done = jnp.logical_or(norm_r0 == 0.0,
                                      jnp.max(err) <= err_tol)
        if check_only is not False:   # static True, or a traced scalar
            already_done = jnp.logical_or(already_done, check_only)
        init = (zeros, list(g), [-gi for gi in g], rr0,
                jnp.zeros_like(rr0), jnp.asarray(0, jnp.int32),
                already_done, jnp.asarray(False))
        eta, _r, _p, _rr, mval, j, _done, hit = lax.while_loop(
            cond, body, init)
        eta_norm = jnp.sqrt(_slope(eta, eta))

        xn = [geom.retract(x, 1.0, e, r, ip)
              for x, e, r, ip in zip(xs, eta, radii, ips)]
        if isinstance(check_only, bool) and check_only:
            # host cap pass (static flag, separately compiled variant):
            # the trial objective is never consumed — skip the solve
            j_aval = jax.eval_shape(f, xn)
            J_trial = jnp.full(j_aval.shape, jnp.inf, j_aval.dtype)
        else:
            # normal pass — and the device loop's traced-flag cap pass:
            # wrapping f(xn) in lax.cond would change XLA fusion and
            # break the drivers' BITWISE trajectory parity (measured
            # 1-ULP drift), so the device cap pass pays this one
            # discarded forward solve; the tCG skip above (already_done)
            # is the expensive part and is arithmetic-neutral
            J_trial = f(xn)
        return err, eta_norm, -mval, hit, j, xn, J_trial

    return _full_step


class _RTRKernels:
    """Jitted device kernels: `full_step` fuses gradient + residuals +
    the whole Steihaug-Toint tCG subproblem + trial evaluation into ONE
    executable — a single device dispatch per outer iteration (CG+Wolfe
    pays one dispatch per line-search trial plus host round-trips).

    The primal gradient is computed ONCE per step via `jax.linearize`;
    every tCG Hessian-vector product is then just the linearized
    tangent sweep over the shared residuals (~1 gradient-cost each,
    half the cost of a fresh forward-over-reverse `jax.jvp`)."""

    def __init__(self, radii: Sequence[float], inner_prod,
                 f: Callable, grad_f: Callable,
                 theta: float, kappa: float, max_cg: int,
                 err_tol: float):
        radii = tuple(float(r) for r in radii)
        ips = geom._as_list(inner_prod, len(radii))

        def _normalise(xs):
            return [geom.normalise_sphere(x, r, ip)
                    for x, r, ip in zip(xs, radii, ips)]

        self.normalise = jax.jit(_normalise)
        # check_only static: the gradient-only cap-pass variant compiles
        # lazily, only for runs that actually reach max_iters
        self.full_step = jax.jit(
            build_full_step(radii, inner_prod, f, grad_f, theta, kappa,
                            max_cg, err_tol),
            static_argnames=("check_only",))


def optimise_rtr(
    x0: Sequence[Any],
    radii: Sequence[float],
    f: Callable[[List[Any]], Any],
    grad_f: Callable[[List[Any]], List[Any]],
    inner_prod,
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
    callback: Optional[Callable[[int, OptimiseResult], None]] = None,
    verbose: bool = True,
    checkpoint_path: Optional[str] = None,
    log_path: Optional[str] = None,
) -> OptimiseResult:
    """Minimise f(X) subject to <X_i, X_i> = radii[i] by trust-region
    Newton with truncated-CG subproblems and autodiff HVPs.

    Same callable-triple contract as `optimise_on_multi_sphere`
    (reference API `Sphere_Grad_Descent.py:692`): `f` returns a scalar,
    `grad_f` the Riesz-representative gradients, `inner_prod` one
    callable or a per-component list. `grad_f` must be forward-
    linearizable; paths whose primitives carry no JVP rule (e.g.
    Pallas kernels) raise a TypeError with guidance at trace time.

    Returns an OptimiseResult (function_values hold -J, residuals from
    the pre-update tangent gradient, step_sizes hold ||eta||_x).
    `hvp_evals` counts Hessian-vector products across all tCG solves.
    """
    n = len(radii)
    sphere_scale = float(np.sqrt(sum(float(r) for r in radii)))
    if delta_max is None:
        delta_max = 2.0 * sphere_scale     # beyond a diameter is meaningless
    if delta0 is None:
        delta0 = delta_max / 8.0
    K = _RTRKernels(radii, inner_prod, f, grad_f, theta, kappa,
                    int(max_cg), float(err_tol))

    R = OptimiseResult(n_components=n)
    log_file = open(log_path, "a") if log_path else None

    x_k = K.normalise(list(x0))
    R.x_opt = x_k
    J_k = float(f(x_k))
    R.function_evals += 1
    delta = float(delta0)
    delta_min = 1e-10 * float(delta0)
    rejects = 0
    converged = False

    def _step(xs, dlt, check_only=False):
        try:
            out = K.full_step(xs, dlt, check_only=check_only)
        except TypeError as e:
            # surfaces at first-trace time when grad_f hides a
            # custom_vjp (forward-mode jvp is undefined for those)
            raise TypeError(
                "RTR needs a forward-differentiable gradient (jax.jvp "
                "over grad_f). custom_vjp gradient paths (Pallas "
                "kernels, df64 Ozaki ops) define reverse rules only — "
                "run RTR on the problem's pure-autodiff method "
                "instead.") from e
        # one primal gradient (linearize), one trial objective, and
        # n_hvp linearized tangent sweeps per full_step call; the
        # check-only cap pass spends the gradient alone
        R.gradient_evals += 1
        if not check_only:
            R.function_evals += 1
        R.hvp_evals += int(out[4])
        return out

    t_iter = time.perf_counter()
    out = _step(x_k, delta, R.iterations >= max_iters)
    # objective dtype's eps, for the pred-below-roundoff stop (f32 on
    # TPU, f64 in the CPU test harness)
    j_eps = float(np.finfo(np.asarray(out[6]).dtype).eps)
    while True:
        err, eta_norm, pred, hit, _n_hvp, x_trial, J_trial = out
        err = np.asarray(err)
        if max(err) <= err_tol:
            converged = True
            break
        if R.iterations >= max_iters:
            break
        pred, J_trial, hit = float(pred), float(J_trial), bool(hit)

        if pred <= 0.0 or not np.isfinite(pred):
            # the model predicts no decrease only when g ~ 0 at machine
            # precision (tCG starts along -g) — nothing left to do
            R.message = ("tCG predicted no model decrease (gradient at "
                         "roundoff); terminating with best-so-far.")
            break
        if pred < 4.0 * j_eps * (1.0 + abs(J_k)):
            # the predicted decrease sits below the objective's own
            # rounding: rho is pure noise from here (actual J changes
            # cannot be resolved), so any further trials would spin the
            # radius down through rejections. The iterate is at the
            # J-representable floor — stop cleanly with best-so-far.
            R.message = ("Model decrease below objective roundoff "
                         f"(pred={pred:.2e} < ~eps(J)); iterate at the "
                         "floating-point floor of J. Terminating with "
                         "best-so-far.")
            break
        rho = ((J_k - J_trial) / pred
               if np.isfinite(J_trial) else -np.inf)
        if rho_max is not None and rho > rho_max:
            # model-breakdown guard: an actual decrease ORDERS beyond
            # the quadratic model's prediction means the objective has
            # a cliff inside the trust region — measured on the KDyn
            # 24^3 workload, where the discrete objective is unbounded
            # below through the CNAB1 CFL-instability region and plain
            # rho-acceptance happily steps into it (J -> -3.5e9; the
            # reference's Wolfe curvature condition implicitly
            # regularises against this). Treat like a failed trial:
            # reject and shrink.
            rho = -np.inf

        # standard radius update (Absil-Baker-Gallivan Alg. 1)
        if rho < 0.25:
            delta *= 0.25
        elif rho > 0.75 and hit:
            delta = min(2.0 * delta, float(delta_max))

        if rho > rho_accept:
            x_k, J_k = x_trial, J_trial
            R.x_opt = x_k
            R.iterations += 1
            # residual recorded from the PRE-update gradient, matching
            # the reference driver (`Sphere_Grad_Descent.py:796`)
            for i in range(n):
                R.residuals[i].append(float(err[i]))
            R.step_sizes.append(float(eta_norm))
            R.function_values.append(-1.0 * J_k)
            # wall time since the last ACCEPTED iterate — rejected
            # trials' dispatches accumulate into the accepting
            # iteration (same convention as optimise_on_multi_sphere,
            # whose per-iteration times include all line-search trials)
            R.wall_times.append(time.perf_counter() - t_iter)
            t_iter = time.perf_counter()
            if callback is not None:
                callback(R.iterations, R)
            if checkpoint_path is not None:
                from spheremanopt_tpu.io.checkpoint import save_progress
                save_progress(checkpoint_path, R)
            if verbose:
                print(R, flush=True)
            if log_file is not None:
                log_file.write(str(R) + "\n")
                log_file.flush()
        else:
            rejects += 1
            if delta < delta_min:
                R.message = ("Trust radius collapsed below delta_min "
                             "without an acceptable step; terminating "
                             "with best-so-far.")
                break
        out = _step(x_k, delta, R.iterations >= max_iters)

    if converged:
        R.converged = True
        R.message = R.message or "Converged: residual below err_tol."
    elif not R.message:
        R.message = "Stopped: max_iters reached."
    if rejects:
        R.message += f" ({rejects} rejected trust-region trials)"

    if log_file is not None:
        log_file.close()
    return R
