"""Swift-Hohenberg on a bounded domain (Chebyshev, mixed BCs).

Reference: `Example_Problems/Bounded_Domain(Cheby)/Swift_Hohenberg_Bounded/
FWD_Solve_SHB23.py`. The optimisation is

    max_{u0} J = int_t (1/V) int_z |u|^2 dz dt
    s.t.  (1/V) int_z u0^2 dz = M0,
          du/dt + (1 + dz^2)^2 u - a u = 2 u^2 - u^3,    a = -0.1,
          dz(u) = dz^3(u) = 0 at z = -20;  u = dz^2(u) = 0 at z = +20,

SBDF1 stepping on the Chebyshev roots grid. Default config follows the
reference's Discrete mode (`__main__` :967-979): Npts = 512 grid points
(256 doubled in lieu of a dealias scale), dt = 0.01, T = 20, M0 = 0.0019,
top-half coefficient zeroing of the nonlinear term (`:583-585`), and the
trapezoid-weight inner product (`weightMatrixDisc` + `Inner_Prod_Discrete`,
`:69-81,156-193`).

TPU-first realisation:
  * the reference's Dedalus LBVP machinery — first-order reduction to
    (u, uz, uzz, uzzz), per-pencil left/right preconditioners, sparse LU
    (`:563-587,652-659`) — is replaced by a scalar Chebyshev-tau solve
    of the 4th-order operator, LU-factorised ONCE in f64 numpy at init
    and folded with both transforms into two dense grid-space
    propagators:  u' = A_lin u + A_nl g(u),  g(u) = 2u^2 - u^3.
    Each SBDF1 step is then two NxN MXU matmuls + elementwise work —
    no per-step factorisation, no sparse kernels
  * the reference's hand-rolled adjoint — transposed pencil solvers from
    conj(L_exp).T, the DCT adjoint quartet, adjoint dealiasing
    (`:796-920`) — is `jax.grad` of this discrete forward
  * all matrices are numpy constants compiled into the executable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.ops.chebyshev import ChebyshevBasis1D
from spheremanopt_tpu.problems.base import check_choice, check_x64
from spheremanopt_tpu.solvers.scan_utils import (kahan_add, kahan_zero,
                                                  strided_energy_scan,
                                                  strided_steps)


@dataclass(frozen=True)
class SHB23Config:
    npts: int = 512              # Discrete mode: 256 * dealias (ref :974-976)
    z0: float = -20.0
    z1: float = 20.0
    a: float = -0.1
    dt: float = 0.01
    n_iters: int = 2000          # T = 20 (ref :978)
    m0: float = 0.0019
    dtype: str = "float64"
    remat: bool = True
    dealias_frac: float = 0.5    # zero coefficients with n >= frac * N
    adjoint: str = "discrete"    # "discrete" (autodiff) | "continuous"
                                 # (adjoint PDE, ref ADJ_Solve_IVP_Cnts)
    device_ops: bool = True      # False: operator assembly only (the
                                 # numpy CPU baselines read the exact
                                 # f64 matrices; solve paths raise)
    method: str = "matmul"       # "matmul" (XLA scan) | "pallas" (both
                                 # propagator matrices pinned in VMEM for
                                 # the whole forward AND reverse sweep)
    diag_stride: int = 1         # energy-series cadence of the FUSED
                                 # diagnostics objectives (any >= 1);
                                 # see SH23Config.diag_stride.
                                 # `diagnostics()` re-runs stay per-step.


class SwiftHohenbergBounded:
    """SHB23 problem: callable triple + IC generation for the optimiser."""

    def __init__(self, cfg: SHB23Config = SHB23Config()):
        if cfg.device_ops:
            # assembly-only construction (device_ops=False) creates no
            # jax arrays — _A_lin/_A_nl/_w stay numpy — so the x64
            # truncation hazard cannot occur; solves raise loudly below
            check_x64(cfg.dtype)
        check_choice("method", cfg.method, ("matmul", "pallas"))
        check_choice("adjoint", cfg.adjoint, ("discrete", "continuous"))
        self.cfg = cfg
        if cfg.diag_stride < 1:
            raise ValueError(f"diag_stride={cfg.diag_stride} must be >= 1")
        self.basis = ChebyshevBasis1D(cfg.npts, cfg.z0, cfg.z1)
        self.radii = [cfg.m0]
        rdtype = jnp.dtype(cfg.dtype)
        self._rdtype = rdtype
        n = cfg.npts
        b = self.basis

        # --- tau system (f64 numpy, init-time only) ---
        d2 = b.deriv_matrix(2)
        d4 = b.deriv_matrix(4)
        L = (1.0 / cfg.dt + 1.0 - cfg.a) * np.eye(n) + 2.0 * d2 + d4
        M_tau = np.zeros((n, n))
        M_tau[: n - 4] = L[: n - 4]          # first N-4 equation rows
        M_tau[n - 4] = b.boundary_row("left", 1)    # dz(u)(-20)   = 0
        M_tau[n - 3] = b.boundary_row("left", 3)    # dz^3(u)(-20) = 0
        M_tau[n - 2] = b.boundary_row("right", 0)   # u(+20)       = 0
        M_tau[n - 1] = b.boundary_row("right", 2)   # dz^2(u)(+20) = 0

        E = np.eye(n)
        E[n - 4 :] = 0.0                     # BC rows get zero rhs
        Z = np.diag(b.dealias_mask(cfg.dealias_frac))
        Minv_E = np.linalg.solve(M_tau, E)

        V, A = b.synthesis, b.analysis
        self._A_lin = (V @ Minv_E @ A / cfg.dt).astype(rdtype)
        self._A_nl = (V @ Minv_E @ Z @ A).astype(rdtype)
        self._resid = float(np.abs(M_tau @ Minv_E - E).max())

        # Inner-product weights pair with the adjoint mode, mirroring the
        # reference's Inner_Prod alias switch (`FWD_Solve_SHB23.py:951-965`):
        # Discrete -> trapezoid weightMatrixDisc (:69-81,190-193);
        # Continuous -> spectral volume integral (Inner_Prod_Cnts via
        # Dedalus integrate) = Clenshaw-Curtis quadrature here.
        vol = cfg.z1 - cfg.z0
        if cfg.adjoint == "continuous":
            self._w = (b.clenshaw_curtis_weights / vol).astype(rdtype)
        else:
            self._w = (b.trapezoid_weights / vol).astype(rdtype)

        if cfg.method == "pallas":
            if cfg.dtype != "float32":
                raise ValueError(
                    "method='pallas' is an f32 TPU kernel; use "
                    "dtype='float32' (or method='matmul' for f64 runs)"
                )
            from spheremanopt_tpu.ops.pallas.fused_two_matrix import (
                fused_objective,
                fused_objective_diag,
            )

            a32 = self._A_lin.astype(np.float32)
            b32 = self._A_nl.astype(np.float32)
            w32 = np.asarray(self._w, np.float32)
            interp = jax.devices()[0].platform == "cpu"

            def _obj_impl_pl(xs):
                return fused_objective(
                    jnp.asarray(a32), jnp.asarray(b32), jnp.asarray(w32),
                    xs[0].astype(jnp.float32), 2.0, -1.0, cfg.dt,
                    cfg.n_iters, interp, False,
                )

            self._objective_impl_dispatch = _obj_impl_pl
        else:
            self._objective_impl_dispatch = self._objective_impl

        self._objective = jax.jit(self._objective_impl_dispatch)

        def _grad(xs):
            raw = jax.grad(self._objective_impl_dispatch)(list(xs))
            return [raw[0] / jnp.asarray(self._w)]

        def _obj_and_grad(xs):
            J, raw = jax.value_and_grad(self._objective_impl_dispatch)(list(xs))
            return J, [raw[0] / jnp.asarray(self._w)]

        self._gradient = jax.jit(_grad)
        self._obj_and_grad = jax.jit(_obj_and_grad)
        if cfg.method == "pallas":
            # fused-diagnostics kernel form: energies + final state from
            # the SAME VMEM pass, J op-identical (VERDICT r3 item 3)
            a32k = self._A_lin.astype(np.float32)
            b32k = self._A_nl.astype(np.float32)
            w32k = np.asarray(self._w, np.float32)
            interp_k = jax.devices()[0].platform == "cpu"
            # static subsample indices: chunk starts + final step (same
            # series semantics as strided_energy_scan for any stride)
            sidx = strided_steps(cfg.n_iters, cfg.diag_stride)

            def obj_diag_pl(xs):
                J, ser, uT = fused_objective_diag(
                    jnp.asarray(a32k), jnp.asarray(b32k),
                    jnp.asarray(w32k), xs[0].astype(jnp.float32),
                    2.0, -1.0, cfg.dt, cfg.n_iters, interp_k, False,
                )
                diag = {"kinetic_energy": jax.lax.stop_gradient(ser[sidx]),
                        "u_final": jax.lax.stop_gradient(uT)}
                return J, diag

            self._obj_and_diag = jax.jit(obj_diag_pl)

            def _obj_grad_diag_pl(xs):
                (J, diag), raw = jax.value_and_grad(
                    obj_diag_pl, has_aux=True)(xs)
                return J, [raw[0] / jnp.asarray(self._w)], diag

            self._obj_grad_and_diag = jax.jit(_obj_grad_diag_pl)
        else:
            self._obj_and_diag = jax.jit(self._objective_aux_impl)

            def _obj_grad_diag(xs):
                (J, diag), raw = jax.value_and_grad(
                    self._objective_aux_impl, has_aux=True)(xs)
                return J, [raw[0] / jnp.asarray(self._w)], diag

            self._obj_grad_and_diag = jax.jit(_obj_grad_diag)
        self._grad_cnts = jax.jit(self._gradient_continuous_impl)
        self._inner = jax.jit(lambda x, y: jnp.sum(jnp.asarray(self._w) * x * y))

    # ------------------------------------------------------------------
    # dynamics
    # ------------------------------------------------------------------

    def _step(self, u: jnp.ndarray) -> jnp.ndarray:
        """SBDF1 via precomputed grid-space propagators (tau solve + BCs
        + dealiasing folded in)."""
        g = 2.0 * u * u - u * u * u
        return (
            jnp.dot(self._A_lin, u, preferred_element_type=self._rdtype)
            + jnp.dot(self._A_nl, g, preferred_element_type=self._rdtype)
        )

    def _energy(self, u: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(jnp.asarray(self._w) * u * u)

    def _integrate(self, u0: jnp.ndarray, n_steps: int):
        """cost = dt * sum_{i=0..n_steps} IP(u_i, u_i): the i=0 term plus
        one per solve (ref `FWD_Solve_IVP_Discrete` :627-665)."""
        step = jax.checkpoint(self._step) if self.cfg.remat else self._step

        def body(carry, _):
            u, acc = carry
            acc = kahan_add(acc, self._energy(u))
            u = step(u)
            return (u, acc), None

        acc0 = kahan_zero(self._rdtype)
        (u, acc), _ = jax.lax.scan(body, (u0, acc0), xs=None, length=n_steps)
        acc = kahan_add(acc, self._energy(u))
        return u, self.cfg.dt * acc[0]

    def _objective_impl(self, x_list) -> jnp.ndarray:
        u0 = x_list[0].astype(self._rdtype)
        _, J = self._integrate(u0, self.cfg.n_iters)
        return -J

    def _integrate_aux(self, u0: jnp.ndarray, n_steps: int):
        """`_integrate` that also scans out the KE series from the SAME
        solve, every `diag_stride` steps, via the shared
        `strided_energy_scan`; J is op-identical to the plain path."""
        step = jax.checkpoint(self._step) if self.cfg.remat else self._step
        return strided_energy_scan(step, self._energy, u0, n_steps,
                                   self.cfg.diag_stride, self._rdtype,
                                   self.cfg.dt)

    def _objective_aux_impl(self, x_list):
        """(-J, diagnostics) captured from one forward solve (the fused
        analogue of the reference's scalar_data handler riding the FWD
        trajectory, `FWD_Solve_SHB23.py:604-676`)."""
        u0 = x_list[0].astype(self._rdtype)
        u, J, energies = self._integrate_aux(u0, self.cfg.n_iters)
        return -J, {"kinetic_energy": energies, "u_final": u}

    # ------------------------------------------------------------------
    # PDE-state restart (ref `IVP_FWD.load_state`, FWD_Solve_SH23.py:459-460)
    # ------------------------------------------------------------------

    def initial_state(self, x_list) -> dict:
        return {"u": jnp.asarray(x_list[0], self._rdtype)}

    def advance_state(self, state: dict, n_steps: int) -> dict:
        if not hasattr(self, "_advance"):
            from spheremanopt_tpu.problems.base import SegmentAdvance
            self._advance = SegmentAdvance(lambda s: {"u": self._step(s["u"])})
        return self._advance(state, n_steps)

    def state_fields(self, state) -> dict:
        return {"u": state["u"]}

    # ------------------------------------------------------------------
    # public triple
    # ------------------------------------------------------------------

    def _gradient_continuous_impl(self, x_list):
        """Continuous adjoint (ref `ADJ_Solve_IVP_Cnts`,
        `FWD_Solve_SHB23.py:685-795`): dt(q) + (1-a)q + 2 qzz + qzzzz =
        (4 uf - 3 uf^2) q - 2 uf with the same BCs, q(T) = 0, SBDF1 in
        reverse through the stored trajectory. First-order in dt."""
        u0 = x_list[0].astype(self._rdtype)

        def fwd_body(u, _):
            u2 = self._step(u)
            return u2, u2

        _, snaps = jax.lax.scan(fwd_body, u0, xs=None, length=self.cfg.n_iters)

        def adj_body(q, uf):
            h = (4.0 * uf - 3.0 * uf * uf) * q - 2.0 * uf
            q_new = (
                jnp.dot(self._A_lin, q, preferred_element_type=self._rdtype)
                + jnp.dot(self._A_nl, h, preferred_element_type=self._rdtype)
            )
            return q_new, None

        q0 = jnp.zeros_like(u0)
        q, _ = jax.lax.scan(adj_body, q0, snaps, reverse=True)
        return [q]

    def _require_solve(self):
        """Loud failure for the assembly-only mode (device_ops=False),
        whose construction skips the x64 check: running a solve there
        would silently truncate the f64 operators to f32."""
        if not self.cfg.device_ops:
            raise RuntimeError(
                "this SwiftHohenbergBounded was constructed with "
                "device_ops=False (operator assembly only, e.g. for the "
                "numpy baselines) — solve paths need device_ops=True")

    def objective(self, x_list):
        self._require_solve()
        return self._objective(list(x_list))

    def gradient(self, x_list):
        self._require_solve()
        if self.cfg.adjoint == "continuous":
            return self._grad_cnts(list(x_list))
        return self._gradient(list(x_list))

    def objective_and_gradient(self, x_list):
        """Fused (J, gradient); under adjoint='continuous' there is no
        fused form (the continuous adjoint is its own backward PDE
        integration, not the VJP of the discrete forward), so the mode's
        gradient is paired with a separate forward — f_and_g consumers
        (Wolfe fused phi) must not mix gradient definitions."""
        self._require_solve()
        if self.cfg.adjoint == "continuous":
            return self._objective(list(x_list)), self._grad_cnts(list(x_list))
        return self._obj_and_grad(list(x_list))

    def inner_product(self, x, y):
        return self._inner(x, y)

    @property
    def inner_products(self):
        return self.inner_product

    # ------------------------------------------------------------------
    # fused diagnostics: same-solve capture for zero-extra-cost archiving
    # ------------------------------------------------------------------

    @property
    def has_fused_diagnostics(self) -> bool:
        return self._obj_and_diag is not None

    def _diag_host(self, x_list, diag: dict) -> dict:
        out = dict(diag)
        out["sim_time"] = self.cfg.dt * strided_steps(
            self.cfg.n_iters, self.cfg.diag_stride)
        out["z_grid"] = self.basis.grid
        # LAZY: no per-call device->host transfer (tunnel round-trip);
        # the archiver converts at write time (see SwiftHohenberg)
        out["u_initial"] = x_list[0]
        return out

    def objective_and_diagnostics(self, x_list):
        """(J, diagnostics dict) from ONE forward solve (vs `diagnostics`,
        which re-runs it). Used by `io.timeseries.FusedArchiver`."""
        self._require_solve()
        if self._obj_and_diag is None:
            raise ValueError("fused diagnostics unavailable for "
                             f"method={self.cfg.method!r}")
        J, diag = self._obj_and_diag(list(x_list))
        return J, self._diag_host(x_list, diag)

    def objective_gradient_and_diagnostics(self, x_list):
        """(J, grads, diagnostics) from one fused fwd+bwd solve (or, under
        adjoint='continuous', the mode's own gradient next to the
        diagnostics-carrying forward — see `objective_and_gradient`)."""
        self._require_solve()
        if self._obj_grad_and_diag is None:
            raise ValueError("fused diagnostics unavailable for "
                             f"method={self.cfg.method!r}")
        if self.cfg.adjoint == "continuous":
            J, diag = self.objective_and_diagnostics(x_list)
            return J, self._grad_cnts(list(x_list)), diag
        J, g, diag = self._obj_grad_and_diag(list(x_list))
        return J, g, self._diag_host(x_list, diag)

    def final_state(self, x_list) -> jnp.ndarray:
        self._require_solve()
        u, _ = self._integrate(jnp.asarray(x_list[0], self._rdtype), self.cfg.n_iters)
        return u

    def diagnostics(self, x_list) -> dict:
        """Per-step KE series + initial/final states (the reference's
        scalar_data/CheckPoints h5 payloads, `FWD_Solve_SHB23.py:604-676`)."""
        self._require_solve()
        u0 = jnp.asarray(x_list[0], self._rdtype)
        if not hasattr(self, "_diagnostics_fn"):
            @jax.jit
            def run(u0):
                def body(u, _):
                    return self._step(u), self._energy(u)

                u, energies = jax.lax.scan(body, u0, xs=None,
                                           length=self.cfg.n_iters)
                return u, jnp.concatenate([energies, self._energy(u)[None]])

            self._diagnostics_fn = run
        u, energies = self._diagnostics_fn(u0)
        return {
            "sim_time": self.cfg.dt * np.arange(self.cfg.n_iters + 1),
            "kinetic_energy": energies,
            "z_grid": self.basis.grid,
            "u_initial": np.asarray(u0),
            "u_final": np.asarray(u),
        }

    # ------------------------------------------------------------------
    # initial conditions (ref Generate_IC :194-268: filtered noise,
    # prep-smooth 100 steps of dt=1e-2, normalise onto the sphere)
    # ------------------------------------------------------------------

    def generate_ic(self, seed: int = 42, m0: float = None) -> List[jnp.ndarray]:
        self._require_solve()
        m0 = self.cfg.m0 if m0 is None else m0
        prep = SwiftHohenbergBounded(
            SHB23Config(
                npts=self.cfg.npts, z0=self.cfg.z0, z1=self.cfg.z1,
                a=self.cfg.a, dt=1e-2, n_iters=100, m0=m0,
                dtype=self.cfg.dtype, remat=False,
                dealias_frac=self.cfg.dealias_frac,
            )
        )
        # low-pass projector (filter frac=0.25 in Discrete mode): numpy
        keep = (np.arange(self.cfg.npts) < 0.25 * self.cfg.npts).astype(float)
        lowpass = (self.basis.synthesis @ np.diag(keep) @ self.basis.analysis
                   ).astype(self._rdtype)

        @jax.jit
        def make(key):
            noise = jax.random.normal(key, (self.cfg.npts,), self._rdtype)
            u = jnp.dot(lowpass, noise, preferred_element_type=self._rdtype)
            u, _ = prep._integrate(u, 100)
            return u * jnp.sqrt(m0 / self._energy(u))

        return [make(jax.random.PRNGKey(seed))]
