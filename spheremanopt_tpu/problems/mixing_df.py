"""df64 (f64-emulated) forward engine for the optimal-mixing problem.

WHY: every f32 pass mode leaves the mixing GRADIENT at the 6-9e-2
rel-err class (BASELINE.md r3 precision table) — the Re=500 Boussinesq
trajectory amplifies per-step rounding chaotically through the
1000-step reverse sweep, and at 512x256 the Wolfe directional
derivatives become too noisy to bracket (the r3-close workload
failure). The error model is

    grad err ~ eps_fwd * e^{2 lam T}  +  eps_rev * e^{lam T},

so an f64-emulated FORWARD (eps_fwd: 2^-24 -> ~2^-44) removes the
dominant term while jax.grad's f32 reverse sweep (eps_rev = 2^-24)
stays — landing the gradient at the ~e^{lam T} * 2^-24 ~ 1e-4 class the
non-chaotic problems already enjoy.

HOW: the full discrete forward — transforms, derivative operators,
nonlinear grid products, the per-kx tau solves, and the mix-norm/KE
reductions — is re-expressed in double-float (ops/doublefloat): scan
carries are DF (hi, lo) f32 pairs; every constant-operator contraction
is an Ozaki exact-split matmul (b-bit slices, one bf16 MXU pass per
slice pair, EXACT f32 accumulation); pointwise products use Dekker
two_prod. The discrete gradient is jax.grad of this forward, exactly as
in the standard-precision path (the Ozaki ops carry a custom_vjp so the
reverse matmuls keep f32-quality cotangents).

Selected via MixingConfig(solve_precision="df64"); the engine only
covers the core triple (objective / gradient / fused) — diagnostics,
archiving, and IC-prep paths run on the standard compensated machinery
(their accuracy does not gate the optimisation).

Reference: the f64 MPI CPU solve this emulates is
`Example_Problems/Bounded_Domain(Cheby)/Optimal_Mixing/
FWD_Solve_Poiseuille.py` (same SBDF1 discretisation; see
problems/optimal_mixing.py for the operator derivation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.ops.doublefloat import (
    DF, OzakiComplexOp, OzakiOp, df_add, df_from_f, df_from_np, df_mul,
    df_mul_f, df_neg, df_probe, df_sum,
    df_channel as _ch, df_pack2 as _pack2,
    df_const as _dfc, df_map as _dfmap, df_concat as _dfconcat,
)


class MixingDFEngine:
    """Builds the Ozaki operator slices and the df forward for one
    OptimalMixing instance. `ops_np()` returns the numpy slice stacks
    (the problem device_puts them and passes them back through jit
    arguments); `objective(ops, x_list)` is the jittable df forward."""

    def __init__(self, prob, slice_dtype=np.float32, n_bits: int = 48,
                 batched: bool = False, with_adjoint: bool = False):
        if not df_probe():
            raise RuntimeError(
                "doublefloat self-probe failed: this compiler elides "
                "the compensation structure df64 relies on")
        cfg = prob.cfg
        self.cfg = cfg
        self._s = cfg.s
        self._n_iters = cfg.n_iters
        self._remat = cfg.remat
        self.with_adjoint = bool(with_adjoint)
        nz = cfg.nz
        self._nz = nz

        # with_adjoint builds PLAIN transposed df contractions over the
        # same slice stacks (bit width bounded over both contraction
        # directions) — the hand-rolled DF-cotangent reverse sweep's
        # building blocks (VERDICT r4 item 4). Slice geometry then
        # differs from the default mode by at most one bit of b; the
        # forward stays df64-accurate (same n_bits coverage) but is not
        # bitwise-identical to with_adjoint=False.
        kw = dict(n_bits=n_bits, slice_dtype=slice_dtype,
                  batched=batched, with_transpose=self.with_adjoint)
        # transforms (constant f64 operators -> exact slice stacks)
        self._oFx = OzakiComplexOp(np.asarray(prob._Fx64, np.complex128),
                                   "kj,jz->kz", "kj,kz->jz",
                                   y_axis=-2, **kw)
        self._oBx = OzakiComplexOp(np.asarray(prob._Bx64, np.complex128),
                                   "jk,kzc->jzc", "jk,jzc->kzc",
                                   y_axis=-3, **kw)
        self._oAz = OzakiOp(np.asarray(prob._Az64, np.float64),
                            "nz,kzc->knc", "nz,knc->kzc",
                            y_axis=-2, **kw)
        self._oVz = OzakiOp(np.asarray(prob._Vz64, np.float64),
                            "zn,knc->kzc", "zn,kzc->knc",
                            y_axis=-2, **kw)
        self._oDz = OzakiOp(prob._Dz_np, "mn,knc->kmc", "mn,kmc->knc",
                            y_axis=-2, **kw)

        # per-kx tau solve, parity-blocked exactly as the standard path
        # (problems/optimal_mixing._solve; _parity_perm is the single
        # source of truth for the family layout)
        S = prob._S_np
        ph = prob._parity_perm(S.shape[-1]) if nz % 2 == 0 else None
        self._blocked = False
        if ph is not None:
            perm, h = ph
            ap = S[:, perm][:, :, perm]
            off = max(np.abs(ap[:, :h, h:]).max(),
                      np.abs(ap[:, h:, :h]).max())
            if off <= 1e-11 * max(np.abs(ap).max(), 1e-300):
                S = np.stack([ap[:, :h, :h], ap[:, h:, h:]], axis=1)
                self._blocked = True
                self._h = h
        if self._blocked:
            self._oS = OzakiComplexOp(S, "kbij,kbjc->kbic",
                                      "kbij,kbic->kbjc", y_axis=-2, **kw)
        else:
            self._oS = OzakiComplexOp(S, "kij,kjc->kic", "kij,kic->kjc",
                                      y_axis=-2, **kw)
        self._oMN = (OzakiComplexOp(prob._MN_np, "kij,kjc->kic",
                                    "kij,kic->kjc", y_axis=-2, **kw)
                     if cfg.s == 1 else None)

        # small df closure constants (numpy pairs -> HLO constants)
        self._kx_df = df_from_np(np.asarray(prob._kx)[:, None])   # (kxn,1)
        self._w_df = df_from_np(np.asarray(prob._w64, np.float64))  # grid
        rho0 = np.stack([prob._rho0_c64.real, prob._rho0_c64.imag], -1)
        self._rho0_df = df_from_np(rho0)                          # (kxn,nz,2)
        self._xmask = np.asarray(prob._xmask, np.float32)[:, None, None]
        self._a0_df = df_from_np(np.float64(1.0) / np.float64(cfg.dt))
        self._dt_df = df_from_np(np.float64(cfg.dt))

    # ------------------------------------------------------------------

    def ops_np(self) -> dict:
        out = {"Fx": self._oFx.slices_np, "Bx": self._oBx.slices_np,
               "Az": self._oAz.slices_np, "Vz": self._oVz.slices_np,
               "Dz": self._oDz.slices_np, "S": self._oS.slices_np}
        if self._oMN is not None:
            out["MN"] = self._oMN.slices_np
        return out

    # --- df transforms -------------------------------------------------

    def to_coeff(self, ops, g: DF) -> DF:
        c = self._oFx.apply_real_in(ops["Fx"], g)     # (kxn, mgz, 2)
        c = self._oAz.apply(ops["Az"], c)             # (kxn, nz, 2)
        return df_mul_f(c, jnp.asarray(self._xmask))

    def to_grid(self, ops, c: DF) -> DF:
        y = self._oVz.apply(ops["Vz"], c)             # (kxn, mgz, 2)
        return self._oBx.apply_real_out(ops["Bx"], y)  # (mgx, mgz)

    def _dx(self, c: DF) -> DF:
        """i * kx * c on packed coefficients (kx as a df constant)."""
        kx = _dfc(self._kx_df)
        return _pack2(df_neg(df_mul(_ch(c, 1), kx)),
                      df_mul(_ch(c, 0), kx))

    def _ddz(self, ops, c: DF) -> DF:
        return self._oDz.apply(ops["Dz"], c)

    # --- dynamics -------------------------------------------------------

    def _nonlinear(self, ops, u, w, r):
        ug = self.to_grid(ops, u)
        wg = self.to_grid(ops, w)
        out = []
        for c in (u, w, r):
            cx = self.to_grid(ops, self._dx(c))
            cz = self.to_grid(ops, self._ddz(ops, c))
            adv = df_add(df_mul(ug, cx), df_mul(wg, cz))
            out.append(df_neg(self.to_coeff(ops, adv)))
        return out

    def _block_arr(self, a):
        """rhs layout (kxn, 3nz, c) -> parity-blocked (kxn, 2, 3nz/2, c)
        (the strided slicing of optimal_mixing._solve; a permutation)."""
        nz = self._nz
        uA, wA, rA = (a[:, 0:nz:2], a[:, nz + 1:2 * nz:2],
                      a[:, 2 * nz + 1::2])
        uB, wB, rB = (a[:, 1:nz:2], a[:, nz:2 * nz:2],
                      a[:, 2 * nz::2])
        return jnp.stack([jnp.concatenate([uA, wA, rA], -2),
                          jnp.concatenate([uB, wB, rB], -2)], axis=1)

    def _unblock_arr(self, o):
        """parity-blocked solution (kxn, 2, 3nz/2, c) -> (kxn, 3nz, c)."""
        nz = self._nz
        kxn = o.shape[0]
        h3 = nz // 2
        ue, wo, ro = (o[:, 0, :h3], o[:, 0, h3:2 * h3], o[:, 0, 2 * h3:])
        uo, we, re = (o[:, 1, :h3], o[:, 1, h3:2 * h3], o[:, 1, 2 * h3:])
        u = jnp.stack([ue, uo], -2).reshape(kxn, nz, 2)
        w = jnp.stack([we, wo], -2).reshape(kxn, nz, 2)
        r = jnp.stack([re, ro], -2).reshape(kxn, nz, 2)
        return jnp.concatenate([u, w, r], -2)

    def _solve_S(self, ops, rhs: DF) -> DF:
        """Blocked per-kx tau solve, mirroring optimal_mixing._solve's
        strided parity slicing (exact structural ops on hi/lo)."""
        if not self._blocked:
            return self._oS.apply_packed(ops["S"], rhs)
        out = self._oS.apply_packed(ops["S"], _dfmap(self._block_arr, rhs))
        return _dfmap(self._unblock_arr, out)

    def _step(self, ops, u, w, r):
        nlu, nlw, nlr = self._nonlinear(ops, u, w, r)
        a0 = _dfc(self._a0_df)
        rhs = _dfconcat([df_add(df_mul(u, a0), nlu),
                         df_add(df_mul(w, a0), nlw),
                         df_add(df_mul(r, a0), nlr)], axis=-2)
        sol = self._solve_S(ops, rhs)
        nz = self._nz
        return (_dfmap(lambda a: a[:, :nz], sol),
                _dfmap(lambda a: a[:, nz:2 * nz], sol),
                _dfmap(lambda a: a[:, 2 * nz:], sol))

    # --- objectives -----------------------------------------------------

    def _ke(self, ops, u, w) -> DF:
        ug = self.to_grid(ops, u)
        wg = self.to_grid(ops, w)
        e = df_add(df_mul(ug, ug), df_mul(wg, wg))
        return df_sum(df_mul(e, _dfc(self._w_df)))

    def _mixnorm(self, ops, r) -> DF:
        psi = self._oMN.apply_packed(ops["MN"], r)
        gx = self.to_grid(ops, self._dx(psi))
        gz = self.to_grid(ops, self._ddz(ops, psi))
        e = df_add(df_mul(gx, gx), df_mul(gz, gz))
        return df_mul_f(df_sum(df_mul(e, _dfc(self._w_df))),
                        jnp.float32(0.5))

    def objective(self, ops, x_list) -> jnp.ndarray:
        """df64 discrete objective as an f32 scalar; jax.grad of this is
        the discrete gradient (divide by the IP weights for the Riesz
        form, as the standard path does)."""
        J = self._objective_df(ops, x_list)
        return J.hi + J.lo

    def objective_pair(self, ops, x_list) -> jnp.ndarray:
        """J at full df resolution as a stacked (hi, lo) f32 pair — the
        f32 scalar rounds to ~ulp(J) (4e-9 absolute at the reference
        J ~ 0.04), which swamps Taylor-remainder increments and fine
        line-search comparisons; hosts reconstruct float64(hi) +
        float64(lo)."""
        J = self._objective_df(ops, x_list)
        return jnp.stack([J.hi, J.lo])

    def _objective_df(self, ops, x_list) -> DF:
        x = x_list[0].astype(jnp.float32)
        u = self.to_coeff(ops, df_from_f(x[0]))
        w = self.to_coeff(ops, df_from_f(x[1]))
        r = _dfc(self._rho0_df)

        step = self._step
        if self._remat:
            step = jax.checkpoint(step, static_argnums=())

        def body(carry, _):
            u, w, r, acc = carry
            if self._s == 0:
                acc = df_add(acc, self._ke(ops, u, w))
            u, w, r = step(ops, u, w, r)
            return (u, w, r, acc), None

        z = jnp.zeros((), jnp.float32)
        (u, w, r, acc), _ = jax.lax.scan(
            body, (u, w, r, DF(z, z)), xs=None, length=self._n_iters)
        if self._s == 0:
            acc = df_add(acc, self._ke(ops, u, w))
            J = df_mul(acc, _dfc(self._dt_df))
            return df_mul_f(J, jnp.float32(-0.5))
        return self._mixnorm(ops, r)

    # ==================================================================
    # hand-rolled DOUBLE-FLOAT ADJOINT (df cotangents) — with_adjoint
    # ==================================================================
    #
    # jax.grad of the df forward evaluates the exact adjoint in f32
    # (the measured 5.9e-4 mixing-gradient floor: f32 cotangent-carry
    # propagation through the chaotic 1000-step reverse sweep —
    # BASELINE.md r4 s_bwd dead end). These methods evaluate the SAME
    # discrete adjoint with the cotangents carried as DF pairs and
    # every operator transposition an exact-split Ozaki contraction —
    # the reverse-sweep counterpart of the df64 forward. The reference
    # comparison point is the f64 discrete adjoint at
    # `FWD_Solve_Poiseuille.py:1320-1650`.
    #
    # Conventions: cotangents live in the same packed layouts as the
    # primals (coeff (kxn, nz, 2) / grid (mgx, mgz)); every pointwise
    # product's adjoint re-uses the stored forward trajectory at DF
    # precision (an f32 linearization point would reintroduce the
    # eps*e^{2 lam T} term the df forward removed).

    def to_coeff_T(self, ops, q: DF) -> DF:
        """Adjoint of to_coeff: packed coeff cotangent -> real grid."""
        q = df_mul_f(q, jnp.asarray(self._xmask))   # (kxn,1,1) mask
        q2 = self._oAz.apply_T(ops["Az"], q)            # (kxn, mgz, 2)
        return self._oFx.applyT_to_real(ops["Fx"], q2)  # (mgx, mgz)

    def to_grid_T(self, ops, q: DF) -> DF:
        """Adjoint of to_grid: real grid cotangent -> packed coeff."""
        q1 = self._oBx.applyT_from_real(ops["Bx"], q)   # (kxn, mgz, 2)
        return self._oVz.apply_T(ops["Vz"], q1)         # (kxn, nz, 2)

    def _dx_T(self, q: DF) -> DF:
        """Adjoint of multiply-by-(i kx) = multiply-by-(-i kx)."""
        kx = _dfc(self._kx_df)
        return _pack2(df_mul(_ch(q, 1), kx),
                      df_neg(df_mul(_ch(q, 0), kx)))

    def _ddz_T(self, ops, q: DF) -> DF:
        return self._oDz.apply_T(ops["Dz"], q)

    def _solve_S_T(self, ops, q: DF) -> DF:
        """Adjoint of the (blocked) tau solve: S^H on the cotangent,
        with the block/unblock permutations transposed exactly via
        jax.linear_transpose (pure data movement on hi/lo)."""
        if not self._blocked:
            return self._oS.applyT_packed(ops["S"], q)
        nz = self._nz
        kxn = q.hi.shape[0]
        dt = q.hi.dtype
        un_t = jax.linear_transpose(
            self._unblock_arr,
            jax.ShapeDtypeStruct((kxn, 2, 3 * (nz // 2), 2), dt))
        q_b = DF(un_t(q.hi)[0], un_t(q.lo)[0])
        s = self._oS.applyT_packed(ops["S"], q_b)
        bl_t = jax.linear_transpose(
            self._block_arr, jax.ShapeDtypeStruct((kxn, 3 * nz, 2), dt))
        return DF(bl_t(s.hi)[0], bl_t(s.lo)[0])

    def _nonlinear_adjoint(self, ops, state, qs):
        """Adjoint of `_nonlinear` at the stored DF state: given coeff
        cotangents (qu, qw, qr) of (nlu, nlw, nlr), returns the coeff
        cotangent contributions to (u, w, r)."""
        u, w, r = state
        ug = self.to_grid(ops, u)
        wg = self.to_grid(ops, w)
        ug_cot = None
        wg_cot = None
        c_cots = []
        for c, q in zip((u, w, r), qs):
            adv_cot = df_neg(self.to_coeff_T(ops, q))   # grid (mgx,mgz)
            cx = self.to_grid(ops, self._dx(c))
            cz = self.to_grid(ops, self._ddz(ops, c))
            t1 = df_mul(cx, adv_cot)
            t2 = df_mul(cz, adv_cot)
            ug_cot = t1 if ug_cot is None else df_add(ug_cot, t1)
            wg_cot = t2 if wg_cot is None else df_add(wg_cot, t2)
            cx_cot = df_mul(ug, adv_cot)
            cz_cot = df_mul(wg, adv_cot)
            c_cots.append(df_add(
                self._dx_T(self.to_grid_T(ops, cx_cot)),
                self._ddz_T(ops, self.to_grid_T(ops, cz_cot))))
        cu, cw, cr = c_cots
        cu = df_add(cu, self.to_grid_T(ops, ug_cot))
        cw = df_add(cw, self.to_grid_T(ops, wg_cot))
        return cu, cw, cr

    def _step_adjoint(self, ops, state, cots):
        """Adjoint of `_step`: cotangents of the step OUTPUT ->
        cotangents of the step INPUT, all in DF."""
        cu1, cw1, cr1 = cots
        nz = self._nz
        c_sol = _dfconcat([cu1, cw1, cr1], axis=-2)
        c_rhs = self._solve_S_T(ops, c_sol)
        qu = _dfmap(lambda a: a[:, :nz], c_rhs)
        qw = _dfmap(lambda a: a[:, nz:2 * nz], c_rhs)
        qr = _dfmap(lambda a: a[:, 2 * nz:], c_rhs)
        nu, nw, nr = self._nonlinear_adjoint(ops, state, (qu, qw, qr))
        a0 = _dfc(self._a0_df)
        cu = df_add(df_mul(qu, a0), nu)
        cw = df_add(df_mul(qw, a0), nw)
        cr = df_add(df_mul(qr, a0), nr)
        return cu, cw, cr

    def _mixnorm_adjoint(self, ops, r: DF, cj: DF) -> DF:
        """Adjoint of `_mixnorm` w.r.t. the final density coefficients:
        d(0.5 sum w (gx^2+gz^2))/dr with psi = MN @ r."""
        psi = self._oMN.apply_packed(ops["MN"], r)
        gx = self.to_grid(ops, self._dx(psi))
        gz = self.to_grid(ops, self._ddz(ops, psi))
        wq = _dfc(self._w_df)
        gx_cot = df_mul(df_mul(gx, wq), cj)
        gz_cot = df_mul(df_mul(gz, wq), cj)
        psi_cot = df_add(self._dx_T(self.to_grid_T(ops, gx_cot)),
                         self._ddz_T(ops, self.to_grid_T(ops, gz_cot)))
        return self._oMN.applyT_packed(ops["MN"], psi_cot)

    def _ke_adjoint(self, ops, u: DF, w: DF, scale: DF):
        """Coeff-space cotangent contributions of `_ke(u, w)` scaled by
        `scale` (d(sum wq (ug^2+wg^2))/du = to_grid^T(2 wq ug))."""
        wq = _dfc(self._w_df)
        two = jnp.float32(2.0)
        ug = self.to_grid(ops, u)
        wg = self.to_grid(ops, w)
        cu = self.to_grid_T(ops, df_mul(df_mul_f(df_mul(ug, wq), two),
                                        scale))
        cw = self.to_grid_T(ops, df_mul(df_mul_f(df_mul(wg, wq), two),
                                        scale))
        return cu, cw

    def _build_adjoint_objective(self):
        """`objective_adj(ops, x_list) -> J` (f32 scalar) whose
        custom_vjp backward IS the hand-rolled DF reverse sweep. The
        forward stores the per-step DF trajectory (scan ys); the
        backward replays it in reverse with DF cotangents."""
        s = self._s
        n_iters = self._n_iters

        def _fwd_scan(ops, x):
            u = self.to_coeff(ops, df_from_f(x[0]))
            w = self.to_coeff(ops, df_from_f(x[1]))
            r = _dfc(self._rho0_df)
            z = jnp.zeros((), jnp.float32)

            def body(carry, _):
                u, w, r, acc = carry
                state = (u, w, r)
                if s == 0:
                    acc = df_add(acc, self._ke(ops, u, w))
                u, w, r = self._step(ops, u, w, r)
                return (u, w, r, acc), state

            (u, w, r, acc), traj = jax.lax.scan(
                body, (u, w, r, DF(z, z)), xs=None, length=n_iters)
            if s == 0:
                acc = df_add(acc, self._ke(ops, u, w))
                J = df_mul_f(df_mul(acc, _dfc(self._dt_df)),
                             jnp.float32(-0.5))
            else:
                J = self._mixnorm(ops, r)
            return J, traj, (u, w, r)

        @jax.custom_vjp
        def objective_adj_aux(ops, x_list):
            """(J_f32, (hi, lo) pair). The pair is an aux output (host
            consumers resolve it to f64); only J is differentiated —
            its cotangent drives the DF reverse sweep, the pair's is
            structurally zero under has_aux/indexing consumers."""
            x = x_list[0].astype(jnp.float32)
            J, _, _ = _fwd_scan(ops, x)
            return J.hi + J.lo, jnp.stack([J.hi, J.lo])

        def fwd(ops, x_list):
            x = x_list[0].astype(jnp.float32)
            J, traj, final = _fwd_scan(ops, x)
            return ((J.hi + J.lo, jnp.stack([J.hi, J.lo])),
                    (ops, traj, final))

        def bwd(res, cots):
            cj_f32 = cots[0]   # the pair cotangent is zero by contract
            ops, traj, (uT, wT, rT) = res
            cj = df_from_f(cj_f32)

            def zero_like(c):
                return DF(jnp.zeros_like(c.hi), jnp.zeros_like(c.lo))

            if s == 1:
                cr = self._mixnorm_adjoint(ops, rT, cj)
                cu, cw = zero_like(uT), zero_like(wT)
            else:
                scale = df_mul_f(df_mul(cj, _dfc(self._dt_df)),
                                 jnp.float32(-0.5))
                cu, cw = self._ke_adjoint(ops, uT, wT, scale)
                cr = zero_like(rT)

            def rbody(cots, state):
                cu, cw, cr = self._step_adjoint(ops, state, cots)
                if s == 0:
                    du, dw = self._ke_adjoint(ops, state[0], state[1],
                                              scale)
                    cu = df_add(cu, du)
                    cw = df_add(cw, dw)
                return (cu, cw, cr), None

            (cu, cw, _cr), _ = jax.lax.scan(
                rbody, (cu, cw, cr), traj, reverse=True)
            gu = self.to_coeff_T(ops, cu)
            gw = self.to_coeff_T(ops, cw)
            gx = jnp.stack([gu.hi + gu.lo, gw.hi + gw.lo])
            ops_zero = jax.tree_util.tree_map(jnp.zeros_like, ops)
            return ops_zero, [gx]

        objective_adj_aux.defvjp(fwd, bwd)

        def objective_adj(ops, x_list):
            return objective_adj_aux(ops, x_list)[0]

        return objective_adj, objective_adj_aux
