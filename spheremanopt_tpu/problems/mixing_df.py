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
                 batched: bool = False):
        if not df_probe():
            raise RuntimeError(
                "doublefloat self-probe failed: this compiler elides "
                "the compensation structure df64 relies on")
        cfg = prob.cfg
        self.cfg = cfg
        self._s = cfg.s
        self._n_iters = cfg.n_iters
        self._remat = cfg.remat
        nz = cfg.nz
        self._nz = nz

        kw = dict(n_bits=n_bits, slice_dtype=slice_dtype,
                  batched=batched)
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

    def _solve_S(self, ops, rhs: DF) -> DF:
        """Blocked per-kx tau solve, mirroring optimal_mixing._solve's
        strided parity slicing (exact structural ops on hi/lo)."""
        nz = self._nz
        if not self._blocked:
            return self._oS.apply_packed(ops["S"], rhs)
        kxn = rhs.hi.shape[0]

        def block(a):
            uA, wA, rA = (a[:, 0:nz:2], a[:, nz + 1:2 * nz:2],
                          a[:, 2 * nz + 1::2])
            uB, wB, rB = (a[:, 1:nz:2], a[:, nz:2 * nz:2],
                          a[:, 2 * nz::2])
            return jnp.stack([jnp.concatenate([uA, wA, rA], -2),
                              jnp.concatenate([uB, wB, rB], -2)], axis=1)

        out = self._oS.apply_packed(ops["S"], _dfmap(block, rhs))
        h3 = nz // 2

        def unblock(o):
            ue, wo, ro = (o[:, 0, :h3], o[:, 0, h3:2 * h3], o[:, 0, 2 * h3:])
            uo, we, re = (o[:, 1, :h3], o[:, 1, h3:2 * h3], o[:, 1, 2 * h3:])
            u = jnp.stack([ue, uo], -2).reshape(kxn, nz, 2)
            w = jnp.stack([we, wo], -2).reshape(kxn, nz, 2)
            r = jnp.stack([re, ro], -2).reshape(kxn, nz, 2)
            return jnp.concatenate([u, w, r], -2)

        return _dfmap(unblock, out)

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
