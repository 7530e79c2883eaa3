"""df64 (f64-emulated) forward engine for the kinematic-dynamo problem.

WHY: the f32 KDyn gradient sits at the ~1e-4 rel-err class at the
reference 24^3 x 2000 config ("high" 3-pass einsums; BASELINE.md r3
precision table) — comfortably inside the Wolfe bracket tolerance for
the reference workload, but with no headroom for longer horizons or
larger Rm, where the induction trajectory's error amplification grows
exponentially exactly as the mixing problem's did (the r3 Wolfe-wall
failure mode). This engine is the same precision escape hatch
`problems/mixing_df.py` gave mixing, generalised to the 3-D two-sphere
problem: the f64-emulated FORWARD removes the dominant
eps_fwd * e^{2 lam T} term of the gradient error model while jax.grad's
f32 reverse sweep supplies the adjoint.

HOW: the discrete forward — the per-axis DFT matmul transforms, the
grid-space U x B cross product, the spectral curl, the Leray
projection, and the CNAB1 diagonal solve — is re-expressed in
double-float (ops/doublefloat): the scan carry is a DF (hi, lo) f32
pair of channel-packed coefficients, every constant-operator
contraction is an Ozaki exact-split matmul against the UNROUNDED f64
transform matrices (`KinematicDynamo._Ff64/...` — splitting the
c64-rounded operators would bake a 2^-24 discretisation perturbation,
the r4 self-review lesson), and all elementwise dynamics (diagonal
factors, wavenumber products, cross products, Parseval energy sums)
run on Dekker/Knuth error-free transforms with f64-exact DF constants.
The discrete gradient is jax.grad of this forward, exactly as in the
standard path (the Ozaki ops carry a custom_vjp keeping f32-quality
cotangents).

Selected via KDynConfig(solve_precision="df64"); the engine covers the
core triple (objective / gradient / fused) — diagnostics, archiving,
restart and Rm-sweep paths run on the standard f32 machinery (their
accuracy does not gate the optimisation).

Unlike the mixing engine, the Ozaki slice stacks here are tiny (four
(n|nz) x mg transform matrices, ~100 KB total), so they ride as numpy
closure constants (HLO constants — axon rule 1 allows numpy closures;
the mixing stacks are hundreds of MB and must be jit operands).

Reference: the f64 MPI CPU solve this emulates is
`Example_Problems/Periodic_Domain(Fourier)/Kinematic_Dynamo/
FWD_Solve_KDyn.py` (same CNAB1 discretisation; see
problems/kinematic_dynamo.py for the projection/curl derivation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.ops.doublefloat import (
    DF, OzakiComplexOp, df_add, df_from_f, df_from_np, df_mul, df_mul_f,
    df_neg, df_probe, df_sub, df_sum,
    df_channel as _ch, df_pack2 as _pack2,
    df_const as _dfc, df_map as _dfmap, df_stack as _dfstack,
)


def _comp(x: DF, i: int) -> DF:
    """Select one vector component along the leading axis."""
    return DF(x.hi[i], x.lo[i])


def _cross(a, b) -> DF:
    """DF vector cross product over the leading component axis."""
    def t(i, j):
        return df_sub(df_mul(_comp(a, i), _comp(b, j)),
                      df_mul(_comp(a, j), _comp(b, i)))

    return _dfstack([t(1, 2), t(2, 0), t(0, 1)])


class KDynDFEngine:
    """df64 forward for one KinematicDynamo instance (matmul transform
    layout: coefficients are channel-packed (3, n, n, n//2+1, 2) DF
    pairs). `objective(x_list)` is the jittable df forward returning the
    f32 scalar -J; jax.grad of it is the discrete gradient."""

    def __init__(self, prob, n_bits: int = 48, slice_dtype=np.float32,
                 batched: bool = False, with_adjoint: bool = False):
        if not df_probe():
            raise RuntimeError(
                "doublefloat self-probe failed: this compiler elides "
                "the compensation structure df64 relies on")
        cfg = prob.cfg
        self.cfg = cfg
        self._n_iters = cfg.n_iters
        self._remat = cfg.remat
        self._integrated = cfg.cost == "Integrated"
        self.with_adjoint = bool(with_adjoint)

        # with_adjoint: also build plain transposed df contractions over
        # the same slice stacks — the hand-rolled DF-cotangent reverse
        # sweep's building blocks (same design as mixing_df; bit width
        # bounded over both contraction directions)
        kw = dict(n_bits=n_bits, slice_dtype=slice_dtype, batched=batched,
                  with_transpose=self.with_adjoint)
        # transforms, split from the EXACT f64 operators. Forward
        # (analysis) contracts the mg-sized grid axes; inverse
        # (synthesis) contracts the truncated n / n//2+1 mode axes.
        Ff, Fz = prob._Ff64, prob._Fz64
        Bf, Bz = prob._Bf64, prob._Bz64
        self._oFz = OzakiComplexOp(Fz, "Zk,cabk->cabZ", "Zk,cabZ->cabk",
                                   y_axis=-1, **kw)
        self._oFy = OzakiComplexOp(Ff, "Yb,cabZe->caYZe",
                                   "Yb,caYZe->cabZe", y_axis=-3, **kw)
        self._oFx = OzakiComplexOp(Ff, "Xa,caYZe->cXYZe",
                                   "Xa,cXYZe->caYZe", y_axis=-4, **kw)
        self._oBx = OzakiComplexOp(Bf, "aX,cXYZe->caYZe",
                                   "aX,caYZe->cXYZe", y_axis=-4, **kw)
        self._oBy = OzakiComplexOp(Bf, "bY,caYZe->cabZe",
                                   "bY,cabZe->caYZe", y_axis=-3, **kw)
        self._oBz = OzakiComplexOp(Bz, "kZ,cabZe->cabke",
                                   "kZ,cabke->cabZe", y_axis=-2, **kw)
        # oFx/oFy (and oBx/oBy) share a matrix; their slice stacks are
        # identical numpy arrays, and as closure constants XLA dedups
        # them — no operand plumbing needed at these sizes.

        # f64-exact DF closure constants (trailing channel axis where
        # they broadcast against packed coefficients)
        self._rhs_df = df_from_np(prob._rhs_fac64[..., None])
        self._lhs_df = df_from_np(prob._lhs_inv64[..., None])
        self._k_df = df_from_np(prob._k64[..., None])        # (3,n,n,nz,1)
        self._ik2_df = df_from_np(prob._inv_k264[..., None])
        self._pw_df = df_from_np(prob._pw64)                 # (n,n,nz)
        self._dt_df = df_from_np(np.float64(cfg.dt))
        self._keep = np.asarray(prob._keep, np.float32)[..., None]

    # --- df transforms ---------------------------------------------------

    @staticmethod
    def _sl(op: OzakiComplexOp):
        return (jnp.asarray(op.re.slices_np), jnp.asarray(op.im.slices_np))

    def to_coeff(self, g: DF) -> DF:
        """(3, mg, mg, mg) real grid -> packed (3, n, n, nz, 2) coeffs
        (the standard path's z-y-x einsum order, in df)."""
        c = self._oFz.apply_real_in(self._sl(self._oFz), g)
        c = self._oFy.apply_packed(self._sl(self._oFy), c)
        c = self._oFx.apply_packed(self._sl(self._oFx), c)
        return df_mul_f(c, jnp.asarray(self._keep))

    def to_grid(self, c: DF) -> DF:
        """Packed coeffs -> (3, mg, mg, mg) real grid (x-y-z order; the
        z synthesis carries the Hermitian doubling weights and discards
        the imaginary output, as the standard path's .real does)."""
        y = self._oBx.apply_packed(self._sl(self._oBx), c)
        y = self._oBy.apply_packed(self._sl(self._oBy), y)
        return self._oBz.apply_real_out(self._sl(self._oBz), y)

    # --- dynamics ----------------------------------------------------------

    def _energy(self, c: DF) -> DF:
        """(1/V) int |B|^2 via Parseval (rfft Hermitian double-count
        weights), summed over the 3 components — `KinematicDynamo.
        _energy` in df."""
        re, im = _ch(c, 0), _ch(c, 1)
        e = df_add(df_mul(re, re), df_mul(im, im))
        return df_sum(df_mul(e, _dfc(self._pw_df)))

    def _leray(self, c: DF) -> DF:
        """Mode-wise divergence-free projection P = I - k k^T / k^2 on
        packed coefficients (k real: acts identically per channel)."""
        k = _dfc(self._k_df)
        parts = [df_mul(_comp(k, i), _comp(c, i)) for i in range(3)]
        div = df_add(df_add(parts[0], parts[1]), parts[2])
        corr = df_mul(k, df_mul(div, _dfc(self._ik2_df)))
        return df_sub(c, corr)

    def _induction(self, b_c: DF, u_g: DF) -> DF:
        """F-hat = i k x (U x B)-hat: padded-grid cross product + spectral
        curl. i * v on packed coeffs: re' = -v_im, im' = v_re."""
        b = self.to_grid(b_c)
        e_c = self.to_coeff(_cross(u_g, b))
        k = _dfc(self._k_df)
        kr = DF(k.hi[..., 0], k.lo[..., 0])          # (3, n, n, nz)
        ce_re, ce_im = _ch(e_c, 0), _ch(e_c, 1)
        curl_re = _cross(kr, ce_re)                  # k x Re(e)
        curl_im = _cross(kr, ce_im)                  # k x Im(e)
        # i * (k x e): re = -(k x e)_im, im = (k x e)_re
        return _pack2(df_neg(curl_im), curl_re)

    def _step(self, b_c: DF, u_g: DF) -> DF:
        """CNAB1: B' = lhs_inv * P(rhs_fac * B + F), mean mode pinned."""
        rhs = df_add(df_mul(b_c, _dfc(self._rhs_df)),
                     self._induction(b_c, u_g))
        out = df_mul(self._leray(rhs), _dfc(self._lhs_df))
        return _dfmap(lambda a: a.at[:, 0, 0, 0, :].set(0.0), out)

    # --- objective ---------------------------------------------------------

    def _objective_df(self, x_list) -> DF:
        """-J as a DF pair (the reference's FWD solvers return -J to turn
        maximisation into minimisation, `FWD_Solve_KDyn.py:689`)."""
        b0 = df_from_f(x_list[0].astype(jnp.float32))
        u = df_from_f(x_list[1].astype(jnp.float32))
        b0_c = self.to_coeff(b0)
        # band-limit U the way Vec_to_Field + Dedalus products do
        u_bl = self.to_grid(self.to_coeff(u))

        step = self._step
        if self._remat in (True, "step"):
            step = jax.checkpoint(step)

        integrated = self._integrated

        def body(carry, _):
            b, acc = carry
            if integrated:
                acc = df_add(acc, self._energy(b))
            b = step(b, u_bl)
            return (b, acc), None

        z = jnp.zeros((), jnp.float32)
        (b, acc), _ = jax.lax.scan(body, (b0_c, DF(z, z)), xs=None,
                                   length=self._n_iters)
        if integrated:
            acc = df_add(acc, self._energy(b))
            return df_neg(df_mul(acc, _dfc(self._dt_df)))
        return df_neg(self._energy(b))

    def objective(self, x_list) -> jnp.ndarray:
        """df64 discrete objective as an f32 scalar; jax.grad of this is
        the discrete gradient (Riesz-scale by the IP weights as the
        standard path's `_riesz` does)."""
        J = self._objective_df(list(x_list))
        return J.hi + J.lo

    def objective_pair(self, x_list) -> jnp.ndarray:
        """-J at full df resolution as a stacked (hi, lo) f32 pair —
        hosts reconstruct float64(hi) + float64(lo) (the f32 scalar
        rounds to ~ulp(J), swamping Taylor increments and fine
        line-search comparisons)."""
        J = self._objective_df(list(x_list))
        return jnp.stack([J.hi, J.lo])

    # ==================================================================
    # hand-rolled DOUBLE-FLOAT ADJOINT (df cotangents) — with_adjoint
    # ==================================================================
    #
    # The KDyn counterpart of mixing_df's DF-cotangent sweep: the same
    # discrete adjoint jax.grad evaluates in f32 (the measured 1.05e-5
    # kdyn24 df64 gradient floor, BENCH r4/r5) carried as DF pairs,
    # with every transform transposition an exact-split Ozaki
    # contraction over the shared slice stacks. The Leray projection,
    # the diagonal CNAB1 factors and the mean-mode pin are
    # SELF-ADJOINT (symmetric real per mode), so the adjoint step
    # reuses the forward's own df operators; cross products transpose
    # via <a x b, c> = <b, c x a>.

    def to_coeff_T(self, q: DF) -> DF:
        """Adjoint of to_coeff: packed coeff cotangent -> real grid."""
        q = df_mul_f(q, jnp.asarray(self._keep))
        q = self._oFx.applyT_packed(self._sl(self._oFx), q)
        q = self._oFy.applyT_packed(self._sl(self._oFy), q)
        return self._oFz.applyT_to_real(self._sl(self._oFz), q)

    def to_grid_T(self, q: DF) -> DF:
        """Adjoint of to_grid: real grid cotangent -> packed coeffs."""
        y = self._oBz.applyT_from_real(self._sl(self._oBz), q)
        y = self._oBy.applyT_packed(self._sl(self._oBy), y)
        return self._oBx.applyT_packed(self._sl(self._oBx), y)

    def _induction_adjoint(self, b_c: DF, u_g: DF, q: DF):
        """Adjoint of `_induction` at the stored state: packed cotangent
        q -> (coeff cotangent of b_c, GRID cotangent of u_g)."""
        k = _dfc(self._k_df)
        kr = DF(k.hi[..., 0], k.lo[..., 0])
        qr, qi = _ch(q, 0), _ch(q, 1)
        # out = pack(-(kr x e_im), kr x e_re); <k x a, c> = <a, c x k>
        er_cot = _cross(qi, kr)
        ei_cot = df_neg(_cross(qr, kr))
        cgrid = self.to_coeff_T(_pack2(er_cot, ei_cot))
        bg = self.to_grid(b_c)
        # z = cross(u, bg): bg_cot = c x u, u_cot = bg x c
        cb = self.to_grid_T(_cross(cgrid, u_g))
        cu = _cross(bg, cgrid)
        return cb, cu

    def _step_adjoint(self, b_c: DF, u_g: DF, cb1: DF):
        """Adjoint of `_step`: cotangent of the step output -> (cotangent
        of the step input, grid cotangent contribution of u)."""
        q = _dfmap(lambda a: a.at[:, 0, 0, 0, :].set(0.0), cb1)
        q = df_mul(q, _dfc(self._lhs_df))
        q = self._leray(q)
        cb = df_mul(q, _dfc(self._rhs_df))
        dcb, du = self._induction_adjoint(b_c, u_g, q)
        return df_add(cb, dcb), du

    def _energy_adjoint(self, c: DF, scale: DF) -> DF:
        """d(energy)/dc scaled: 2 * pw (.) c on both channels."""
        pw = _dfc(self._pw_df)
        two = jnp.float32(2.0)
        re = df_mul(df_mul_f(df_mul(_ch(c, 0), pw), two), scale)
        im = df_mul(df_mul_f(df_mul(_ch(c, 1), pw), two), scale)
        return _pack2(re, im)

    def _build_adjoint_objective(self):
        """`(objective_adj, objective_adj_aux)` whose custom_vjp
        backward IS the hand-rolled DF reverse sweep (same contract as
        mixing_df._build_adjoint_objective; aux = the (hi, lo) J
        pair)."""
        integrated = self._integrated
        n_iters = self._n_iters

        def _fwd_scan(x):
            b0 = df_from_f(x[0].astype(jnp.float32))
            u = df_from_f(x[1].astype(jnp.float32))
            b0_c = self.to_coeff(b0)
            u_bl = self.to_grid(self.to_coeff(u))

            def body(carry, _):
                b, acc = carry
                state = b
                if integrated:
                    acc = df_add(acc, self._energy(b))
                b = self._step(b, u_bl)
                return (b, acc), state

            z = jnp.zeros((), jnp.float32)
            (bN, acc), traj = jax.lax.scan(body, (b0_c, DF(z, z)),
                                           xs=None, length=n_iters)
            if integrated:
                acc = df_add(acc, self._energy(bN))
                J = df_neg(df_mul(acc, _dfc(self._dt_df)))
            else:
                J = df_neg(self._energy(bN))
            return J, traj, bN, u_bl

        @jax.custom_vjp
        def objective_adj_aux(x_list):
            J, _, _, _ = _fwd_scan(list(x_list))
            return J.hi + J.lo, jnp.stack([J.hi, J.lo])

        def fwd(x_list):
            J, traj, bN, u_bl = _fwd_scan(list(x_list))
            return ((J.hi + J.lo, jnp.stack([J.hi, J.lo])),
                    (traj, bN, u_bl))

        def bwd(res, cots):
            traj, bN, u_bl = res
            cj = df_from_f(cots[0])   # the pair cotangent is zero
            if integrated:
                scale = df_neg(df_mul(cj, _dfc(self._dt_df)))
            else:
                scale = df_neg(cj)
            cb = self._energy_adjoint(bN, scale)
            cu0 = DF(jnp.zeros_like(u_bl.hi), jnp.zeros_like(u_bl.lo))

            def rbody(carry, state):
                cb, cu = carry
                cb, du = self._step_adjoint(state, u_bl, cb)
                if integrated:
                    cb = df_add(cb, self._energy_adjoint(state, scale))
                return (cb, df_add(cu, du)), None

            (cb, cu_bl), _ = jax.lax.scan(rbody, (cb, cu0), traj,
                                          reverse=True)
            gb = self.to_coeff_T(cb)
            gu = self.to_coeff_T(self.to_grid_T(cu_bl))
            return ([gb.hi + gb.lo, gu.hi + gu.lo],)

        objective_adj_aux.defvjp(fwd, bwd)

        def objective_adj(x_list):
            return objective_adj_aux(x_list)[0]

        return objective_adj, objective_adj_aux
