"""Marcotte-Caulfield optimal mixing: 2D Boussinesq in a channel.

Reference: `Example_Problems/Bounded_Domain(Cheby)/Optimal_Mixing/
FWD_Solve_Poiseuille.py`. The optimisation over the initial perturbation
velocity (u0, w0) of plane Poiseuille flow U(z) = 1 - z^2 is

  s=0:  max   J = (1/2) int_t (1/V) int |u|^2 dV dt   (time-avg KE)
  s=1:  min   J = (1/2) (1/V) int |grad psi|^2 dV,  lap psi = rho(T)
        (the mix-norm ||grad^-1 rho(T)||^2, ref :1052-1117)
  s.t.  (1/V) int |u0|^2 = E0  and the linearised-about-base-flow
        advection-diffusion system (ref :824-844):

    u/dt - (1/Re) lap u + dx p + U dx u + w U' = -(u.grad)u   + u^n/dt
    w/dt - (1/Re) lap w + dz p + U dx w + Ri rho = -(u.grad)w + w^n/dt
    rho/dt - (1/Pe) lap rho + U dx rho + Fb = -(u.grad)rho    + rho^n/dt
    dx u + dz w = 0
    BCs: u = w = 0 at z = +-1 (w(+1) replaced by the integ(p)=0 gauge at
    kx=0), dz(rho) = 0 at z = +-1; Fb = 0 for kx != 0 and integ(rho) = 0
    at kx = 0 (mean-density gauge),

with rho(0) = -erf(z/delta)/2 and implicit Euler (SBDF1) stepping of the
full LHS (base-flow advection included implicitly, ref :824-826).

TPU-first realisation:
  * per-kx Chebyshev-tau block systems over (u, w, rho, p) [+ Fb at
    kx=0] are assembled and inverted ONCE in f64 numpy; the reduced
    solution operators S[kx] : (rhs_u, rhs_w, rhs_rho) -> (u, w, rho)
    form a (Kx, 3Nz, 3Nz) batched tensor, so each implicit step is one
    batched complex matmul on the MXU — replacing the reference's
    per-pencil sparse LU loop (`:1035-1043`)
  * these operator stacks are ~100s of MB: they are passed as
    DEVICE-RESIDENT ARGUMENTS through jit (embedding them as closure
    constants is both bloated and, on this platform, re-shipped per
    call — see the axon rule in swift_hohenberg.py)
  * transforms are per-axis matmuls (rfft-layout DFT in x, Chebyshev
    cosine in z) with 3/2-oversampled products; the band truncation
    back to (Kx, Nz) is the reference's 2/3-rule DA mask (`:887-899`)
  * the adjoint — the reference's transposed pencil solvers, adjoint
    derivative ops, NLtermAdj Jacobian products, and mix-norm transpose
    (`:1320-1650`) — is jax.grad of this discrete forward.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from spheremanopt_tpu.ops.chebyshev import ChebyshevBasis1D
from spheremanopt_tpu.problems.base import check_choice, check_x64
from spheremanopt_tpu.solvers.scan_utils import kahan_add, kahan_zero


@dataclass(frozen=True)
class MixingConfig:
    nx: int = 256                # Fourier modes in x (ref `__main__` :1746)
    nz: int = 128                # Chebyshev modes in z
    lx: float = 4.0 * np.pi
    reynolds: float = 500.0
    richardson: float = 0.05
    prandtl: float = 1.0
    dt: float = 5e-3
    n_iters: int = 1000          # T = 5
    e0: float = 0.02
    delta: float = 0.125         # erf buoyancy layer width (ref :1758)
    s: int = 1                   # 0: KE maximisation, 1: mix-norm min
    pad_factor: float = 1.5
    dtype: str = "float64"
    remat: bool = True
    adjoint: str = "discrete"    # "discrete" (autodiff) | "continuous"
                                 # (the ref's ADJ_Solve_Cnts system,
                                 # `FWD_Solve_Poiseuille.py:1161-1319`)
    device_ops: bool = True      # False: skip device placement of the
                                 # operator stacks (CPU baselines that
                                 # only need the numpy operators)
    prep_steps: int = 100        # IC prep: LINEAR solve iterations
    prep_dt: float = 1e-4        # (ref FWD_Solve_IVP_Prep :520, Sim_Type
                                 # ="Linear" build :480-484)
    solve_precision: str = "compensated"
                                 # f32 TPU accuracy of the per-kx solves
                                 # (measured, 1000 steps vs f64; BASELINE.md):
                                 #  "bfloat16"    J rel-err 5.6e-2, fastest
                                 #                (operator hoisted to bf16,
                                 #                VMEM-resident)
                                 #  "compensated2" 6.4e-2 @ 194 ms: full-width
                                 #                operator on a bf16-rounded
                                 #                rhs, 2 bf16 dots. MEASURED
                                 #                DEAD END (r3): the rhs
                                 #                random walk dominates the
                                 #                bf16 error budget, so it
                                 #                lands at plain-bf16 accuracy
                                 #                while saving only 12% of
                                 #                "compensated" — dominated by
                                 #                "bfloat16" on both axes.
                                 #                Kept as the tested negative
                                 #                result.
                                 #  "compensated" 1.45e-4: operator stored as
                                 #                bf16 hi/lo split planes, rhs
                                 #                split via reduce_precision,
                                 #                3 bf16 dots (lo.lo dropped)
                                 #  "highest"     2.4e-3: 6-pass f32 emulation
                                 #  "df64"        f64-EMULATED forward (double-
                                 #                float carries + Ozaki exact-
                                 #                split matmuls, ops/doublefloat
                                 #                + problems/mixing_df): the
                                 #                escape hatch for the measured
                                 #                ~6-9e-2 f32 GRADIENT floor
                                 #                (chaotic amplification; no
                                 #                pass mode fixes it). Core
                                 #                triple only; aux paths run
                                 #                "compensated". Requires
                                 #                adjoint="discrete".
                                 # f64 runs (CPU/tests) are always exact.
    df_n_bits: int = 48          # df64 only: forward significand bits
                                 # covered by the Ozaki slice stacks
                                 # (ops/doublefloat.make_ozaki_apply).
                                 # Fewer bits -> fewer slice-pair MXU
                                 # passes (cost ~ q(q+1)/2, q = ceil(
                                 # n_bits/b)) at more forward rounding;
                                 # the frontier is measured in
                                 # BASELINE.md (r4 n_bits sweep):
                                 # 32 -> 1.72x faster at gradient
                                 # accuracy IDENTICAL to 48 (rel_J
                                 # 1.0e-6, still 140x beyond the f32
                                 # floor) — the recommended wall-time
                                 # point; 48 (rel_J ~1e-11, the df
                                 # carry floor) is the safe default.
    df_adjoint: bool = False     # df64 only: hand-rolled DOUBLE-FLOAT
                                 # adjoint — the reverse sweep carries
                                 # DF cotangent pairs through exact
                                 # transposed Ozaki contractions
                                 # (mixing_df adjoint section), breaking
                                 # the measured 5.9e-4 f32-reverse-sweep
                                 # gradient floor (BASELINE.md r4 s_bwd
                                 # dead end; the reference comparison is
                                 # its f64 discrete adjoint,
                                 # FWD_Solve_Poiseuille.py:1320-1650).
                                 # Costs ~2x the df64 fused call and
                                 # stores the full DF trajectory
                                 # (~0.8 GB at 256x128 x 1000 steps) —
                                 # the opt-in deepest-accuracy mode.
    df_slice_dtype: str = "float32"
                                 # df64 only: storage dtype of the Ozaki
                                 # slice stacks. "bfloat16" is EXACT
                                 # (slices carry <= 8 significand bits)
                                 # and halves the operator bytes —
                                 # measured 1.00x speed at 256x128
                                 # (BASELINE.md r4 dead end); use it at
                                 # resolutions where HBM capacity binds
                                 # (512x256: ~4 GB of f32 slices).
    df_batched_einsums: bool = False
                                 # df64 only: issue ONE batched einsum
                                 # per rhs slice over the operator
                                 # slice stack (q dots) instead of
                                 # q(q+1)/2 scalar ones. Same slice-
                                 # pair products; only the order the
                                 # exact-f32 partials join a level sum
                                 # changes (rounding ~2^-24 of the
                                 # level, far below the df target) —
                                 # so NOT bitwise vs the default, but
                                 # df64-accurate. Measured SLOWER on
                                 # the TPU at 256x128 (3021 vs 2410 ms
                                 # — BASELINE.md r4 dead end): XLA
                                 # already fuses the scalar einsums.
                                 # Kept for other backends.


def _cheb_mult_T(coeffs_of_factor: np.ndarray, n: int) -> np.ndarray:
    """Exact coefficient-space multiplication matrix for a polynomial
    factor given by Chebyshev coefficients: T_m T_k = (T_{m+k} + T_|m-k|)/2,
    truncated to n modes (how Dedalus applies NCCs like U(z) = 1 - z^2)."""
    M = np.zeros((n, n))
    for m, cm in enumerate(coeffs_of_factor):
        if cm == 0.0:
            continue
        for k in range(n):
            if m + k < n:
                M[m + k, k] += 0.5 * cm
            if abs(m - k) < n:
                M[abs(m - k), k] += 0.5 * cm
    # T_0 T_k = T_k (the formula double-counts m=0: (T_k + T_k)/2) — OK.
    return M


def _block_solve(A, E, col_a, bc_pairs):
    """Solve A X = E by exact parity decoupling: two half-size LU solves
    instead of one (8x fewer factorisation flops — measured 3-4x on the
    assembly wall at the reference resolutions, BASELINE.md r4).

    Every tau-system ingredient maps Chebyshev parity exactly (I/D2/MU
    preserve index parity; D1/MUp flip it — their entries are exact
    dyadic/ integer values, so off-class entries are EXACT zeros), and
    the boundary rows pair up: rows r1, r2 of each `bc_pairs` entry have
    ZERO rhs in E, so replacing them by (r1+r2, r1-r2) is an invertible
    row operation on (A|E) that leaves the solution unchanged while
    making each BC row pure-parity ((-1)^n +- 1 is exactly 0 or +-2).

    `col_a` is the boolean class-A column mask (u_even, w_odd, rho_odd,
    p_even — the family-A layout of `_parity_perm`). Row/rhs classes are
    DERIVED from the recombined matrix and verified; any structure
    violation returns None and the caller falls back to the full solve,
    so this is a pure accelerator, never a correctness assumption."""
    Aw = A.copy()
    for r1, r2 in bc_pairs:
        if E[r1].any() or E[r2].any():
            return None
        Aw[r1], Aw[r2] = A[r1] + A[r2], A[r1] - A[r2]
    col_b = ~col_a
    rows_a = ~Aw[:, col_b].any(axis=1)
    rows_b = ~Aw[:, col_a].any(axis=1)
    if not (rows_a ^ rows_b).all():          # every row pure, none zero
        return None
    if rows_a.sum() != col_a.sum():
        return None
    zero_cols = ~E.any(axis=0)
    cols_ea = ~E[rows_b].any(axis=0) & ~zero_cols
    cols_eb = ~E[rows_a].any(axis=0) & ~zero_cols
    if not (cols_ea | cols_eb | zero_cols).all():
        return None                          # an rhs column mixes classes
    X = np.zeros((A.shape[0], E.shape[1]), A.dtype)
    for rows, cols_v, cols_e in ((rows_a, col_a, cols_ea),
                                 (rows_b, col_b, cols_eb)):
        iv, ie = np.where(cols_v)[0], np.where(cols_e)[0]
        X[np.ix_(iv, ie)] = np.linalg.solve(
            Aw[np.ix_(np.where(rows)[0], iv)],
            E[np.ix_(np.where(rows)[0], ie)])
    return X



def _cx(pair):
    """Reassemble a complex operator from its (real, imag) device pair."""
    return pair[0] + 1j * pair[1]


def _solve_apply(op_pair, rhs_c, precision=None):
    """Batched per-kx solve in PACKED real-plane form: the complex rhs
    rides as a trailing channel dim c=(re, im), so each operator plane
    is applied by exactly ONE batched dot per step.

    Mathematically identical to `einsum("kij,kj->ki", _cx(op), rhs)`,
    but measured (axon TPU v5e, mixing reference config, per scan step):
      complex einsum composed in the step body . 474 us
      four real-plane matvecs ................  78 us (bare scan: 211)
      packed two-dot form (this) .............  34 us fwd / 23 us VJP
    XLA's complex-dot lowering re-reads the ~150 MB operator planes and
    schedules the four separate matvecs poorly inside a fused scan body;
    the packed form guarantees one streaming pass per plane and lets the
    loop-invariant operator stay resident. The same structure holds for
    the auto-derived VJP (contraction flips to "kij,kic->kjc"), so no
    custom gradient is needed.
    """
    opr, opi = op_pair
    y = jnp.stack([rhs_c.real, rhs_c.imag], axis=-1)   # (..., n, 2)
    p1 = jnp.einsum("...ij,...jc->...ic", opr, y, precision=precision)
    p2 = jnp.einsum("...ij,...jc->...ic", opi, y, precision=precision)
    return jax.lax.complex(p1[..., 0] - p2[..., 1], p1[..., 1] + p2[..., 0])


def _solve_apply_compensated(op_quad, rhs_c):
    """Error-compensated f32 solve on the bf16 MXU: the operator planes
    are stored as bf16 hi/lo SPLIT pairs (hi = bf16(S), lo = S - hi) and
    the rhs is split in-graph with lax.reduce_precision (a plain
    f32->bf16->f32 convert pair is elided by XLA's excess-precision
    simplifier, silently dropping the correction). Three bf16 dots per
    plane (the lo.lo term is below f32 resolution), barriered so XLA
    cannot re-fold hi+lo dots into one bf16 dot.

    Measured (mixing reference config, 1000 steps vs f64): J rel-err
    5.4e-5, vs 5.6e-2 for plain bf16 — the single-pass default's
    per-step rhs rounding random-walks to percent-level error, and a
    bf16-rounded OPERATOR alone is a badly perturbed propagator (620%
    error): both splits are needed.
    """
    from spheremanopt_tpu.ops.compensated import comp_einsum_pair

    # shared helper = single source of the reduce_precision/barrier
    # traps (ops/compensated.py generalises exactly this solve)
    y = jnp.stack([rhs_c.real, rhs_c.imag], axis=-1)
    p1, p2 = comp_einsum_pair("...ij,...jc->...ic", op_quad, y)
    return jax.lax.complex(p1[..., 0] - p2[..., 1], p1[..., 1] + p2[..., 0])


def _solve_apply_compensated2(op_quad, rhs_c):
    """2-dot middle mode (`ops.compensated.comp_einsum_pair_2dot`):
    full-width operator, bf16-rounded rhs — 2/3 the MXU passes of
    "compensated" for a ~1e-3-class J error. See MixingConfig
    .solve_precision for the measured accuracy/cost ladder."""
    from spheremanopt_tpu.ops.compensated import comp_einsum_pair_2dot

    y = jnp.stack([rhs_c.real, rhs_c.imag], axis=-1)
    p1, p2 = comp_einsum_pair_2dot("...ij,...jc->...ic", op_quad, y)
    return jax.lax.complex(p1[..., 0] - p2[..., 1], p1[..., 1] + p2[..., 0])


class OptimalMixing:
    """Mixing problem: X = [(2, mgx, mgz) velocity grid fields]."""

    def _solve(self, op, rhs_c):
        """Apply a stored per-kx solve operator at the configured
        precision (see MixingConfig.solve_precision).

        Blocked form (op arrays are 4-D, (kxn, 2, h, h)): with the even
        base flow U = 1 - z^2 the tau solve decouples EXACTLY into two
        Chebyshev-parity families — (u even, w odd, rho odd) and the
        mirror — verified to f64 roundoff at operator build. Applying
        the two half-size blocks streams HALF the operator bytes per
        step, and the operator stream is the measured binding cost of
        the f32-width solves: fwd+grad 357 -> 218 ms (compensated,
        reference config, v5e). The bf16 fast mode is NOT HBM-bound and
        stays unblocked (see _put_blocked)."""
        blocked = op[0].ndim == 4
        if blocked:
            # family A = (u even, w odd, rho odd); B = mirror. Strided
            # slices + interleave reshapes (measured faster than an
            # index gather inside the fused scan body)
            nz = self.cfg.nz
            kxn = rhs_c.shape[0]
            uA, wA, rA = (rhs_c[:, 0:nz:2], rhs_c[:, nz + 1:2 * nz:2],
                          rhs_c[:, 2 * nz + 1::2])
            uB, wB, rB = (rhs_c[:, 1:nz:2], rhs_c[:, nz:2 * nz:2],
                          rhs_c[:, 2 * nz::2])
            rhs_c = jnp.stack([jnp.concatenate([uA, wA, rA], -1),
                               jnp.concatenate([uB, wB, rB], -1)], axis=1)
        if self._smode == "compensated":
            out = _solve_apply_compensated(op, rhs_c)
        elif self._smode == "compensated2":
            out = _solve_apply_compensated2(op, rhs_c)
        elif self._smode in ("highest", "high"):
            out = _solve_apply(op, rhs_c, precision=self._smode)
        else:
            out = _solve_apply(op, rhs_c)
        if blocked:
            h3 = nz // 2
            ue, wo, ro = out[:, 0, :h3], out[:, 0, h3:2 * h3], out[:, 0, 2 * h3:]
            uo, we, re = out[:, 1, :h3], out[:, 1, h3:2 * h3], out[:, 1, 2 * h3:]
            u = jnp.stack([ue, uo], -1).reshape(kxn, nz)
            w = jnp.stack([we, wo], -1).reshape(kxn, nz)
            r = jnp.stack([re, ro], -1).reshape(kxn, nz)
            out = jnp.concatenate([u, w, r], -1)
        # pin the output dtype (f32 configs under x64 processes pick up
        # f64 promotions from numpy constants upstream; scan carries
        # built from solves must stay at the config dtype)
        return out.astype(self._cdtype)

    def _parity_perm(self, m):
        """(perm, h) splitting an m-column (u,w,rho)-stacked coefficient
        layout into the two parity families. SINGLE SOURCE OF TRUTH for
        the family layout: _solve's strided slices implement exactly
        this ordering (family A = u[::2], w[1::2], rho[1::2]; B = the
        complements), and test_parity_blocked_solve_matches_full guards
        the equivalence — change both together."""
        nz = self.cfg.nz
        ev = np.arange(0, nz, 2)
        od = np.arange(1, nz, 2)
        if m != 3 * nz:
            return None  # not a (u,w,rho) stack — caller falls back to _put
        fam_a = np.concatenate([ev, nz + od, 2 * nz + od])
        fam_b = np.concatenate([od, nz + ev, 2 * nz + ev])
        perm = np.concatenate([fam_a, fam_b])
        return perm, len(fam_a)

    def __init__(self, cfg: MixingConfig = MixingConfig()):
        if cfg.device_ops:
            # device_ops=False constructs NO jax arrays (operator
            # assembly stays numpy end-to-end for the CPU baselines),
            # so the x64 truncation hazard check_x64 guards against
            # cannot occur; solve entry points raise via _solve_ops()
            check_x64(cfg.dtype)
        check_choice("adjoint", cfg.adjoint, ("discrete", "continuous"))
        check_choice("s", cfg.s, (0, 1))
        self.cfg = cfg
        rdtype = jnp.dtype(cfg.dtype)
        self._rdtype = rdtype
        self._cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
        nx, nz = cfg.nx, cfg.nz
        self.kxn = nx // 2 + 1
        self.mgx = int(round(nx * cfg.pad_factor))
        self.mgz = int(round(nz * cfg.pad_factor))
        self.radii = [cfg.e0]

        self.zbasis = ChebyshevBasis1D(nz, -1.0, 1.0)
        zfull = ChebyshevBasis1D(self.mgz, -1.0, 1.0)
        self._zgrid = zfull.grid

        # --- small transform matrices (numpy -> HLO constants) ---
        j = np.arange(self.mgx)
        kxi = np.arange(self.kxn)
        cnp = np.complex128 if rdtype == jnp.float64 else np.complex64
        # exact f64 forms kept alongside the working-dtype copies: the
        # df64 engine must Ozaki-split the EXACT operators (splitting
        # the f32-rounded copies would bake a 2^-24 discretization
        # perturbation under the emulated forward — measured r4: the
        # pre-fix rel_J plateau at 8e-8 was exactly this)
        self._Fx64 = np.exp(-2j * np.pi * np.outer(kxi, j) / self.mgx) / self.mgx
        self._Fx = self._Fx64.astype(cnp)
        wx = np.full(self.kxn, 2.0)
        wx[0] = 1.0
        self._xmask = np.ones(self.kxn)
        if nx % 2 == 0:
            self._xmask[-1] = 0.0  # Nyquist of the nx-band
        self._Bx64 = np.exp(2j * np.pi * np.outer(j, kxi) / self.mgx) * wx[None, :]
        self._Bx = self._Bx64.astype(cnp)
        # z: analysis on the oversampled grid, truncated to nz; synthesis padded
        self._Az64 = zfull.analysis[:nz].astype(np.float64)                     # (nz, mgz)
        self._Az = self._Az64.astype(rdtype)
        self._Vz64 = np.asarray(zfull.synthesis[:, :nz], np.float64)            # (mgz, nz)
        self._Vz = self._Vz64.astype(rdtype)
        self._Dz_np = self.zbasis.diff_matrix                                   # (nz, nz)
        self._Dz = self._Dz_np.astype(rdtype)
        self._kx = (2.0 * np.pi * kxi / cfg.lx).astype(np.float64)

        # Effective solve mode: the precision machinery only concerns the
        # bf16 MXU; f64 runs (CPU tests/baselines) are exact by
        # construction and use the plain packed form.
        allowed = {"bfloat16", "compensated", "compensated2", "high",
                   "highest", "df64"}
        if cfg.solve_precision not in allowed:
            # an unknown string would silently fall through to the plain
            # single-pass bf16 dot path
            raise ValueError(
                f"solve_precision={cfg.solve_precision!r} not in "
                f"{sorted(allowed)}")
        self._df64 = (cfg.solve_precision == "df64"
                      and rdtype == jnp.float32)
        if self._df64 and cfg.adjoint != "discrete":
            raise ValueError(
                "solve_precision='df64' pairs with adjoint='discrete' "
                "(the df engine's gradient IS jax.grad of its forward; "
                "the continuous adjoint integrates its own PDE on the "
                "standard-precision machinery)")
        # df64 layers over the standard machinery: aux paths
        # (diagnostics, archiving, IC prep) run "compensated"
        self._smode = (("compensated" if self._df64
                        else cfg.solve_precision)
                       if rdtype == jnp.float32 else "exact")

        # --- per-kx implicit solve operators (device args, not consts) ---
        # Stored as real/imag PAIRS (or bf16 hi/lo split QUADS in
        # compensated mode): complex host<->device transfers are
        # unimplemented on this platform above small sizes, so the
        # complex operators are reassembled inside jit from real planes.
        def _put(a):
            a = np.asarray(a)
            if self._smode in ("compensated", "compensated2"):
                # NOTE: storing the split planes as bf16 dtype (their hi
                # values are exactly representable) measured 1.5x SLOWER
                # than f32 storage in-process (513 vs 332 ms fwd+grad) —
                # XLA's mixed-dtype dot path loses the good schedule —
                # with identical accuracy (the MXU casts per pass either
                # way). Keep f32 storage (split_complex_matrix is f32).
                from spheremanopt_tpu.ops.compensated import (
                    split_complex_matrix)

                return tuple(jax.device_put(jnp.asarray(v, rdtype))
                             for v in split_complex_matrix(a))
            return (jax.device_put(jnp.asarray(a.real, rdtype)),
                    jax.device_put(jnp.asarray(a.imag, rdtype)))

        def _put_blocked(a):
            """Store an S-type stack as its two parity blocks
            (kxn, 2, h, h) — see _solve. Falls back to the full form if
            the decoupling does not hold numerically (guard for exotic
            configs; never expected with the U = 1 - z^2 base flow)."""
            a = np.asarray(a)
            m = a.shape[-1]
            if nz % 2 or a.shape[-2] != m or self._smode == "bfloat16":
                # bf16 fast mode measured FASTER unblocked (169 vs
                # 109 ms): its solve is not HBM-bound, so halving the
                # operator bytes only adds slicing overhead
                return _put(a)
            ph = self._parity_perm(m)
            if ph is None:
                return _put(a)
            perm, h = ph
            ap = a[:, perm][:, :, perm]
            off = max(np.abs(ap[:, :h, h:]).max(), np.abs(ap[:, h:, :h]).max())
            if off > 1e-11 * max(np.abs(ap).max(), 1e-300):
                return _put(a)
            return _put(np.stack([ap[:, :h, :h], ap[:, h:, h:]], axis=1))

        self._put_op = _put_blocked

        S, MN = self._build_operators()
        self._S_np, self._MN_np = S, MN   # exact f64 operators (baselines)
        if cfg.device_ops:
            self._ops: Dict[str, jnp.ndarray] = {"S": _put_blocked(S),
                                                 "MN": _put(MN)}
            if cfg.adjoint == "continuous":
                SA, _ = self._build_operators(adjoint=True,
                                              build_mixnorm=False)
                self._ops["SA"] = _put_blocked(SA)
        else:
            self._ops = None

        # Inner-product weights. The reference pairs the IP with the
        # adjoint mode (`FWD_Solve_Poiseuille.py:1730-1740`):
        #   Discrete  -> rectangle-rule weightMatrixDisc (:91-117)
        #   Continuous-> spectral volume integral (Inner_Prod_Cnts,
        #                :264-279) = Clenshaw-Curtis in z x mean in x,
        # under which the continuous-adjoint field is the correct Riesz
        # representative.
        vol = cfg.lx * 2.0
        dx = cfg.lx / self.mgx
        z = self._zgrid
        if cfg.adjoint == "continuous":
            wz = zfull.clenshaw_curtis_weights
        else:
            wz = np.empty(self.mgz)
            wz[0] = z[1] - z[0]
            wz[1:] = z[1:] - z[:-1]
        self._w64 = np.broadcast_to(wz[None, :],
                                    (self.mgx, self.mgz)) * dx / vol
        self._w = self._w64.astype(rdtype)

        # rho(0) = -erf(z/delta)/2, truncated to the nz band (ref :920-925)
        rho0_grid = np.broadcast_to(
            -0.5 * erf(z / cfg.delta)[None, :], (self.mgx, self.mgz)
        )
        # exact f64 coefficients via the exact transforms (the df64
        # engine's IC constant; _to_coeff_np would route through the
        # f32-rounded Fx/Az in f32 configs)
        self._rho0_c64 = np.einsum(
            "nz,kz->kn", self._Az64,
            np.einsum("kj,jz->kz", self._Fx64, rho0_grid),
        ) * self._xmask[:, None]
        self._rho0_c = self._rho0_c64.astype(cnp)

        self._objective = jax.jit(self._objective_impl)

        def _grad(ops, xs):
            raw = jax.grad(self._objective_impl, argnums=1)(ops, list(xs))
            return [raw[0] / jnp.asarray(self._w)[None]]

        def _obj_and_grad(ops, xs):
            J, raw = jax.value_and_grad(self._objective_impl, argnums=1)(ops, list(xs))
            return J, [raw[0] / jnp.asarray(self._w)[None]]

        self._gradient = jax.jit(_grad)
        self._obj_and_grad = jax.jit(_obj_and_grad)
        self._obj_and_diag = jax.jit(self._objective_aux_impl)

        def _obj_grad_diag(ops, xs):
            (J, diag), raw = jax.value_and_grad(
                self._objective_aux_impl, argnums=1, has_aux=True
            )(ops, list(xs))
            return J, [raw[0] / jnp.asarray(self._w)[None]], diag

        self._obj_grad_and_diag = jax.jit(_obj_grad_diag)
        self._grad_cnts = jax.jit(self._gradient_continuous_impl)
        self._adj_bc = jax.jit(
            lambda ops_, xs_: self._gradient_continuous_impl(
                ops_, xs_, with_bc=True))
        if rdtype == jnp.float32:
            # compensated line-search inner products (VERDICT r3 item 1):
            # the Wolfe directional derivatives ride this reduction, so
            # widen it to df accuracy — exact products + pairwise
            # compensated fold, ~f64-quality from f32 operands
            from spheremanopt_tpu.ops.doublefloat import df_dot

            wnp = np.asarray(self._w)  # f32 numpy -> HLO constant

            def _ip(x, y):
                return df_dot(jnp.asarray(wnp)[None], x, y).hi

            self._inner = jax.jit(_ip)
        else:
            self._inner = jax.jit(
                lambda x, y: jnp.sum(jnp.asarray(self._w)[None] * x * y)
            )

        # --- df64 engine: f64-emulated core triple (see mixing_df) ---
        self._dfe = None
        if self._df64 and cfg.device_ops:
            from spheremanopt_tpu.problems.mixing_df import MixingDFEngine

            self._dfe = MixingDFEngine(
                self,
                slice_dtype=(jnp.bfloat16
                             if cfg.df_slice_dtype == "bfloat16"
                             else np.dtype(cfg.df_slice_dtype)),
                n_bits=int(cfg.df_n_bits),
                batched=bool(cfg.df_batched_einsums),
                with_adjoint=bool(cfg.df_adjoint))
            self._ops_df = jax.tree.map(
                lambda a: jax.device_put(jnp.asarray(a)),
                self._dfe.ops_np())
            # df_adjoint: differentiate the custom_vjp objective whose
            # backward IS the hand-rolled DF reverse sweep; otherwise
            # jax.grad of the df forward (f32 reverse sweep)
            _obj_adj_aux = None
            if cfg.df_adjoint:
                _obj_for_grad, _obj_adj_aux = \
                    self._dfe._build_adjoint_objective()
            else:
                _obj_for_grad = self._dfe.objective
            self._objective_df = jax.jit(self._dfe.objective)
            wdiv = np.asarray(self._w)

            def _grad_df(ops, xs):
                raw = jax.grad(_obj_for_grad, argnums=1)(ops, list(xs))
                return [raw[0] / jnp.asarray(wdiv)[None]]

            def _obj_and_grad_df(ops, xs):
                J, raw = jax.value_and_grad(
                    _obj_for_grad, argnums=1)(ops, list(xs))
                return J, [raw[0] / jnp.asarray(wdiv)[None]]

            def _obj_and_grad_df_pair(ops, xs):
                # fused form for HOST consumers: J as the full (hi, lo)
                # pair next to the gradient, from ONE solve. The host
                # Wolfe's fused phi compares float(J) — handing it the
                # f32 scalar would round every trial to ~ulp(J) ~ 4e-9
                # absolute, the exact resolution objective_f64 exists
                # to avoid. Gradient definition is IDENTICAL to
                # _obj_and_grad_df (grad of hi + lo).
                if _obj_adj_aux is not None:
                    f = _obj_adj_aux   # DF-adjoint reverse sweep
                else:
                    def f(ops_, xs_):
                        Jdf = self._dfe._objective_df(ops_, list(xs_))
                        return (Jdf.hi + Jdf.lo,
                                jnp.stack([Jdf.hi, Jdf.lo]))

                (_, pair), raw = jax.value_and_grad(
                    f, argnums=1, has_aux=True)(ops, list(xs))
                return pair, [raw[0] / jnp.asarray(wdiv)[None]]

            self._gradient_df = jax.jit(_grad_df)
            self._obj_and_grad_df = jax.jit(_obj_and_grad_df)
            self._obj_and_grad_df_pair = jax.jit(_obj_and_grad_df_pair)
            self._objective_df_pair = jax.jit(self._dfe.objective_pair)

    # ------------------------------------------------------------------
    # operator assembly (init-time, f64 numpy)
    # ------------------------------------------------------------------

    def _build_operators(self, adjoint: bool = False, dt: float = None,
                         build_mixnorm: bool = True):
        """Content-keyed disk cache around `_build_operators_uncached`:
        the f64 tau assembly + inversions cost ~10 s at the reference
        resolution and ~8 min per stack at 512x256 on one CPU core —
        per process. Same policy as the persistent XLA compile cache
        (CLAUDE.md rule 8); disable with SMO_OP_CACHE=0."""
        from spheremanopt_tpu.utils.opcache import cached_arrays

        cfg = self.cfg
        key = dict(problem="mixing", nx=cfg.nx, nz=cfg.nz, lx=cfg.lx,
                   reynolds=cfg.reynolds, richardson=cfg.richardson,
                   prandtl=cfg.prandtl,
                   dt=float(cfg.dt if dt is None else dt),
                   adjoint=bool(adjoint), build_mixnorm=bool(build_mixnorm),
                   # builder-source digest: editing the assembly code
                   # auto-invalidates cached stacks (ADVICE r3); pinned
                   # at import so runtime monkeypatching cannot skew keys
                   code=_OP_BUILDER_DIGEST)
        S, MN = cached_arrays(
            key,
            lambda: self._build_operators_uncached(adjoint, dt,
                                                   build_mixnorm),
            ("S", "MN"))
        return S, MN

    def _build_operators_uncached(self, adjoint: bool = False,
                                  dt: float = None,
                                  build_mixnorm: bool = True):
        cfg = self.cfg
        nz = cfg.nz
        I = np.eye(nz)
        D1 = self._Dz_np
        D2 = D1 @ D1
        # U = 1 - z^2 = T0/2 - T2/2 ; U' = -2z = -2 T1  (exact Chebyshev)
        U_c = np.zeros(nz); U_c[0] = 0.5; U_c[2] = -0.5
        Up_c = np.zeros(nz); Up_c[1] = -2.0
        MU = _cheb_mult_T(U_c, nz)
        MUp = _cheb_mult_T(Up_c, nz)
        b = self.zbasis
        row_left = b.boundary_row("left", 0)
        row_right = b.boundary_row("right", 0)
        row_dz_left = b.boundary_row("left", 1)
        row_dz_right = b.boundary_row("right", 1)
        # integral row: int_-1^1 T_n dz
        nn = np.arange(nz)
        q = np.zeros(nz)
        q[nn % 2 == 0] = 2.0 / (1.0 - nn[nn % 2 == 0].astype(float) ** 2)

        re_inv = 1.0 / cfg.reynolds
        pe_inv = 1.0 / (cfg.reynolds * cfg.prandtl)
        ri = cfg.richardson
        a0 = 1.0 / (cfg.dt if dt is None else dt)

        def solve_block(kx, mixnorm=False):
            ikx = 1j * kx
            if mixnorm:
                # lap psi (+Fpsi at kx=0) = rho; psi_z(+-1)=0; integ gauge
                nvar = 1
                extra = 1 if kx == 0.0 else 0
                A = np.zeros((nz + extra, nz + extra), complex)
                lap = D2 - kx * kx * I
                A[: nz - 2, :nz] = lap[: nz - 2]
                if extra:
                    A[: nz - 2, nz] = np.eye(nz)[: nz - 2, 0]  # +Fpsi (T0 col)
                A[nz - 2, :nz] = row_dz_left
                if kx == 0.0:
                    A[nz - 1, :nz] = q          # integ(psi) = 0
                    A[nz, :nz] = row_dz_right   # extra eq row for Fpsi dof
                else:
                    A[nz - 1, :nz] = row_dz_right
                # rhs rho injects into equation rows 0..nz-3
                E = np.zeros((nz + extra, nz), complex)
                E[: nz - 2, : nz - 2] = np.eye(nz - 2)
                X = None
                if kx != 0.0:
                    X = _block_solve(A, E, np.arange(nz) % 2 == 0,
                                     [(nz - 2, nz - 1)])
                if X is None:
                    X = np.linalg.solve(A, E)
                return X[:nz]  # psi coefficients

            # variables [u, w, rho, p] (+Fb at kx=0)
            nv = 4 * nz + (1 if kx == 0.0 else 0)
            A = np.zeros((nv, nv), complex)
            sl = {v: slice(i * nz, (i + 1) * nz) for i, v in enumerate("uwrp")}

            lap_re = re_inv * (D2 - kx * kx * I)
            lap_pe = pe_inv * (D2 - kx * kx * I)
            adv = ikx * MU

            r = 0
            # For the continuous-adjoint operator (ref :1220-1228) the
            # base-flow advection flips sign, the pressure gradient flips
            # sign, and the couplings transpose: u_adj*Uz moves to the
            # w-equation and Ri*w_adj moves to the density equation.
            adv_s = -adv if adjoint else adv
            psign = -1.0 if adjoint else 1.0
            # momentum-u rows (nz-2) + BCs u(+-1)=0
            A[r : r + nz - 2, sl["u"]] = (a0 * I - lap_re + adv_s)[: nz - 2]
            if not adjoint:
                A[r : r + nz - 2, sl["w"]] = MUp[: nz - 2]
            A[r : r + nz - 2, sl["p"]] = (psign * ikx * I)[: nz - 2]
            r += nz - 2
            # momentum-w rows. At kx = 0 keep nz-1 rows (one tau): w is
            # killed by continuity + w(-1)=0, and p needs nz-1 equation
            # rows plus the gauge (the reference's first-order form
            # reaches the same count via its wz reduction + BC layout).
            nw = nz - 2 if kx != 0.0 else nz - 1
            A[r : r + nw, sl["w"]] = (a0 * I - lap_re + adv_s)[:nw]
            if adjoint:
                A[r : r + nw, sl["u"]] = MUp[:nw]       # + u_adj * Uz
            else:
                A[r : r + nw, sl["r"]] = (ri * I)[:nw]  # + rho * Ri
            A[r : r + nw, sl["p"]] = (psign * D1)[:nw]
            r += nw
            # density rows (nz-2)
            A[r : r + nz - 2, sl["r"]] = (a0 * I - lap_pe + adv_s)[: nz - 2]
            if adjoint:
                A[r : r + nz - 2, sl["w"]] = (ri * I)[: nz - 2]  # + Ri w_adj
            if kx == 0.0:
                A[r : r + nz - 2, 4 * nz] = np.eye(nz)[: nz - 2, 0]  # +Fb
            r += nz - 2
            # continuity rows. At kx = 0 the last row (coefficient nz-1 of
            # dz w) is identically zero, so drop it and pin w(+1) = 0
            # explicitly (the reference's first-order form spreads its
            # taus differently; same solution space).
            ncont = nz if kx != 0.0 else nz - 1
            A[r : r + ncont, sl["u"]] = (ikx * I)[:ncont]
            A[r : r + ncont, sl["w"]] = D1[:ncont]
            r += ncont
            # boundary/gauge rows
            A[r, sl["u"]] = row_left;  r += 1
            A[r, sl["u"]] = row_right; r += 1
            A[r, sl["w"]] = row_left;  r += 1
            if kx == 0.0:
                A[r, sl["p"]] = q          # integ(p) = 0 gauge (no w(+1))
            else:
                A[r, sl["w"]] = row_right
            r += 1
            A[r, sl["r"]] = row_dz_left;  r += 1
            A[r, sl["r"]] = row_dz_right; r += 1
            if kx == 0.0:
                A[r, sl["r"]] = q          # integ(rho) = 0 (Fb's equation)
                r += 1
            assert r == nv, (r, nv)

            # rhs (u, w, rho) inject into their tau-truncated equation rows
            E = np.zeros((nv, 3 * nz), complex)
            E[: nz - 2, : nz - 2] = np.eye(nz - 2)                      # rhs_u
            E[nz - 2 : nz - 2 + nw, nz : nz + nw] = np.eye(nw)          # rhs_w
            off = nz - 2 + nw
            E[off : off + nz - 2, 2 * nz : 2 * nz + nz - 2] = np.eye(nz - 2)
            X = None
            if kx != 0.0:
                # parity split (u_e, w_o, rho_o, p_e | complements) —
                # the family-A layout of `_parity_perm`; BC rows pair up
                # at (4nz-6 .. 4nz-1): u(L/R), w(L/R), rho dz(L/R)
                ev = np.arange(nz) % 2 == 0
                col_a = np.concatenate([ev, ~ev, ~ev, ev])
                b0 = 4 * nz - 6
                X = _block_solve(A, E, col_a,
                                 [(b0, b0 + 1), (b0 + 2, b0 + 3),
                                  (b0 + 4, b0 + 5)])
            if X is None:
                X = np.linalg.solve(A, E)
            return X[: 3 * nz]  # (u, w, rho) out

        S = np.stack([solve_block(kx) for kx in self._kx])
        S[~self._xmask.astype(bool)] = 0.0
        if not build_mixnorm:
            # prep-dt and continuous-adjoint builds only consume S; skip
            # the kxn dense inversions of the mix-norm Poisson stack
            return S, None
        MN = np.stack([solve_block(kx, mixnorm=True) for kx in self._kx])
        MN[~self._xmask.astype(bool)] = 0.0
        return S, MN

    # ------------------------------------------------------------------
    # transforms: grid (.., mgx, mgz) <-> coeff (.., kxn, nz)
    # ------------------------------------------------------------------

    def to_coeff(self, g: jnp.ndarray) -> jnp.ndarray:
        c = jnp.einsum("kj,...jz->...kz", self._Fx, g.astype(self._cdtype))
        c = jnp.einsum("nz,...kz->...kn", self._Az.astype(self._rdtype), c)
        # cast: the f64 numpy mask would promote f32-config arrays under
        # an x64-enabled process, destabilising downstream scan carries
        return (c * jnp.asarray(self._xmask[:, None])).astype(self._cdtype)

    def to_grid(self, c: jnp.ndarray) -> jnp.ndarray:
        g = jnp.einsum("zn,...kn->...kz", self._Vz, c)
        g = jnp.einsum("jk,...kz->...jz", self._Bx, g)
        return g.real.astype(self._rdtype)

    # ------------------------------------------------------------------
    # dynamics
    # ------------------------------------------------------------------

    def _nonlinear(self, u_c, w_c, r_c):
        """-(u.grad)(u, w, rho) on the 3/2 grid, truncated back."""
        ikx = jnp.asarray(1j * self._kx)[:, None]
        dz = jnp.asarray(self._Dz)

        def dx(c):
            return ikx * c

        def ddz(c):
            return jnp.einsum("mn,...kn->...km", dz, c)

        ug = self.to_grid(u_c)
        wg = self.to_grid(w_c)
        out = []
        for c in (u_c, w_c, r_c):
            adv = ug * self.to_grid(dx(c)) + wg * self.to_grid(ddz(c))
            out.append(-self.to_coeff(adv))
        return out

    def _step(self, ops, u_c, w_c, r_c):
        """rhs = state/dt + NL; batched per-kx tau solve via one matmul."""
        nlu, nlw, nlr = self._nonlinear(u_c, w_c, r_c)
        a0 = 1.0 / self.cfg.dt
        rhs = jnp.concatenate(
            [a0 * u_c + nlu, a0 * w_c + nlw, a0 * r_c + nlr], axis=-1
        )  # (kxn, 3nz)
        sol = self._solve(ops["S"], rhs)
        nz = self.cfg.nz
        return sol[:, :nz], sol[:, nz : 2 * nz], sol[:, 2 * nz :]

    def _ke(self, u_c, w_c):
        """(1/V) int (u^2 + w^2): rectangle-rule IP on the grid, matching
        the reference's Inner_Prod_Discrete (`:282-299`)."""
        ug, wg = self.to_grid(u_c), self.to_grid(w_c)
        w = jnp.asarray(self._w)
        return jnp.sum(w * (ug * ug + wg * wg))

    def _mixnorm(self, ops, r_c):
        psi = self._solve(ops["MN"], r_c)
        ikx = jnp.asarray(1j * self._kx)[:, None]
        psix = ikx * psi
        psiz = jnp.einsum("mn,kn->km", jnp.asarray(self._Dz), psi)
        gx, gz = self.to_grid(psix), self.to_grid(psiz)
        w = jnp.asarray(self._w)
        return 0.5 * jnp.sum(w * (gx * gx + gz * gz))

    def _objective_impl(self, ops, x_list) -> jnp.ndarray:
        cfg = self.cfg
        x = x_list[0].astype(self._rdtype)
        u_c = self.to_coeff(x[0])
        w_c = self.to_coeff(x[1])
        r_c = jnp.asarray(self._rho0_c, self._cdtype)

        step = self._step
        if cfg.remat:
            step = jax.checkpoint(step, static_argnums=())

        def body(carry, _):
            u, w, r, acc = carry
            if cfg.s == 0:
                acc = kahan_add(acc, self._ke(u, w))
            u, w, r = step(ops, u, w, r)
            return (u, w, r, acc), None

        acc0 = kahan_zero(self._rdtype)
        (u_c, w_c, r_c, acc), _ = jax.lax.scan(
            body, (u_c, w_c, r_c, acc0), xs=None, length=cfg.n_iters
        )
        if cfg.s == 0:
            acc = kahan_add(acc, self._ke(u_c, w_c))
            return -0.5 * cfg.dt * acc[0]   # maximise time-avg KE (ref :1137)
        return self._mixnorm(ops, r_c)       # minimise mix-norm (ref :1117)

    def _bc_residual(self, u, w, r):
        """Wall/BC residual monitor of one coefficient state — (2, 3):
        rows (z=-1, z=+1), cols (dz rho, u, w). The reference logs dz(b)
        wall residuals along the FWD solve
        (`FWD_Solve_Poiseuille.py:726-727,747`); the tau solve enforces
        the BCs EXACTLY per step, so these sit at solve roundoff and
        pin operator-assembly health. Chebyshev endpoint evaluation
        T_n(+-1) = (+-1)^n; the x-profile of each wall value is
        synthesised with Bx and reduced by max|.|. Shared by the
        forward (fused diagnostics) and continuous-adjoint monitors."""
        pm = jnp.asarray(((-1.0) ** np.arange(self.cfg.nz)))
        dz_c = jnp.asarray(self._Dz)

        def _wall_max(c):
            v_lo = jnp.einsum("kn,n->k", c, pm.astype(c.dtype))
            v_hi = jnp.sum(c, axis=-1)
            out = []
            for v in (v_lo, v_hi):
                g = jnp.einsum("jk,k->j", jnp.asarray(self._Bx), v)
                out.append(jnp.max(jnp.abs(g.real)))
            return jnp.stack(out)

        drho = jnp.einsum("mn,kn->km", dz_c, r)
        return jnp.stack([_wall_max(drho), _wall_max(u),
                          _wall_max(w)], axis=-1)

    def _objective_aux_impl(self, ops, x_list):
        """(J, diagnostics) captured from one forward solve — the KE and
        buoyancy-variance series plus final vorticity/density fields the
        reference's scalar_data/CheckPoints handlers record along the FWD
        solve (`FWD_Solve_Poiseuille.py:939-1026`). The J arithmetic is
        op-identical to `_objective_impl` for both s modes."""
        cfg = self.cfg
        x = x_list[0].astype(self._rdtype)
        u_c = self.to_coeff(x[0])
        w_c = self.to_coeff(x[1])
        r_c = jnp.asarray(self._rho0_c, self._cdtype)
        wq = jnp.asarray(self._w)

        def de(r):
            rg = self.to_grid(r)
            return jnp.sum(wq * rg * rg)

        step = self._step
        if cfg.remat:
            step = jax.checkpoint(step, static_argnums=())

        def body(carry, _):
            u, w, r, acc = carry
            ke = self._ke(u, w)
            if cfg.s == 0:
                acc = kahan_add(acc, ke)
            stats = (ke, de(r), self._bc_residual(u, w, r))
            u, w, r = step(ops, u, w, r)
            return (u, w, r, acc), stats

        acc0 = kahan_zero(self._rdtype)
        (u_c, w_c, r_c, acc), (ke, dev, bc) = jax.lax.scan(
            body, (u_c, w_c, r_c, acc0), xs=None, length=cfg.n_iters
        )
        keN = self._ke(u_c, w_c)
        ikx = jnp.asarray(1j * self._kx)[:, None]
        vort = self.to_grid(
            ikx * w_c - jnp.einsum("mn,kn->km", jnp.asarray(self._Dz), u_c)
        )
        diag = {
            "kinetic_energy": jnp.concatenate([ke, keN[None]]),
            "buoyancy_energy": jnp.concatenate([dev, de(r_c)[None]]),
            "rho_final": self.to_grid(r_c),
            "vorticity_final": vort,
            "bc_residuals": jnp.concatenate(
                [bc, self._bc_residual(u_c, w_c, r_c)[None]]),  # (T+1,2,3)
            "u_final": self.to_grid(u_c),
            "w_final": self.to_grid(w_c),
        }
        if cfg.s == 0:
            acc = kahan_add(acc, keN)
            return -0.5 * cfg.dt * acc[0], diag
        return self._mixnorm(ops, r_c), diag

    # ------------------------------------------------------------------
    # public triple
    # ------------------------------------------------------------------

    def _gradient_continuous_impl(self, ops, x_list, with_bc: bool = False):
        """Continuous adjoint (ref `ADJ_Solve_Cnts`,
        `FWD_Solve_Poiseuille.py:1161-1319`): integrate the adjoint
        Boussinesq system (sign-flipped advection/pressure, transposed
        Uz and Ri couplings) backward along the stored trajectory.
        s=0: volumetric forcing (-uf, -wf); s=1: terminal condition
        b_adj(T) = -psi with lap psi = rho(T). Returns [(u_adj, w_adj)]
        at t=0.

        Accuracy semantics (same as the reference): directional
        derivatives against band-limited perturbations converge to the
        truth at O(dt); as a *vector* it is the Riesz representative
        under the continuous (spectral) inner product restricted to the
        band, which differs off-band from the discrete-mode gradient
        because Chebyshev truncation is not L2-self-adjoint. The
        reference exhibits the same split (it even changes resolution
        and inner product between its Discrete/Continuous modes,
        `:1727-1757`). Use adjoint='discrete' for Taylor-exactness."""
        cfg = self.cfg
        x = x_list[0].astype(self._rdtype)
        u_c, w_c = self.to_coeff(x[0]), self.to_coeff(x[1])
        r_c = jnp.asarray(self._rho0_c, self._cdtype)

        def fwd_body(carry, _):
            new = self._step(ops, *carry)
            return new, new

        (_, _, rT_c), snaps = jax.lax.scan(
            fwd_body, (u_c, w_c, r_c), xs=None, length=cfg.n_iters
        )

        ikx = jnp.asarray(1j * self._kx)[:, None]
        dz = jnp.asarray(self._Dz)

        def ddz(c):
            return jnp.einsum("mn,...kn->...km", dz, c)

        a0 = 1.0 / cfg.dt
        nz = cfg.nz

        def adj_body(carry, snap):
            ua, wa, ba = carry
            uf_c, wf_c, bf_c = snap
            ufg, wfg = self.to_grid(uf_c), self.to_grid(wf_c)
            uag, wag, bag = self.to_grid(ua), self.to_grid(wa), self.to_grid(ba)
            # rhs of the adjoint equations (ref :1220-1228)
            nl_b = ufg * self.to_grid(ikx * ba) + wfg * self.to_grid(ddz(ba))
            nl_u = (-(uag * self.to_grid(ikx * uf_c) + wag * self.to_grid(ikx * wf_c))
                    + ufg * self.to_grid(ikx * ua) + wfg * self.to_grid(ddz(ua))
                    - bag * self.to_grid(ikx * bf_c))
            nl_w = (-(uag * self.to_grid(ddz(uf_c)) + wag * self.to_grid(ddz(wf_c)))
                    + ufg * self.to_grid(ikx * wa) + wfg * self.to_grid(ddz(wa))
                    - bag * self.to_grid(ddz(bf_c)))
            if cfg.s == 0:
                nl_u = nl_u - ufg
                nl_w = nl_w - wfg
            rhs = jnp.concatenate([
                a0 * ua + self.to_coeff(nl_u),
                a0 * wa + self.to_coeff(nl_w),
                a0 * ba + self.to_coeff(nl_b),
            ], axis=-1)
            sol = self._solve(ops["SA"], rhs)
            new = (sol[:, :nz], sol[:, nz: 2 * nz], sol[:, 2 * nz:])
            # adjoint wall monitors (with_bc): the adjoint tau system
            # enforces dz(b_adj)=0 and u_adj=w_adj=0 at z=+-1 exactly,
            # mirroring the forward monitor (ref ADJ system BCs,
            # FWD_Solve_Poiseuille.py:1161-1319)
            stats = self._bc_residual(*new) if with_bc else None
            return new, stats

        ua0 = jnp.zeros_like(u_c)
        wa0 = jnp.zeros_like(w_c)
        if cfg.s == 1:
            psi = self._solve(ops["MN"], rT_c)
            ba0 = -psi
        else:
            ba0 = jnp.zeros_like(r_c)
        (ua, wa, ba), bc = jax.lax.scan(
            adj_body, (ua0, wa0, ba0), snaps, reverse=True
        )
        grads = [jnp.stack([self.to_grid(ua), self.to_grid(wa)])]
        if with_bc:
            # reverse=True stacks ys in FORWARD time order, so bc is
            # the (T, 2, 3) series of the sweep's SOLVE outputs (the
            # last row is the first adjoint solve). The terminal
            # condition itself (ua0=wa0=0, ba0=-psi) is deliberately
            # NOT monitored: it is not a tau-solve output and the
            # mix-norm psi carries its own (Laplacian) BCs, so its wall
            # values are not pinned at adjoint-solve roundoff.
            return grads, bc
        return grads

    def _solve_ops(self):
        """Device operator stacks for the solve paths; loud failure for
        the operator-assembly-only mode (device_ops=False), whose
        construction skips both device placement and the x64 check."""
        if self._ops is None:
            raise RuntimeError(
                "this OptimalMixing was constructed with device_ops="
                "False (operator assembly only, e.g. for the numpy "
                "baselines) — solve paths need device_ops=True")
        return self._ops

    def objective(self, x_list):
        if self._dfe is not None:
            return self._objective_df(self._ops_df, list(x_list))
        return self._objective(self._solve_ops(), list(x_list))

    def objective_f64(self, x_list) -> float:
        """df64 mode only: J reconstructed to double-float resolution on
        the host (the f32 scalar `objective` rounds to ~ulp(J) ~ 4e-9
        absolute, which swamps Taylor-remainder increments)."""
        if self._dfe is None:
            raise RuntimeError("objective_f64 requires "
                               "solve_precision='df64'")
        pair = np.asarray(self._objective_df_pair(self._ops_df,
                                                  list(x_list)),
                          np.float64)
        return float(pair[0] + pair[1])

    def gradient(self, x_list):
        if self._dfe is not None:
            return self._gradient_df(self._ops_df, list(x_list))
        if self.cfg.adjoint == "continuous":
            return self._grad_cnts(self._solve_ops(), list(x_list))
        return self._gradient(self._solve_ops(), list(x_list))

    def objective_and_gradient(self, x_list):
        """Fused (J, gradient); under adjoint='continuous' there is no
        fused form (the continuous adjoint is its own backward PDE
        integration, ref `ADJ_Solve_Cnts` `FWD_Solve_Poiseuille.py:
        1161-1319`, not the VJP of the discrete forward), so the mode's
        gradient is paired with a separate forward — f_and_g consumers
        (Wolfe fused phi, the device loop) must not mix the two gradient
        definitions (or their paired inner products) in one search."""
        if self._dfe is not None:
            # host consumers (the Wolfe fused phi compares float(J) per
            # trial): reconstruct J at pair resolution — the f32 scalar
            # would silently bypass objective_f64's purpose. The
            # device-loop keeps the f32-scalar form via
            # objective_and_gradient_aux (its search state is f32).
            pair, g = self._obj_and_grad_df_pair(self._ops_df,
                                                 list(x_list))
            pair = np.asarray(pair, np.float64)
            return float(pair[0]) + float(pair[1]), g
        if self.cfg.adjoint == "continuous":
            return (self._objective(self._solve_ops(), list(x_list)),
                    self._grad_cnts(self._solve_ops(), list(x_list)))
        return self._obj_and_grad(self._solve_ops(), list(x_list))

    # ------------------------------------------------------------------
    # fused diagnostics: same-solve capture for zero-extra-cost archiving
    # ------------------------------------------------------------------

    @property
    def has_fused_diagnostics(self) -> bool:
        return True

    def _diag_host(self, diag: dict) -> dict:
        out = dict(diag)
        out["sim_time"] = self.cfg.dt * np.arange(self.cfg.n_iters + 1)
        out["x_grid"] = np.arange(self.mgx) * self.cfg.lx / self.mgx
        out["z_grid"] = self._zgrid
        return out

    def objective_and_diagnostics(self, x_list):
        """(J, diagnostics dict) from ONE forward solve (vs `diagnostics`,
        which re-runs it). Used by `io.timeseries.FusedArchiver`."""
        J, diag = self._obj_and_diag(self._solve_ops(), list(x_list))
        return J, self._diag_host(diag)

    def objective_gradient_and_diagnostics(self, x_list):
        """(J, grads, diagnostics) from one fused fwd+bwd solve (or, under
        adjoint='continuous', the mode's own gradient next to the
        diagnostics-carrying forward — see `objective_and_gradient`)."""
        if self.cfg.adjoint == "continuous":
            J, diag = self.objective_and_diagnostics(x_list)
            return J, self._grad_cnts(self._solve_ops(), list(x_list)), diag
        J, g, diag = self._obj_grad_and_diag(self._solve_ops(), list(x_list))
        return J, g, self._diag_host(diag)

    @property
    def objective_and_gradient_aux(self):
        """(callable(ops, xs), ops): the fused objective+gradient with
        the operator stacks as explicit jit operands. Outer-jit drivers
        (optim/jit_driver) must use this form — tracing the bound
        `objective_and_gradient` inside another jit would embed the
        per-kx solve stacks (hundreds of MB) as program constants, which
        the axon compile tunnel rejects (HTTP 413; measured on the
        mixing device-loop run). Dispatches on cfg.adjoint like
        `objective_and_gradient` (continuous mode pairs the forward with
        its own adjoint-PDE integration; both parts trace under jit)."""
        if self._dfe is not None:
            return self._obj_and_grad_df, self._ops_df
        if self.cfg.adjoint == "continuous":
            def fg_cnts(ops, xs):
                return (self._objective_impl(ops, list(xs)),
                        self._gradient_continuous_impl(ops, list(xs)))

            return fg_cnts, self._solve_ops()
        return self._obj_and_grad, self._solve_ops()

    def inner_product(self, x, y):
        return self._inner(x, y)

    @property
    def inner_products(self):
        return self.inner_product

    # ------------------------------------------------------------------
    # PDE-state restart (ref `IVP_FWD.load_state`, FWD_Solve_SH23.py:459-460)
    # ------------------------------------------------------------------

    def initial_state(self, x_list) -> dict:
        """Boussinesq solver state at t=0: (u, w, rho) coefficient
        fields as stacked re/im planes."""
        if not hasattr(self, "_initial_state_fn"):
            @jax.jit
            def make(x):
                x = x.astype(self._rdtype)
                u = self.to_coeff(x[0])
                w = self.to_coeff(x[1])
                r = jnp.asarray(self._rho0_c, self._cdtype)
                return {"u": jnp.stack([u.real, u.imag]),
                        "w": jnp.stack([w.real, w.imag]),
                        "r": jnp.stack([r.real, r.imag])}

            self._initial_state_fn = make
        return self._initial_state_fn(jnp.asarray(x_list[0]))

    def advance_state(self, state: dict, n_steps: int) -> dict:
        if not hasattr(self, "_advance"):
            def step(s, ops):
                u, w, r = self._step(ops,
                                     s["u"][0] + 1j * s["u"][1],
                                     s["w"][0] + 1j * s["w"][1],
                                     s["r"][0] + 1j * s["r"][1])
                return {"u": jnp.stack([u.real, u.imag]),
                        "w": jnp.stack([w.real, w.imag]),
                        "r": jnp.stack([r.real, r.imag])}

            from spheremanopt_tpu.problems.base import SegmentAdvance
            self._advance = SegmentAdvance(step)
        return self._advance(state, n_steps, self._solve_ops())

    def state_fields(self, state) -> dict:
        if not hasattr(self, "_state_fields_fn"):
            @jax.jit
            def grids(s):
                return (self.to_grid(s["u"][0] + 1j * s["u"][1]),
                        self.to_grid(s["w"][0] + 1j * s["w"][1]),
                        self.to_grid(s["r"][0] + 1j * s["r"][1]))

            self._state_fields_fn = grids
        ug, wg, rg = self._state_fields_fn(state)
        return {"u": ug, "w": wg, "rho": rg}

    def final_fields(self, x_list):
        """(u, w, rho) numpy complex coefficient state at t = T, for
        analysis. The jitted solve returns stacked re/im planes —
        complex device->host transfers are UNIMPLEMENTED on the axon
        TPU (platform rule 3) — recombined to complex on the host."""
        x = jnp.asarray(x_list[0], self._rdtype)
        if not hasattr(self, "_final_fields_fn"):
            @jax.jit
            def run(ops, x):
                u_c, w_c = self.to_coeff(x[0]), self.to_coeff(x[1])
                r_c = jnp.asarray(self._rho0_c, self._cdtype)

                def body(carry, _):
                    return self._step(ops, *carry), None

                u_c, w_c, r_c = jax.lax.scan(
                    body, (u_c, w_c, r_c), xs=None,
                    length=self.cfg.n_iters)[0]
                return tuple(jnp.stack([c.real, c.imag])
                             for c in (u_c, w_c, r_c))

            self._final_fields_fn = run
        return tuple(np.asarray(p[0]) + 1j * np.asarray(p[1])
                     for p in self._final_fields_fn(self._solve_ops(), x))

    def diagnostics(self, x_list) -> dict:
        """KE + buoyancy-variance series, final vorticity and density
        fields (the reference's scalar_data/CheckPoints payloads,
        `FWD_Solve_Poiseuille.py:939-1026`). Delegates to the fused
        `objective_and_diagnostics` solve (J discarded) — ONE scan body
        produces both the archiver payloads and this dict, so they
        cannot drift."""
        return self.objective_and_diagnostics(list(x_list))[1]

    def adjoint_bc_residuals(self, x_list) -> np.ndarray:
        """(T, 2, 3) wall residual series of the CONTINUOUS-ADJOINT
        sweep — rows (z=-1, z=+1), cols (dz b_adj, u_adj, w_adj), in
        forward time order. The adjoint tau system enforces the adjoint
        BCs exactly, so the series pins the transposed operator
        assembly at solve roundoff (the forward-side monitor is
        `diagnostics()['bc_residuals']`; ref
        FWD_Solve_Poiseuille.py:1161-1319). Needs adjoint='continuous'
        operators (ops['SA']) in the stack."""
        if self.cfg.adjoint != "continuous":
            raise ValueError(
                "adjoint_bc_residuals needs adjoint='continuous' (the "
                "discrete mode has no adjoint PDE solve to monitor; "
                "its reverse sweep is jax.grad)")
        _, bc = self._adj_bc(self._solve_ops(), list(x_list))
        return np.asarray(bc)

    # ------------------------------------------------------------------
    # initial conditions (ref Generate_IC :301-385: filtered-noise
    # streamfunction, u = -psi_z, w = psi_x, prep smoothing, normalise)
    # ------------------------------------------------------------------

    def _prep_solve_ops(self):
        """Lazily build + cache the Sim_Type="Linear" prep solve operator
        stack (the same tau systems at the prep dt; ref
        `FWD_Solve_Build_Lin` with Sim_Type="Linear",
        `FWD_Solve_Poiseuille.py:480-484,549`)."""
        if not hasattr(self, "_prep_ops_cache"):
            self._solve_ops()   # assembly-only mode must fail loudly
            S_prep, _ = self._build_operators(dt=self.cfg.prep_dt,
                                              build_mixnorm=False)
            self._prep_ops_cache = self._put_op(S_prep)
        return self._prep_ops_cache

    def generate_ic(self, seed: int = 42) -> List[jnp.ndarray]:
        """Reference-exact IC pipeline (`Generate_IC` :301-385 +
        `FWD_Solve_IVP_Prep` :520-608): filtered-noise streamfunction ->
        u = -psi_z, w = psi_x -> LINEAR prep solve (Sim_Type="Linear",
        prep_steps x prep_dt, with rho(0) = -erf(z/delta)/2 coupled in)
        -> 2/3-rule dealias mask -> normalise onto the e0 sphere."""
        cfg = self.cfg
        nz = cfg.nz

        # 2/3-rule DA mask applied to the prep output (ref :593-606)
        nx0, nz0 = 2 * cfg.nx // 3, 2 * nz // 3
        da_x = (np.arange(self.kxn) < nx0 // 2).astype(float)
        da_z = (np.arange(nz) < nz0).astype(float)
        da = da_x[:, None] * da_z[None, :]

        @jax.jit
        def make(prep_ops, key):
            noise = jax.random.normal(key, (self.mgx, self.mgz), self._rdtype)
            psi = self.to_coeff(noise)
            # low-pass both axes at half band (ref filter_field frac=0.5)
            mx = (np.arange(self.kxn) <= 0.25 * cfg.nx).astype(float)
            mz = (np.arange(nz) < 0.5 * nz).astype(float)
            psi = psi * jnp.asarray(mx[:, None] * mz[None, :])
            ikx = jnp.asarray(1j * self._kx)[:, None]
            u_c = -jnp.einsum("mn,kn->km", jnp.asarray(self._Dz), psi)
            w_c = ikx * psi
            r_c = jnp.asarray(self._rho0_c, self._cdtype)

            # LINEAR prep: rhs = state/dt_prep only (no nonlinear term;
            # the implicit operator carries every linear coupling)
            a0 = 1.0 / cfg.prep_dt

            def body(carry, _):
                u, w, r = carry
                rhs = jnp.concatenate([a0 * u, a0 * w, a0 * r], axis=-1)
                # pin the carry dtype: under an x64-enabled process the
                # f64 numpy constants above promote f32-config arrays,
                # and a drifting carry dtype fails lax.scan
                sol = self._solve(prep_ops, rhs).astype(self._cdtype)
                return (sol[:, :nz], sol[:, nz:2 * nz], sol[:, 2 * nz:]), None

            (u_c, w_c, r_c), _ = jax.lax.scan(
                body,
                (u_c.astype(self._cdtype), w_c.astype(self._cdtype),
                 r_c.astype(self._cdtype)),
                xs=None, length=cfg.prep_steps,
            )
            u_c = u_c * jnp.asarray(da)
            w_c = w_c * jnp.asarray(da)
            x = jnp.stack([self.to_grid(u_c), self.to_grid(w_c)])
            norm = jnp.sum(jnp.asarray(self._w)[None] * x * x)
            return x * jnp.sqrt(cfg.e0 / norm)

        return [make(self._prep_solve_ops(), jax.random.PRNGKey(seed))]


# Import-pinned digest of the operator-assembly sources: cached stacks
# auto-invalidate when any of these change (utils/opcache.source_digest);
# pinned here (not at call time) so runtime monkeypatching of the
# builder cannot skew cache keys.
from spheremanopt_tpu.utils.opcache import source_digest as _source_digest  # noqa: E402

_OP_BUILDER_DIGEST = _source_digest(
    OptimalMixing._build_operators_uncached, _cheb_mult_T, _block_solve,
    ChebyshevBasis1D)
