"""Double-float (two-float) arithmetic + Ozaki-split exact matmuls.

f64-EMULATION ON A CHIP WITH NO f64. The v5e rejects f64 kernels
(CLAUDE.md platform rule 2), but the mixing problem's measured f32
gradient floor (8.5e-2 rel-err at the reference config, BASELINE.md
"mixing 512x256 optimisation workload attempt") is trajectory rounding
amplified through a chaotic 1000-step reverse sweep — no f32 pass-count
mode fixes it. This module provides ~2^-48 arithmetic from f32 pairs:

  * DF pairs (hi, lo) with the classical error-free transforms:
    Knuth two_sum, Dekker/Veltkamp two_prod (the 12-bit operand split
    uses `lax.reduce_precision`, NOT an f32->bf16->f32 convert pair —
    XLA's excess-precision simplifier elides convert pairs, a measured
    trap recorded in ops/compensated.py).
  * Ozaki-style EXACT split matmuls: a constant f64 operator is split
    (init-time, exact f64 numpy) into b-bit power-of-2-aligned slices;
    the df operand is sliced in-graph on a common per-vector frame; each
    slice-pair product then runs as ONE bf16 MXU pass whose f32
    accumulation is EXACT (products are integer multiples of a common
    ulp and the sum stays under 2^24 ulps: b chosen so 2b + ceil(log2 K)
    <= 24), and the ~q(q+1)/2 exact partials are combined in df. This is
    the Ozaki/Ogita/Oishi/Rump error-free dot decomposition mapped onto
    the MXU's bf16xbf16->f32 datapath.

Gradient semantics: every df op is built from +,-,* whose compensation
terms cancel SYMBOLICALLY (two_sum's err expands to a+b-s with s=a+b),
so jax.grad of a df forward is the true adjoint of the ideal real
computation, evaluated in f32 — forward-trajectory error drops to
~2^-48 while reverse-sweep arithmetic stays at f32 (the measured model
in BASELINE.md: grad error ~ eps_fwd*e^{2*lam*T} + eps_rev*e^{lam*T},
so fixing the forward removes the dominant term). The Ozaki matmuls
carry a custom_vjp whose backward is a 2-pass compensated transposed
apply — WITHOUT it, autodiff would transpose each bf16-exact slice
einsum at default precision, rounding the (full-width) COTANGENT to
bf16 and making gradients WORSE than plain f32.

No reference analogue: `mannixp/SphereManOpt` runs f64 MPI CPU
(Dedalus); this is the TPU-native answer to the same accuracy need.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class DF(NamedTuple):
    """Double-float value: represents hi + lo with |lo| <= ulp(hi)/2.

    A NamedTuple, so it is a pytree — DF fields ride through scan
    carries, jit arguments, and grad positions unchanged.
    """

    hi: jnp.ndarray
    lo: jnp.ndarray


# ---------------------------------------------------------------------
# error-free transforms (f32 ops; exact by IEEE-754 round-to-nearest)
# ---------------------------------------------------------------------


def two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly, branch-free."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Dekker FastTwoSum; requires |a| >= |b| (callers guarantee it)."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split12(a):
    """Veltkamp split via reduce_precision: a == hi + lo with hi
    carrying a's top 12 significand bits and lo the remaining <=12
    (both halves' pairwise products are then exact in f32).

    The stop_gradient framing keeps the split differentiable with the
    exact identity d(hi)/da + d(lo)/da = 1 regardless of how (or
    whether) reduce_precision defines a JVP: the rounding offset is a
    constant under differentiation."""
    off = lax.stop_gradient(
        lax.reduce_precision(a, exponent_bits=8, mantissa_bits=11) - a)
    hi = a + off
    return hi, a - hi


def two_prod(a, b):
    """Dekker TwoProd: p + err == a * b exactly (barring underflow)."""
    p = a * b
    ah, al = _split12(a)
    bh, bl = _split12(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# ---------------------------------------------------------------------
# df arithmetic (double-single, accurate variants)
# ---------------------------------------------------------------------


def df_from_f(a) -> DF:
    return DF(a, jnp.zeros_like(a))


def df_from_np(a: np.ndarray, dtype=np.float32):
    """Exact init-time split of an f64 numpy array into f32 (hi, lo)
    NUMPY pairs (callers device_put them as jit operands; embedding
    device arrays in closures re-ships them per call — axon rule 1)."""
    a = np.asarray(a, np.float64)
    hi = a.astype(dtype)
    lo = (a - hi.astype(np.float64)).astype(dtype)
    return hi, lo


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_add(x: DF, y: DF) -> DF:
    """Accurate double-single add (robust under cancellation)."""
    s1, s2 = two_sum(x.hi, y.hi)
    t1, t2 = two_sum(x.lo, y.lo)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return DF(*quick_two_sum(s1, s2))


def df_add_f(x: DF, a) -> DF:
    s1, s2 = two_sum(x.hi, a)
    s2 = s2 + x.lo
    return DF(*quick_two_sum(s1, s2))


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*quick_two_sum(p, e))


def df_mul_f(x: DF, a) -> DF:
    """df times a plain float array treated as EXACT (masks, signs,
    integer factors, f32-exact constants)."""
    p, e = two_prod(x.hi, a)
    e = e + x.lo * a
    return DF(*quick_two_sum(p, e))


def df_sum(x: DF, axis=None) -> DF:
    """Compensated reduction by pairwise df folding (log2(n) df_adds).

    axis=None reduces all axes to a scalar DF; an int axis reduces that
    axis. Static shapes only (pads to even at each fold)."""
    if axis is None:
        flat = DF(x.hi.reshape(-1), x.lo.reshape(-1))
        out = _df_fold(flat, 0)
        return DF(out.hi[0], out.lo[0])
    out = _df_fold(x, axis)
    return DF(jnp.squeeze(out.hi, axis=axis),
              jnp.squeeze(out.lo, axis=axis))


def _df_fold(x: DF, axis: int) -> DF:
    """Pairwise-halving df reduction; returns with `axis` kept at 1."""
    while x.hi.shape[axis] > 1:
        n = x.hi.shape[axis]
        if n % 2:
            pad = [(0, 0)] * x.hi.ndim
            pad[axis] = (0, 1)
            x = DF(jnp.pad(x.hi, pad), jnp.pad(x.lo, pad))
            n += 1
        lo_half = lambda a: lax.slice_in_dim(a, 0, n // 2, axis=axis)
        hi_half = lambda a: lax.slice_in_dim(a, n // 2, n, axis=axis)
        x = df_add(DF(lo_half(x.hi), lo_half(x.lo)),
                   DF(hi_half(x.hi), hi_half(x.lo)))
    return x


def df_dot(w, x, y) -> DF:
    """Compensated weighted inner product sum(w * x * y) of plain f32
    arrays — the line-search/objective reductions the VERDICT r3 item 1
    asks to widen. Exact products (two_prod chain) + pairwise df fold."""
    p1, e1 = two_prod(jnp.asarray(w), jnp.asarray(x))
    prod = df_mul_f(DF(p1, e1), jnp.asarray(y))
    return df_sum(prod)


# ---------------------------------------------------------------------
# Ozaki exact-split constant matmul
# ---------------------------------------------------------------------


def _ceil_log2(n: int) -> int:
    return int(np.ceil(np.log2(max(int(n), 1))))


def ozaki_bits(k: int) -> int:
    """Slice significand bits b: 2b + ceil(log2 K) <= 24 guarantees the
    f32 MXU accumulation of one slice-pair product is EXACT; b <= 8
    keeps every slice bf16-representable (one MXU pass per product)."""
    return min((24 - _ceil_log2(k)) // 2, 8)


def ozaki_split_np(A: np.ndarray, b: int, p: int) -> np.ndarray:
    """Exact f64 split of a constant operator into p slices of b-bit
    significands on power-of-2 frames shared per MATRIX (last two axes
    — so a slice set serves both A and A^T einsums; per-row frames
    would need a second transposed split). Returns (p,) + A.shape f32;
    sum of slices == A to the dropped 2^-(p*b) tail (frame-relative)."""
    A = np.asarray(A, np.float64)
    amax = np.max(np.abs(A), axis=(-2, -1), keepdims=True)
    # frame exponent e with amax < 2^e (frexp: amax = m*2^e, m in [.5,1))
    _, e = np.frexp(amax)
    R = A.copy()
    out = []
    for s in range(p):
        ulp = np.ldexp(1.0, e - (s + 1) * b)
        As = np.trunc(R / ulp) * ulp
        out.append(As.astype(np.float32))
        R -= As
    return np.stack(out)


def _df_slice(yh, yl, b: int, q: int, axis: int):
    """In-graph slicing of a df operand into q b-bit slices on a common
    power-of-2 frame over `axis` (the contraction axis). Each slice is
    round(r/sigma)*sigma — three EXACT f32 ops (sigma is a power of 2),
    immune to algebraic-simplifier folding; jnp.round's zero gradient
    is intended (slice-0 symbolically carries d(sum yt)/dy = 1, the
    rest telescope to zero — see module docstring)."""
    m = jnp.max(jnp.abs(yh), axis=axis, keepdims=True)
    _, e = jnp.frexp(m)  # m < 2^e
    # Clamp the frame so every slice scale stays a NORMAL f32: an
    # all-tiny contraction column (|y| ~ 1e-34 happens in decaying
    # high-k spectral tails) gives e ~ -110 and sig = 2^(e - q*b)
    # UNDERFLOWS to 0 -> rh/sig = inf/NaN poisoning the solve
    # (measured: KDyn df64 Taylor probe NaN'd at step 2). With the
    # clamp, values below 2^(q*b - 127 - b) round to slice 0 exactly —
    # complete-underflow class, orders below every df target — and
    # frames above the clamp (all previously-working paths) are
    # BITWISE unchanged.
    e = jnp.maximum(e, q * b - 126)
    rh, rl = yh, yl
    slices = []
    for t in range(q):
        sig = jnp.ldexp(jnp.ones_like(m), e - (t + 1) * b)
        yt = jnp.round(rh / sig) * sig
        slices.append(yt)
        nh = rh - yt                       # exact: yt carries rh's top bits
        rh, rl = two_sum(nh, rl)           # renormalise; exact sum
    return slices


def _batch_spec(spec: str) -> str:
    """Prefix the operator operand and the output of an einsum spec
    with a fresh batch axis over the slice stack ("kj,jz->kz" ->
    "skj,jz->skz")."""
    assert "s" not in spec, spec
    ab, out = spec.split("->")
    a, b = ab.split(",")
    return f"s{a},{b}->s{out}"


def make_ozaki_contraction(spec: str, k: int, y_axis: int,
                           n_bits: int = 48, b_override: int = None,
                           batched: bool = False):
    """Plain (non-custom_vjp) df-accurate Ozaki contraction builder:
    `apply(slices, yh, yl) -> (hi, lo)`. Used directly by the
    hand-rolled double-float ADJOINT sweeps (mixing_df df-cotangent
    mode), where the transposed applies are evaluated inside a
    custom_vjp backward and are never themselves differentiated.

    `b_override` reuses an existing slice stack's bit width b (the
    slices' geometry is fixed at split time); exactness of the f32
    accumulation is asserted for THIS contraction length k:
    2b + ceil(log2 k) <= 24."""
    b = ozaki_bits(k) if b_override is None else int(b_override)
    if 2 * b + _ceil_log2(k) > 24:
        raise ValueError(
            f"Ozaki exactness violated: b={b}, K={k} "
            f"(2b + ceil(log2 K) = {2 * b + _ceil_log2(k)} > 24) — "
            "split the operator with k_t to bound b over both "
            "contraction directions")
    q = int(np.ceil(n_bits / b))
    p = q
    L = q - 1
    bspec = _batch_spec(spec) if batched else None

    def _op_operand(slices):
        if (slices.dtype == jnp.bfloat16
                and jax.default_backend() != "tpu"):
            return slices.astype(jnp.float32)
        return slices

    def apply(slices, yh, yl):
        y_slices = _df_slice(yh, yl, b, q, y_axis)
        slices = _op_operand(slices)
        sdt = slices.dtype
        levels = [None] * (L + 1)
        if batched:
            for t in range(q):
                smax = L - t + 1
                P = jnp.einsum(bspec, slices[:smax],
                               y_slices[t].astype(sdt),
                               preferred_element_type=jnp.float32)
                for s in range(smax):
                    l = s + t
                    levels[l] = (P[s] if levels[l] is None
                                 else levels[l] + P[s])
        else:
            for s in range(p):
                for t in range(q):
                    l = s + t
                    if l > L:
                        continue
                    P = jnp.einsum(spec, slices[s],
                                   y_slices[t].astype(sdt),
                                   preferred_element_type=jnp.float32)
                    levels[l] = P if levels[l] is None else levels[l] + P
        acc = DF(levels[0], jnp.zeros_like(levels[0]))
        for l in range(1, L + 1):
            acc = df_add(acc, DF(levels[l], jnp.zeros_like(levels[l])))
        return acc.hi, acc.lo

    return apply, b, p


def make_ozaki_apply(spec: str, spec_t: str, k: int, y_axis: int,
                     n_bits: int = 48, s_bwd: int = 4,
                     batched: bool = False, b_override: int = None):
    """Build `apply(slices, y_hi, y_lo) -> (hi, lo)`: a df-accurate
    contraction of a constant operator (pre-split via ozaki_split_np
    with the returned (b, p)) against a df operand.

    spec   — einsum applying ONE slice to ONE y-slice (e.g.
             "kbij,kbjc->kbic" for the batched tau solve).
    spec_t — the transposed contraction for the backward pass (same
             slice tensor, contraction over the other matrix axis).
    k      — contraction length (operator's contracted-axis size).
    y_axis — y's contraction axis (negative index).

    Returns (apply, b, p): p slices of b bits cover n_bits; the
    custom_vjp backward is a compensated 2-pass-per-slice transposed
    apply over s_bwd slices (~f32-quality cotangents — default
    autodiff would round the cotangent to bf16 per slice einsum).
    s_bwd=4 is MEASURED-saturating (BASELINE.md r4 s_bwd study):
    rel_g is identical at s_bwd=6 on-chip at the mixing reference
    config (5.82e-4) and on CPU at 30 steps (2.11e-6), while 3
    costs 4x and 2 collapses to 2.2e-3 — the residual gradient
    error is f32 cotangent-CARRY propagation through the reverse
    sweep, which only a hand-rolled double-float adjoint could
    beat. Do not raise s_bwd expecting accuracy.

    batched=True issues ONE einsum per y-slice over the (truncated)
    operator slice stack — q batched dots instead of q(q+1)/2 scalar
    ones. Every slice-pair product is computed identically (exact f32
    accumulation of one bf16 pass); only the ORDER partials join a
    level sum changes (t-major instead of s-major), a reordering of
    exact-f32-add operands whose rounding sits at 2^-24 relative OF
    THE LEVEL, i.e. ~2^-(24+l*b) overall — far below the df target.
    """
    b = ozaki_bits(k) if b_override is None else int(b_override)
    p = int(np.ceil(n_bits / b))
    # bf16-stored slices feed the dot directly on TPU (native
    # bf16 x bf16 -> f32 MXU path); other backends lack that dot
    # (CPU DotThunk: UNIMPLEMENTED), so make_ozaki_contraction upcasts
    # to f32 there — BITWISE equivalent, since slice values carry <= 8
    # significand bits (products exact in both paths) and both
    # accumulate in f32.
    _fwd_math, _, _ = make_ozaki_contraction(
        spec, k, y_axis, n_bits=n_bits, b_override=b_override,
        batched=batched)

    @jax.custom_vjp
    def apply(slices, yh, yl):
        return _fwd_math(slices, yh, yl)

    def fwd(slices, yh, yl):
        return _fwd_math(slices, yh, yl), (slices,)

    def bwd(res, cot):
        (slices,) = res
        # The value-cotangent is cot[0] ALONE: every df consumer's
        # out.hi symbolically carries the full value (derivative 1 from
        # each input component) while out.lo's derivatives telescope to
        # 0, so downstream vjps deliver the value-cotangent into BOTH
        # hi and lo slots equally (or 0 into lo when only hi is read) —
        # summing the pair would double-count it.
        c = cot[0]
        ch = lax.reduce_precision(c, exponent_bits=8, mantissa_bits=7)
        cl = c - ch
        # backward runs in f32 REGARDLESS of slice storage dtype: with
        # bf16-stored slices, cc.astype(bf16) would round cl (the ~16
        # residual cotangent bits after ch's 8) to 8 bits — degrading
        # every reverse apply. Upcasting the (<= 8 significand bit,
        # hence value-exact) slices keeps the backward BITWISE equal to
        # f32 storage; only the forward takes the native bf16 MXU path.
        slices_op = slices.astype(jnp.float32) \
            if slices.dtype == jnp.bfloat16 else slices
        sdt = slices_op.dtype
        out = None
        if batched:
            bspec_t = _batch_spec(spec_t)
            sl = slices_op[:min(s_bwd, p)]
            for cc in (ch.astype(sdt), cl.astype(sdt)):
                t = jnp.sum(jnp.einsum(bspec_t, sl, cc,
                                       preferred_element_type=jnp.float32),
                            axis=0)
                out = t if out is None else out + t
        else:
            for s in range(min(s_bwd, p)):
                for cc in (ch.astype(sdt), cl.astype(sdt)):
                    t = jnp.einsum(spec_t, slices_op[s], cc,
                                   preferred_element_type=jnp.float32)
                    out = t if out is None else out + t
        # ops-stack cotangent: HARD ZERO by contract. The Ozaki stacks
        # are frozen problem constants (operators are assembled in f64
        # numpy at init and never optimised over); jax.grad w.r.t. ops
        # therefore returns zeros, NOT the true operator sensitivity —
        # pinned by tests/test_doublefloat.py::
        # test_ops_cotangent_is_documented_zero so it can't regress to
        # silent. If operator sensitivities are ever needed, apply the
        # stack outside this custom_vjp.
        return jnp.zeros(slices.shape, slices.dtype), out, out

    apply.defvjp(fwd, bwd)
    return apply, b, p


class OzakiOp:
    """A constant real operator plane, Ozaki-split for df application.

    Holds NUMPY slices (`.slices_np`); callers device_put them and pass
    them back through jit arguments (axon rule 1) into `.apply`.
    """

    def __init__(self, A: np.ndarray, spec: str, spec_t: str,
                 y_axis: int = -2, n_bits: int = 48,
                 slice_dtype=np.float32, batched: bool = False,
                 with_transpose: bool = False):
        # slice_dtype=bfloat16 is exact (slices carry <= 8 significand
        # bits) and halves the stored bytes, but measured at 1.00x speed
        # with bit-identical output on the mixing 256x128 solve
        # (BASELINE.md r4) — the apply is not slice-stream-bound. Keep
        # f32 unless HBM CAPACITY forces the half-size stacks.
        #
        # with_transpose=True additionally builds a PLAIN (non-vjp)
        # df-accurate transposed apply over the SAME slice stack (A and
        # A^T share the per-matrix split frames) — the hand-rolled df
        # adjoint sweep's building block. The slice bit width is then
        # bounded over BOTH contraction lengths so exact f32
        # accumulation holds in both directions (e.g. Bx at 256x128:
        # fwd K=129 allows b=8 but the transposed K=384 needs b=7).
        A = np.asarray(A, np.float64)
        k = A.shape[-1]
        b_ov = None
        if with_transpose:
            b_ov = min(ozaki_bits(k), ozaki_bits(A.shape[-2]))
        self._apply, b, p = make_ozaki_apply(spec, spec_t, k, y_axis,
                                             n_bits=n_bits,
                                             batched=batched,
                                             b_override=b_ov)
        self._apply_T = None
        if with_transpose:
            # in every framework use the transposed contraction axis of
            # the cotangent operand coincides with the forward y_axis
            self._apply_T, _, _ = make_ozaki_contraction(
                spec_t, A.shape[-2], y_axis, n_bits=n_bits,
                b_override=b_ov, batched=batched)
        # the exact f64 split of the big operator stacks is pure-CPU
        # work repeated per engine construction (~30-90 s at the mixing
        # reference configs, and one bench run builds THREE df64
        # engines) — serve it from the on-disk op cache, keyed by the
        # operator bytes + split geometry. Cached as f32 (the split's
        # native dtype); the slice_dtype cast happens outside the cache
        # (bf16 is not npz-serialisable, and the cast is exact for
        # <= 8-significand-bit slices).
        import hashlib

        from spheremanopt_tpu.utils import opcache

        parts = {"kind": "ozaki_split",
                 "a_sha": hashlib.sha256(A.tobytes()).hexdigest()[:24],
                 "shape": tuple(A.shape), "b": int(b), "p": int(p),
                 "src": opcache.source_digest(ozaki_split_np)}
        (raw,) = opcache.cached_arrays(
            parts, lambda: (ozaki_split_np(A, b, p),), ("slices",))
        self.slices_np = raw.astype(slice_dtype)
        self.bits = b

    def apply(self, slices, y: DF) -> DF:
        return DF(*self._apply(slices, y.hi, y.lo))

    def apply_T(self, slices, y: DF) -> DF:
        """df-accurate A^T @ y over the same slice stack (requires
        with_transpose=True at construction)."""
        return DF(*self._apply_T(slices, y.hi, y.lo))


class OzakiComplexOp:
    """Complex constant operator as (re, im) OzakiOp planes acting on
    channel-PACKED df operands y = (..., K, 2) [re, im last axis]:
    one plane einsum covers both channels (the packed two-dot form of
    optimal_mixing._solve_apply, in df)."""

    def __init__(self, A: np.ndarray, spec: str, spec_t: str,
                 y_axis: int = -2, n_bits: int = 48,
                 slice_dtype=np.float32, batched: bool = False,
                 with_transpose: bool = False):
        A = np.asarray(A)
        self.re = OzakiOp(A.real, spec, spec_t, y_axis, n_bits,
                          slice_dtype, batched, with_transpose)
        self.im = OzakiOp(A.imag, spec, spec_t, y_axis, n_bits,
                          slice_dtype, batched, with_transpose)

    @property
    def slices_np(self):
        return (self.re.slices_np, self.im.slices_np)

    def apply_packed(self, slices_pair, y: DF) -> DF:
        p1 = self.re.apply(slices_pair[0], y)
        p2 = self.im.apply(slices_pair[1], y)
        re = df_sub(_ch(p1, 0), _ch(p2, 1))
        im = df_add(_ch(p1, 1), _ch(p2, 0))
        return _pack2(re, im)

    def apply_real_in(self, slices_pair, g: DF) -> DF:
        """Apply to a REAL df operand (no channel axis), producing a
        packed complex result — the analysis leg of to_coeff."""
        re = self.re.apply(slices_pair[0], g)
        im = self.im.apply(slices_pair[1], g)
        return _pack2(re, im)

    def apply_real_out(self, slices_pair, y: DF) -> DF:
        """Re(A @ y) of a packed df operand — the synthesis leg of
        to_grid (imaginary output discarded)."""
        p1 = self.re.apply(slices_pair[0], y)
        p2 = self.im.apply(slices_pair[1], y)
        return df_sub(_ch(p1, 0), _ch(p2, 1))

    # --- real-adjoint (A^H) forms over the SAME slice stacks, for the
    # hand-rolled df cotangent sweeps (with_transpose=True required).
    # Derivations: with q the incoming packed cotangent, the real-linear
    # adjoint of multiply-by-A is multiply-by-conj(A)^T = A^H.

    def applyT_packed(self, slices_pair, q: DF) -> DF:
        """A^H @ q on a packed df cotangent — the adjoint of
        apply_packed: (Are^T qre + Aim^T qim, Are^T qim - Aim^T qre).
        Requires a channel-carrying spec (e.g. "kij,kjc->kic" — the
        S/MN tau-solve layout); for channel-less specs (Fx-style, which
        consumed a real operand) use applyT_to_real."""
        p1 = self.re.apply_T(slices_pair[0], q)
        p2 = self.im.apply_T(slices_pair[1], q)
        re = df_add(_ch(p1, 0), _ch(p2, 1))
        im = df_sub(_ch(p1, 1), _ch(p2, 0))
        return _pack2(re, im)

    def applyT_to_real(self, slices_pair, q: DF) -> DF:
        """Re(A^H @ q) of a packed cotangent — the adjoint of
        apply_real_in (real operand in, packed out). The forward spec
        here carries no channel axis (it consumed a REAL operand), so
        the packed cotangent's channels are applied separately:
        Re(A^H q) = Are^T q_re + Aim^T q_im."""
        t1 = self.re.apply_T(slices_pair[0], _ch(q, 0))
        t2 = self.im.apply_T(slices_pair[1], _ch(q, 1))
        return df_add(t1, t2)

    def applyT_from_real(self, slices_pair, q: DF) -> DF:
        """A^H @ q with a REAL cotangent (no channel axis), packed out —
        the adjoint of apply_real_out. The forward spec carries a
        channel axis, so the real cotangent rides a singleton channel
        through the transposed contraction."""
        qc = df_map(lambda a: a[..., None], q)
        re = self.re.apply_T(slices_pair[0], qc)
        im = df_neg(self.im.apply_T(slices_pair[1], qc))
        return _pack2(df_map(lambda a: a[..., 0], re),
                      df_map(lambda a: a[..., 0], im))


def _ch(x: DF, c: int) -> DF:
    return DF(x.hi[..., c], x.lo[..., c])


def _pack2(a: DF, b: DF) -> DF:
    return DF(jnp.stack([a.hi, b.hi], axis=-1),
              jnp.stack([a.lo, b.lo], axis=-1))


# the packed-channel DF layout is defined HERE (apply_packed and its
# consumers must agree on it) — engines import these rather than
# re-implementing them (drift risk)
df_channel = _ch
df_pack2 = _pack2


def df_const(pair) -> DF:
    """Closure-constant DF from a numpy (hi, lo) pair — small constants
    only (masks, wavenumbers, weights): numpy closures compile to HLO
    constants (axon rule 1 allows this; device arrays would re-ship)."""
    return DF(jnp.asarray(pair[0]), jnp.asarray(pair[1]))


def df_map(fn, x: DF) -> DF:
    """Apply an exact structural op (slice/index/reshape/stack lambda)
    to both components."""
    return DF(fn(x.hi), fn(x.lo))


def df_concat(parts, axis) -> DF:
    """Concatenate DFs along `axis` (exact: pure data movement)."""
    return DF(jnp.concatenate([p.hi for p in parts], axis=axis),
              jnp.concatenate([p.lo for p in parts], axis=axis))


def df_stack(parts) -> DF:
    """Stack DFs along a new leading axis (exact: pure data movement)."""
    return DF(jnp.stack([p.hi for p in parts]),
              jnp.stack([p.lo for p in parts]))


def df_probe() -> bool:
    """Jitted self-check that the compiler preserved the error-free
    transforms (this platform's XLA has a measured history of eliding
    compensation structure — ops/compensated.py). Returns True when
    two_sum/two_prod capture the exact f32 rounding errors."""

    @jax.jit
    def probe():
        a = jnp.float32(1.0)
        b = jnp.float32(3.0) * jnp.float32(2.0 ** -26)
        s, e = two_sum(a, b)
        c = jnp.float32(1.0 + 2.0 ** -12)
        p, pe = two_prod(c, c)
        return jnp.stack([s, e, p, pe])

    s, e, p, pe = (float(v) for v in probe())
    # 1 + 3*2^-26 rounds to 1.0 (0.375 ulp); err must be captured exactly
    ok_sum = s == 1.0 and e == 3.0 * 2.0 ** -26
    # (1+2^-12)^2 = 1 + 2^-11 + 2^-24: p rounds to even, err = 2^-24
    ok_prod = p + pe == (1.0 + 2.0 ** -12) ** 2 and pe != 0.0
    return bool(ok_sum and ok_prod)
