"""Error-compensated bf16 application of complex constant operators.

The TPU MXU natively multiplies bf16; an f32 matmul is emulated by
multiple bf16 passes (jax `precision=`: "default" 1 pass, "high" 3,
"highest" 6). The compensated scheme here is the hand-rolled 3-pass
split — operator planes stored as bf16 hi/lo pairs (hi = bf16(A),
lo = A - hi), traced operand split in-graph — generalised from the
mixing solve (`problems/optimal_mixing._solve_apply_compensated`,
where it measured J rel-err 5.4e-5 vs 5.6e-2 single-pass over 1000
steps, within 3x of the f32 floor at half the 6-pass cost).

Two measured traps (BASELINE.md round 2) are baked in:
  * the operand split must use `lax.reduce_precision` — a plain
    f32->bf16->f32 convert pair is elided by XLA's excess-precision
    simplifier, silently dropping the correction term;
  * the hi and lo dot sums must be separated by
    `lax.optimization_barrier`, or XLA re-folds them into one bf16 dot.

Versus the native `precision="high"` 3-pass mode: the pass structure is
identical (Ah.yh + Ah.yl + Al.yh), but "high" applies per dot-general
while this form splits by hand. MEASURED OUTCOME (KDyn 24^3 x 2000,
r3, BASELINE.md): native "high" dominates for autodiff'd paths —
118 ms @ ~1e-4 on J AND gradients vs 175 ms here with gradients at
3e-3, because the VJP of the hand-split form does not hi/lo-split the
incoming COTANGENT, so every reverse dot runs single-pass bf16 while
"high" transposes to another 3-pass dot. Use the hand-rolled split only
where the reverse sweep is also hand-written (the mixing solve's
measured win) or no gradient flows through it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def split_complex_matrix(M: np.ndarray):
    """Numpy complex operator -> (rhi, rlo, ihi, ilo) f32 planes.

    f32 (not bf16) storage: the mixing measurements showed bf16-dtype
    stored planes run 1.5x SLOWER (XLA's mixed-dtype dot path loses the
    good schedule) with identical accuracy — the MXU casts per pass
    either way.
    """
    out = []
    for plane in (np.asarray(M).real, np.asarray(M).imag):
        p32 = np.asarray(plane, np.float32)
        hi = p32.astype(jnp.bfloat16).astype(np.float32)
        out += [hi, p32 - hi]
    return tuple(out)


def comp_einsum_pair(spec: str, quad, y: jnp.ndarray):
    """(A_real @ y, A_imag @ y) with each real dot compensated to 3 bf16
    passes. `spec` is the einsum spec applying one REAL operator plane
    (first operand) to the real array `y` (any trailing re/im channel is
    the caller's bookkeeping, rolled into `spec`)."""
    rhi, rlo, ihi, ilo = (jnp.asarray(q) for q in quad)
    yh = jax.lax.reduce_precision(y, exponent_bits=8, mantissa_bits=7)
    yl = y - yh

    def ein(A, v):
        return jnp.einsum(spec, A, v)

    p1 = ein(rhi, yh) + jax.lax.optimization_barrier(ein(rhi, yl) + ein(rlo, yh))
    p2 = ein(ihi, yh) + jax.lax.optimization_barrier(ein(ihi, yl) + ein(ilo, yh))
    return p1, p2


def comp_einsum_pair_2dot(spec: str, quad, y: jnp.ndarray):
    """2-dot variant: p = Ah.yh + Al.yh — the full-width OPERATOR
    applied to a bf16-rounded rhs (drops the Ah.yl rhs-correction of the
    3-dot `comp_einsum_pair`).

    MEASURED DEAD END (mixing reference config, r3): J rel-err 6.4e-2 @
    194 ms — the per-step rhs rounding random walk is the DOMINANT term
    of the plain-bf16 error budget (bf16 measures 5.7e-2 @ 107 ms), so
    dropping its correction forfeits nearly all of "compensated"'s
    accuracy (1.45e-4 @ 221 ms) while saving only 12% of its time; the
    operator hi/lo split alone buys nothing once the rhs is rounded.
    Dominated by plain "bfloat16" on both axes — kept as the tested
    negative result mapping the pass-count/accuracy frontier.

    The optimization_barrier is load-bearing exactly as in the 3-dot
    form: without it XLA folds Ah.yh + Al.yh into (Ah+Al).yh — one
    single-pass bf16 dot of the reconstructed f32 operator — and the
    mode silently degrades to plain bf16."""
    rhi, rlo, ihi, ilo = (jnp.asarray(q) for q in quad)
    yh = jax.lax.reduce_precision(y, exponent_bits=8, mantissa_bits=7)

    def ein(A, v):
        return jnp.einsum(spec, A, v)

    p1 = ein(rhi, yh) + jax.lax.optimization_barrier(ein(rlo, yh))
    p2 = ein(ihi, yh) + jax.lax.optimization_barrier(ein(ilo, yh))
    return p1, p2


def comp_einsum_one(spec: str, hi, lo, y: jnp.ndarray) -> jnp.ndarray:
    """One real operator plane applied compensated (3 bf16 passes)."""
    yh = jax.lax.reduce_precision(y, exponent_bits=8, mantissa_bits=7)
    yl = y - yh

    def ein(A, v):
        return jnp.einsum(spec, jnp.asarray(A), v)

    return ein(hi, yh) + jax.lax.optimization_barrier(
        ein(hi, yl) + ein(lo, yh))


def repack(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Combine (A_r @ y, A_i @ y) of a CHANNEL-PACKED complex operand
    y = stack([yr, yi], -1) into the packed complex product channel:
    (A y)_r = p1[..., 0] - p2[..., 1], (A y)_i = p1[..., 1] + p2[..., 0].
    """
    return jnp.stack([p1[..., 0] - p2[..., 1], p1[..., 1] + p2[..., 0]],
                     axis=-1)
