"""VMEM-resident fused kinematic-dynamo integrator (Pallas/Mosaic).

The WHOLE CNAB1 induction solve — per-axis DFT synthesis, u x B cross
product on the oversampled grid, analysis, curl, Leray projection,
diagonal implicit update, final energy — runs inside ONE kernel with
every operand (state, stirring field, transform matrices, mode-space
factors) pinned in VMEM for all n_steps. The XLA scan pays per-dot HBM
round-trips for the ~20 intermediate tensors of every step; here the
steady-state HBM traffic is zero (forward) or the trajectory spill the
reverse sweep consumes.

All arithmetic is REAL f32 (Mosaic has no complex): coefficient fields
carry stacked (re, im) planes and the complex transform matrices are
applied via their real/imag parts. Mirrors
`problems/kinematic_dynamo.py::_cnab1_step` exactly (reference spec:
`FWD_Solve_KDyn.py:431-440`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def make_consts(p):
    """Numpy constant pack from a KinematicDynamo problem (matmul-path
    matrices and mode-space factors, all f32)."""
    f32 = np.float32
    mean_mask = np.ones(p._k2.shape, f32)
    mean_mask[0, 0, 0] = 0.0
    return dict(
        Ffr=np.real(p._Ff).astype(f32), Ffi=np.imag(p._Ff).astype(f32),
        Fzr=np.real(p._Fz).astype(f32), Fzi=np.imag(p._Fz).astype(f32),
        Bfr=np.real(p._Bf).astype(f32), Bfi=np.imag(p._Bf).astype(f32),
        Bzr=np.real(p._Bz).astype(f32), Bzi=np.imag(p._Bz).astype(f32),
        k=np.asarray(p._k, f32),
        inv_k2=np.asarray(p._inv_k2, f32),
        lhs_inv=np.asarray(p._lhs_inv, f32),
        rhs_fac=np.asarray(p._rhs_fac, f32),
        keep=np.asarray(p._keep, f32),
        pw=np.asarray(p._pw, f32),
        mean_mask=mean_mask,
    )


def _to_grid(br, bi, C, prec):
    """(3,n,n,kz) re/im planes -> (3,mg,mg,mg) real grid (x,y synthesis
    complex, z synthesis keeps only the real output)."""
    def syn_axis(ar, ai, eq, Mr, Mi):
        r = (jnp.einsum(eq, Mr, ar, precision=prec)
             - jnp.einsum(eq, Mi, ai, precision=prec))
        i = (jnp.einsum(eq, Mr, ai, precision=prec)
             + jnp.einsum(eq, Mi, ar, precision=prec))
        return r, i

    gr, gi = syn_axis(br, bi, "aX,cXYZ->caYZ", C["Bfr"], C["Bfi"])
    gr, gi = syn_axis(gr, gi, "bY,caYZ->cabZ", C["Bfr"], C["Bfi"])
    return (jnp.einsum("kZ,cabZ->cabk", C["Bzr"], gr, precision=prec)
            - jnp.einsum("kZ,cabZ->cabk", C["Bzi"], gi, precision=prec))


def _to_coeff(g, C, prec):
    """(3,mg,mg,mg) real grid -> (3,n,n,kz) re/im planes, band-masked."""
    cr = jnp.einsum("Zk,cabk->cabZ", C["Fzr"], g, precision=prec)
    ci = jnp.einsum("Zk,cabk->cabZ", C["Fzi"], g, precision=prec)

    def ana_axis(ar, ai, eq, Mr, Mi):
        r = (jnp.einsum(eq, Mr, ar, precision=prec)
             - jnp.einsum(eq, Mi, ai, precision=prec))
        i = (jnp.einsum(eq, Mr, ai, precision=prec)
             + jnp.einsum(eq, Mi, ar, precision=prec))
        return r, i

    cr, ci = ana_axis(cr, ci, "Yb,cabZ->caYZ", C["Ffr"], C["Ffi"])
    cr, ci = ana_axis(cr, ci, "Xa,caYZ->cXYZ", C["Ffr"], C["Ffi"])
    return cr * C["keep"], ci * C["keep"]


def _cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def step_planes(br, bi, u, C, prec=_HI):
    """One CNAB1 step on re/im planes: mirrors `_cnab1_step`."""
    k = C["k"]
    bg = _to_grid(br, bi, C, prec)
    e = _cross(u, bg)
    er, ei = _to_coeff(e, C, prec)
    # F = i k x e_c: multiply by i maps (re, im) -> (-im, re)
    fr = -_cross(k, ei)
    fi = _cross(k, er)
    rr = C["rhs_fac"] * br + fr
    ri = C["rhs_fac"] * bi + fi
    # Leray projection (k real: acts identically on both planes)
    divr = jnp.sum(k * rr, axis=0)
    divi = jnp.sum(k * ri, axis=0)
    rr = (rr - k * (divr * C["inv_k2"])[None]) * C["lhs_inv"]
    ri = (ri - k * (divi * C["inv_k2"])[None]) * C["lhs_inv"]
    return rr * C["mean_mask"], ri * C["mean_mask"]


def energy_planes(br, bi, C):
    return jnp.sum(C["pw"] * (br * br + bi * bi))


# ---------------------------------------------------------------------------
# Hand-derived transposed sweep. The induction equation is LINEAR in B,
# so the B-cotangent recursion is the exact transpose of the step
# operator and needs NO stored trajectory; only dJ/dU (bilinear u x B
# term) consumes the stored per-step states.
# ---------------------------------------------------------------------------


def _to_grid_T(gbar, C, prec):
    """Transpose of _to_grid as a real-linear map: grid cotangent ->
    coefficient-plane cotangents. Complex-matrix stages transpose to
    M^H-applications; the real-output z stage splits into (Bzr^T, -Bzi^T)."""
    gr_bar = jnp.einsum("kZ,cabk->cabZ", C["Bzr"], gbar, precision=prec)
    gi_bar = -jnp.einsum("kZ,cabk->cabZ", C["Bzi"], gbar, precision=prec)

    def synT(ar, ai, eq, Mr, Mi):
        r = (jnp.einsum(eq, Mr, ar, precision=prec)
             + jnp.einsum(eq, Mi, ai, precision=prec))
        i = (jnp.einsum(eq, Mr, ai, precision=prec)
             - jnp.einsum(eq, Mi, ar, precision=prec))
        return r, i

    gr_bar, gi_bar = synT(gr_bar, gi_bar, "bY,cabZ->caYZ", C["Bfr"], C["Bfi"])
    gr_bar, gi_bar = synT(gr_bar, gi_bar, "aX,caYZ->cXYZ", C["Bfr"], C["Bfi"])
    return gr_bar, gi_bar


def _to_coeff_T(cr_bar, ci_bar, C, prec):
    """Transpose of _to_coeff: coefficient-plane cotangents -> grid
    cotangent (real)."""
    cr_bar = cr_bar * C["keep"]
    ci_bar = ci_bar * C["keep"]

    def anaT(ar, ai, eq, Mr, Mi):
        r = (jnp.einsum(eq, Mr, ar, precision=prec)
             + jnp.einsum(eq, Mi, ai, precision=prec))
        i = (jnp.einsum(eq, Mr, ai, precision=prec)
             - jnp.einsum(eq, Mi, ar, precision=prec))
        return r, i

    cr_bar, ci_bar = anaT(cr_bar, ci_bar, "Xa,cXYZ->caYZ",
                          C["Ffr"], C["Ffi"])
    cr_bar, ci_bar = anaT(cr_bar, ci_bar, "Yb,caYZ->cabZ",
                          C["Ffr"], C["Ffi"])
    return (jnp.einsum("Zk,cabZ->cabk", C["Fzr"], cr_bar, precision=prec)
            + jnp.einsum("Zk,cabZ->cabk", C["Fzi"], ci_bar, precision=prec))


def _leray_scale(x, C):
    """mean_mask -> lhs_inv -> symmetric k-projector (the transpose of
    the forward's projector-then-scale tail)."""
    t = C["lhs_inv"] * (C["mean_mask"] * x)
    div = jnp.sum(C["k"] * t, axis=0)
    return t - C["k"] * (div * C["inv_k2"])[None]


def step_planes_T(cr, ci, u, C, prec=_HI):
    """Transpose of step_planes w.r.t. (br, bi): cotangent recursion
    lam_n = S^T lam_{n+1}. Also returns the grid-space e_bar pair needed
    for the dJ/dU accumulation (u_bar += bg_n x e_bar_n) and the
    to-grid-transposed contribution."""
    tr = _leray_scale(cr, C)
    ti = _leray_scale(ci, C)
    # rhs = rhs_fac*b + F: direct term
    br_bar = C["rhs_fac"] * tr
    bi_bar = C["rhs_fac"] * ti
    # F = (-k x ei, k x er): er_bar = -k x fi_bar, ei_bar = k x fr_bar
    er_bar = -_cross(C["k"], ti)
    ei_bar = _cross(C["k"], tr)
    # to_coeff^T -> grid cotangent of e
    e_bar = _to_coeff_T(er_bar, ei_bar, C, prec)
    # e = u x bg: bg_bar = e_bar x u
    bg_bar = _cross(e_bar, u)
    # to_grid^T -> coefficient cotangents
    gr_bar, gi_bar = _to_grid_T(bg_bar, C, prec)
    return br_bar + gr_bar, bi_bar + gi_bar, e_bar


def _fwd_traj_kernel(br0_ref, bi0_ref, u_ref, *refs, n_steps: int, prec,
                     const_names):
    """Forward with per-step trajectory spill to HBM (for the reverse
    sweep's dJ/dU term)."""
    n_c = len(const_names)
    C = {name: ref[:] for name, ref in zip(const_names, refs[:n_c])}
    brT_ref, biT_ref, j_ref, trr_ref, tri_ref, scr_r, scr_i, sem = refs[n_c:]
    u = u_ref[:]

    def body(i, carry):
        br, bi = carry
        scr_r[:] = br
        scr_i[:] = bi
        cp1 = pltpu.make_async_copy(scr_r, trr_ref.at[i], sem.at[0])
        cp2 = pltpu.make_async_copy(scr_i, tri_ref.at[i], sem.at[1])
        cp1.start()
        cp2.start()
        out = step_planes(br, bi, u, C, prec)
        cp1.wait()
        cp2.wait()
        return out

    br, bi = jax.lax.fori_loop(0, n_steps, body, (br0_ref[:], bi0_ref[:]))
    brT_ref[:] = br
    biT_ref[:] = bi
    j_ref[0, 0] = energy_planes(br, bi, C)


def _bwd_kernel(u_ref, brT_ref, biT_ref, gbar_ref, *refs, n_steps: int,
                prec, const_names):
    """Reverse sweep: lam_T = 2*gbar*pw*B_T, lam_n = S^T lam_{n+1};
    u_bar += bg_n x e_bar_n with b_n streamed back from the trajectory."""
    n_c = len(const_names)
    C = {name: ref[:] for name, ref in zip(const_names, refs[:n_c])}
    (trr_ref, tri_ref, b0r_bar_ref, b0i_bar_ref, ubar_ref,
     scr_r, scr_i, sem) = refs[n_c:]
    u = u_ref[:]
    gbar = gbar_ref[0, 0]

    lam_r0 = 2.0 * gbar * C["pw"] * brT_ref[:]
    lam_i0 = 2.0 * gbar * C["pw"] * biT_ref[:]
    ubar0 = jnp.zeros_like(u)

    def body(kk, carry):
        lam_r, lam_i, ubar = carry
        i = n_steps - 1 - kk
        cp1 = pltpu.make_async_copy(trr_ref.at[i], scr_r, sem.at[0])
        cp2 = pltpu.make_async_copy(tri_ref.at[i], scr_i, sem.at[1])
        cp1.start()
        cp2.start()
        lam_r, lam_i, e_bar = step_planes_T(lam_r, lam_i, u, C, prec)
        cp1.wait()
        cp2.wait()
        bg_n = _to_grid(scr_r[:], scr_i[:], C, prec)
        ubar = ubar + _cross(bg_n, e_bar)
        return lam_r, lam_i, ubar

    lam_r, lam_i, ubar = jax.lax.fori_loop(
        0, n_steps, body, (lam_r0, lam_i0, ubar0))
    b0r_bar_ref[:] = lam_r
    b0i_bar_ref[:] = lam_i
    ubar_ref[:] = ubar


def _cparams():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _run_fwd_traj(br0, bi0, u, consts, n_steps, interpret, precision):
    names = sorted(consts)
    shp = br0.shape
    kern = partial(_fwd_traj_kernel, n_steps=n_steps, prec=precision,
                   const_names=names)
    brT, biT, J, trr, tri = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_steps,) + shp, jnp.float32),
            jax.ShapeDtypeStruct((n_steps,) + shp, jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(names)),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),
            pltpu.VMEM(shp, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_cparams(),
        interpret=interpret,
    )(br0, bi0, u, *[jnp.asarray(consts[n]) for n in names])
    return brT, biT, J[0, 0], trr, tri


def _run_bwd(u, brT, biT, gbar, trr, tri, consts, n_steps, interpret,
             precision):
    names = sorted(consts)
    shp = brT.shape
    kern = partial(_bwd_kernel, n_steps=n_steps, prec=precision,
                   const_names=names)
    b0r_bar, b0i_bar, ubar = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(u.shape, jnp.float32),
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(names)
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),
            pltpu.VMEM(shp, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_cparams(),
        interpret=interpret,
    )(u, brT, biT, jnp.reshape(gbar.astype(jnp.float32), (1, 1)),
      *[jnp.asarray(consts[n]) for n in names], trr, tri)
    return b0r_bar, b0i_bar, ubar


def make_fused_energy(consts, n_steps: int, interpret: bool,
                      precision=_HI):
    """Build a custom-vjp callable J(br0, bi0, u) = <B_T, B_T> with the
    forward AND reverse sweeps as VMEM-resident Pallas kernels.
    Differentiable in (br0, bi0, u); validated per the repo custom-vjp
    rules (interpret parity vs jax.grad of the XLA path, FD cotangent
    checks, real-TPU compile check — tests/test_pallas_kdyn.py)."""

    @jax.custom_vjp
    def fused_energy(br0, bi0, u):
        _, _, J = run_forward(br0, bi0, u, consts, n_steps, interpret,
                              precision)
        return J

    def vjp_fwd(br0, bi0, u):
        brT, biT, J, trr, tri = _run_fwd_traj(
            br0, bi0, u, consts, n_steps, interpret, precision)
        return J, (u, brT, biT, trr, tri)

    def vjp_bwd(res, gbar):
        u, brT, biT, trr, tri = res
        b0r_bar, b0i_bar, ubar = _run_bwd(
            u, brT, biT, gbar, trr, tri, consts, n_steps, interpret,
            precision)
        return b0r_bar, b0i_bar, ubar

    fused_energy.defvjp(vjp_fwd, vjp_bwd)
    return fused_energy


def _fwd_kernel(br0_ref, bi0_ref, u_ref, *refs, n_steps: int, prec,
                const_names):
    n_c = len(const_names)
    C = {name: ref[:] for name, ref in zip(const_names, refs[:n_c])}
    brT_ref, biT_ref, j_ref = refs[n_c:]
    u = u_ref[:]

    def body(_, carry):
        br, bi = carry
        return step_planes(br, bi, u, C, prec)

    br, bi = jax.lax.fori_loop(0, n_steps, body, (br0_ref[:], bi0_ref[:]))
    brT_ref[:] = br
    biT_ref[:] = bi
    j_ref[0, 0] = energy_planes(br, bi, C)


def run_forward(br0, bi0, u, consts, n_steps: int, interpret: bool,
                precision=_HI):
    """Fused forward solve: returns (brT, biT, J=<B_T,B_T>)."""
    names = sorted(consts)
    shp = br0.shape
    kern = partial(_fwd_kernel, n_steps=n_steps, prec=precision,
                   const_names=names)
    brT, biT, J = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(names)),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # the step's live set (padded grid + coeff temporaries) needs
            # ~18 MB of scoped VMEM; the default limit is 16 MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(br0, bi0, u, *[jnp.asarray(consts[n]) for n in names])
    return brT, biT, J[0, 0]
