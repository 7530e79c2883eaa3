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


# compensated accumulation: the SINGLE shared implementation (pure jnp,
# valid inside Pallas kernels) — same ops, so the cached Mosaic programs'
# HLO is unchanged
from spheremanopt_tpu.solvers.scan_utils import kahan_add as _kahan  # noqa: E402


def _fwd_traj_kernel(br0_ref, bi0_ref, u_ref, *refs, n_steps: int, prec,
                     const_names, integrated: bool, dt: float):
    """Forward with per-step trajectory spill to HBM (for the reverse
    sweep's dJ/dU term), one grid step per timestep: the pipeline
    machinery streams each (1,)+shp trajectory block out (manual
    `make_async_copy` of a 13-lane slice hits Mosaic's 128-lane DMA
    alignment requirement — measured on hardware; grid blocks don't).
    State persists in VMEM scratch across the sequential grid.
    integrated: J = dt*(sum_i E(b_i) + E(b_T)), Kahan-compensated in
    SMEM, mirroring the XLA path's kahan_add scan."""
    n_c = len(const_names)
    C = {name: ref[:] for name, ref in zip(const_names, refs[:n_c])}
    brT_ref, biT_ref, j_ref, trr_ref, tri_ref, st_r, st_i, acc = refs[n_c:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        st_r[:] = br0_ref[:]
        st_i[:] = bi0_ref[:]
        if integrated:
            acc[0] = 0.0
            acc[1] = 0.0

    br = st_r[:]
    bi = st_i[:]
    trr_ref[0] = br
    tri_ref[0] = bi
    if integrated:
        s, c = _kahan((acc[0], acc[1]), energy_planes(br, bi, C))
        acc[0] = s
        acc[1] = c
    nr, ni = step_planes(br, bi, u_ref[:], C, prec)
    st_r[:] = nr
    st_i[:] = ni

    @pl.when(i == n_steps - 1)
    def _final():
        brT_ref[:] = nr
        biT_ref[:] = ni
        eT = energy_planes(nr, ni, C)
        if integrated:
            j_ref[0, 0] = dt * _kahan((acc[0], acc[1]), eT)[0]
        else:
            j_ref[0, 0] = eT


def _bwd_kernel(u_ref, brT_ref, biT_ref, gbar_ref, *refs, n_steps: int,
                prec, const_names, integrated: bool, dt: float):
    """Reverse sweep, one grid step per timestep with the trajectory
    blocks prefetched in reverse via the index map: lam_T = 2*gbar*w*B_T,
    lam_n = S^T lam_{n+1} [+ 2*gbar*dt*pw*B_n when integrated: each
    stored state also enters the cost]; u_bar += bg_n x e_bar_n."""
    n_c = len(const_names)
    C = {name: ref[:] for name, ref in zip(const_names, refs[:n_c])}
    (trr_ref, tri_ref, b0r_bar_ref, b0i_bar_ref, ubar_ref,
     lam_r_s, lam_i_s, ub_s) = refs[n_c:]
    gbar = gbar_ref[0, 0]
    kk = pl.program_id(0)

    @pl.when(kk == 0)
    def _init():
        wT = (2.0 * dt) if integrated else 2.0
        lam_r_s[:] = wT * gbar * C["pw"] * brT_ref[:]
        lam_i_s[:] = wT * gbar * C["pw"] * biT_ref[:]
        ub_s[:] = jnp.zeros_like(u_ref[:])

    lam_r, lam_i, e_bar = step_planes_T(lam_r_s[:], lam_i_s[:], u_ref[:],
                                        C, prec)
    sr = trr_ref[0]  # b_i, i = n_steps-1-kk (reverse index map)
    si = tri_ref[0]
    if integrated:
        lam_r = lam_r + (2.0 * dt) * gbar * C["pw"] * sr
        lam_i = lam_i + (2.0 * dt) * gbar * C["pw"] * si
    lam_r_s[:] = lam_r
    lam_i_s[:] = lam_i
    bg_n = _to_grid(sr, si, C, prec)
    ub_s[:] = ub_s[:] + _cross(bg_n, e_bar)

    @pl.when(kk == n_steps - 1)
    def _final():
        b0r_bar_ref[:] = lam_r_s[:]
        b0i_bar_ref[:] = lam_i_s[:]
        ubar_ref[:] = ub_s[:]


def _cparams():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _whole(shape, space=pltpu.VMEM):
    """BlockSpec: the whole array as one block, resident across the
    sequential step grid (fetched/flushed once)."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=space)


def _run_fwd_traj(br0, bi0, u, consts, n_steps, interpret, precision,
                  integrated=False, dt=0.0):
    names = sorted(consts)
    shp = br0.shape
    kern = partial(_fwd_traj_kernel, n_steps=n_steps, prec=precision,
                   const_names=names, integrated=integrated, dt=dt)
    traj_spec = pl.BlockSpec((1,) + shp, lambda i: (i,) + (0,) * len(shp),
                             memory_space=pltpu.VMEM)
    brT, biT, J, trr, tri = pl.pallas_call(
        kern,
        grid=(n_steps,),
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_steps,) + shp, jnp.float32),
            jax.ShapeDtypeStruct((n_steps,) + shp, jnp.float32),
        ),
        in_specs=[_whole(br0.shape), _whole(bi0.shape), _whole(u.shape)]
        + [_whole(np.shape(consts[n])) for n in names],
        out_specs=(
            _whole(shp),
            _whole(shp),
            _whole((1, 1), pltpu.SMEM),
            traj_spec,
            traj_spec,
        ),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),
            pltpu.VMEM(shp, jnp.float32),
            pltpu.SMEM((2,), jnp.float32),
        ],
        compiler_params=_cparams(),
        interpret=interpret,
    )(br0, bi0, u, *[jnp.asarray(consts[n]) for n in names])
    return brT, biT, J[0, 0], trr, tri


def _run_bwd(u, brT, biT, gbar, trr, tri, consts, n_steps, interpret,
             precision, integrated=False, dt=0.0):
    names = sorted(consts)
    shp = brT.shape
    kern = partial(_bwd_kernel, n_steps=n_steps, prec=precision,
                   const_names=names, integrated=integrated, dt=dt)
    # stream the stored trajectory backwards: block kk holds b_{n-1-kk}
    traj_spec = pl.BlockSpec(
        (1,) + shp, lambda kk: (n_steps - 1 - kk,) + (0,) * len(shp),
        memory_space=pltpu.VMEM)
    b0r_bar, b0i_bar, ubar = pl.pallas_call(
        kern,
        grid=(n_steps,),
        out_shape=(
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(shp, jnp.float32),
            jax.ShapeDtypeStruct(u.shape, jnp.float32),
        ),
        in_specs=[_whole(u.shape), _whole(shp), _whole(shp),
                  _whole((1, 1), pltpu.SMEM)]
        + [_whole(np.shape(consts[n])) for n in names]
        + [traj_spec, traj_spec],
        out_specs=(
            _whole(shp),
            _whole(shp),
            _whole(u.shape),
        ),
        scratch_shapes=[
            pltpu.VMEM(shp, jnp.float32),
            pltpu.VMEM(shp, jnp.float32),
            pltpu.VMEM(u.shape, jnp.float32),
        ],
        compiler_params=_cparams(),
        interpret=interpret,
    )(u, brT, biT, jnp.reshape(gbar.astype(jnp.float32), (1, 1)),
      *[jnp.asarray(consts[n]) for n in names], trr, tri)
    return b0r_bar, b0i_bar, ubar


def make_fused_energy(consts, n_steps: int, interpret: bool,
                      precision=_HI, integrated: bool = False,
                      dt: float = 0.0):
    """Build a custom-vjp callable J(br0, bi0, u) with the forward AND
    reverse sweeps as VMEM-resident Pallas kernels. J = <B_T, B_T>
    ("Final") or dt*(sum_i E(B_i) + E(B_T)) ("Integrated",
    Kahan-compensated, ref `FWD_Solve_KDyn.py:655-673`).
    Differentiable in (br0, bi0, u); validated per the repo custom-vjp
    rules (interpret parity vs jax.grad of the XLA path, FD cotangent
    checks, real-TPU compile check — tests/test_pallas_kdyn.py)."""
    if integrated and dt <= 0.0:
        raise ValueError("integrated=True requires dt > 0 (J would be "
                         "identically zero otherwise)")

    @jax.custom_vjp
    def fused_energy(br0, bi0, u):
        _, _, J = run_forward(br0, bi0, u, consts, n_steps, interpret,
                              precision, integrated, dt)
        return J

    def vjp_fwd(br0, bi0, u):
        brT, biT, J, trr, tri = _run_fwd_traj(
            br0, bi0, u, consts, n_steps, interpret, precision,
            integrated, dt)
        return J, (u, brT, biT, trr, tri)

    def vjp_bwd(res, gbar):
        u, brT, biT, trr, tri = res
        b0r_bar, b0i_bar, ubar = _run_bwd(
            u, brT, biT, gbar, trr, tri, consts, n_steps, interpret,
            precision, integrated, dt)
        return b0r_bar, b0i_bar, ubar

    fused_energy.defvjp(vjp_fwd, vjp_bwd)
    return fused_energy


def _fwd_kernel(br0_ref, bi0_ref, u_ref, *refs, n_steps: int, prec,
                const_names, integrated: bool, dt: float):
    n_c = len(const_names)
    C = {name: ref[:] for name, ref in zip(const_names, refs[:n_c])}
    brT_ref, biT_ref, j_ref = refs[n_c:]
    u = u_ref[:]

    def body(_, carry):
        br, bi, acc = carry
        if integrated:
            acc = _kahan(acc, energy_planes(br, bi, C))
        return step_planes(br, bi, u, C, prec) + (acc,)

    zero = jnp.zeros((), jnp.float32)
    br, bi, acc = jax.lax.fori_loop(
        0, n_steps, body, (br0_ref[:], bi0_ref[:], (zero, zero)))
    brT_ref[:] = br
    biT_ref[:] = bi
    eT = energy_planes(br, bi, C)
    j_ref[0, 0] = dt * _kahan(acc, eT)[0] if integrated else eT


def run_forward(br0, bi0, u, consts, n_steps: int, interpret: bool,
                precision=_HI, integrated: bool = False, dt: float = 0.0):
    """Fused forward solve: returns (brT, biT, J)."""
    names = sorted(consts)
    shp = br0.shape
    kern = partial(_fwd_kernel, n_steps=n_steps, prec=precision,
                   const_names=names, integrated=integrated, dt=dt)
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
