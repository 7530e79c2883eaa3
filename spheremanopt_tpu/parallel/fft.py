"""Distributed 3D real FFT via pencil decomposition over a mesh axis.

The explicit-collective realisation of what Dedalus does with MPI
all-to-all transposes between grid and coefficient layouts (SURVEY.md
section 2: 'sharded-FFT transposes via shard_map+all_to_all'): for a
real field sharded over its first grid axis X,

  1. local rfft over Z, fft over Y        (X/P, Y, Zr)
  2. all_to_all transpose: split Y, gather X   -> (X, Y/P, Zr)
  3. local fft over X

so every FFT is a dense local kernel and the only communication is one
all_to_all per direction, riding ICI. The inverse reverses the pipeline.

This is the scaling path for grids too large for one chip's HBM; at the
reference's 24^3-36^3 scales the GSPMD-sharded matmul transforms in
`problems.kinematic_dynamo` are preferred (no manual layout churn).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def distributed_rfftn(v: jnp.ndarray, mesh: Mesh, axis: str = "x") -> jnp.ndarray:
    """rfftn of a real (..., X, Y, Z) array sharded over X; returns
    coefficients of shape (..., X, Y, Z//2+1) sharded over Y."""
    ndim = v.ndim
    in_spec = P(*([None] * (ndim - 3) + [axis, None, None]))
    out_spec = P(*([None] * (ndim - 3) + [None, axis, None]))

    def local(vl):
        c = jnp.fft.rfft(vl, axis=-1)
        c = jnp.fft.fft(c, axis=-2)
        # (X/P, Y, Zr) -> (X, Y/P, Zr)
        c = lax.all_to_all(c, axis, split_axis=ndim - 2,
                           concat_axis=ndim - 3, tiled=True)
        return jnp.fft.fft(c, axis=-3)

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec, check_vma=False)(v)


def distributed_irfftn(c: jnp.ndarray, mesh: Mesh, n_z: int,
                       axis: str = "x") -> jnp.ndarray:
    """Inverse of distributed_rfftn: coefficients (..., X, Y, Zr) sharded
    over Y -> real grid (..., X, Y, Z) sharded over X."""
    ndim = c.ndim
    in_spec = P(*([None] * (ndim - 3) + [None, axis, None]))
    out_spec = P(*([None] * (ndim - 3) + [axis, None, None]))

    def local(cl):
        d = jnp.fft.ifft(cl, axis=-3)
        # (X, Y/P, Zr) -> (X/P, Y, Zr)
        d = lax.all_to_all(d, axis, split_axis=ndim - 3,
                           concat_axis=ndim - 2, tiled=True)
        d = jnp.fft.ifft(d, axis=-2)
        return jnp.fft.irfft(d, n=n_z, axis=-1)

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec, check_vma=False)(c)


def distributed_rfftn_2d(v: jnp.ndarray, mesh: Mesh,
                         axes=("x", "y")) -> jnp.ndarray:
    """rfftn of a real (..., X, Y, Z) array sharded over a 2-D process
    mesh (X over axes[0], Y over axes[1]) — true PENCIL decomposition,
    one step beyond the reference's slab runs (Dedalus v2 accepts a 2-D
    process mesh the reference never exercises; `-np 4` slabs only,
    `README.md:83,110`). Z is never sharded, so the rfft half-spectrum's
    awkward (M/2+1) extent never has to divide a mesh axis; instead the
    X and Y extents must divide Px*Py.

    Layout pipeline (three per-axis all_to_alls, each within a SMALLER
    process group than the slab transpose's — the standard 2-D pencil
    trade). X is split major-by-Px (initial sharding) then minor-by-Py
    (T1), so reassembly gathers the MINOR split first (T2 over axes[1])
    then the major (T3 over axes[0]) to restore natural X ordering:

        (X/Px, Y/Py, Z)   --rfft Z-->  (X/Px, Y/Py, Zr)
        --T1 over axes[1]: split X, gather Y-->  (X/(PxPy), Y, Zr) fft Y
        --T2 over axes[1]: split Y, gather X-->  (X/Px, Y/Py, Zr)
        --T3 over axes[0]: split Y, gather X-->  (X, Y/(PxPy), Zr) fft X

    Returns coefficients (..., X, Y, Zr) with Y sharded jointly
    (axes[1] major, axes[0] minor — the split order of T2 then T3)."""
    ndim = v.ndim
    ax, ay = axes
    in_spec = P(*([None] * (ndim - 3) + [ax, ay, None]))
    out_spec = P(*([None] * (ndim - 3) + [None, (ay, ax), None]))
    X, Y = v.shape[-3], v.shape[-2]
    px, py = mesh.shape[ax], mesh.shape[ay]
    if X % (px * py) or Y % (px * py):
        raise ValueError(
            f"2-D pencil decomposition needs X ({X}) and Y ({Y}) divisible "
            f"by Px*Py = {px * py} (mesh {dict(mesh.shape)})")

    def local(vl):
        c = jnp.fft.rfft(vl, axis=-1)
        c = lax.all_to_all(c, ay, split_axis=ndim - 3,
                           concat_axis=ndim - 2, tiled=True)
        c = jnp.fft.fft(c, axis=-2)
        c = lax.all_to_all(c, ay, split_axis=ndim - 2,
                           concat_axis=ndim - 3, tiled=True)
        c = lax.all_to_all(c, ax, split_axis=ndim - 2,
                           concat_axis=ndim - 3, tiled=True)
        return jnp.fft.fft(c, axis=-3)

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec, check_vma=False)(v)


def distributed_irfftn_2d(c: jnp.ndarray, mesh: Mesh, n_z: int,
                          axes=("x", "y")) -> jnp.ndarray:
    """Inverse of `distributed_rfftn_2d`: coefficients (..., X, Y, Zr)
    with Y sharded jointly (axes[1] major, axes[0] minor) -> real grid
    (..., X, Y, Z) sharded (X over axes[0], Y over axes[1]). Each
    transpose inverts its forward counterpart in reverse order."""
    ndim = c.ndim
    ax, ay = axes
    in_spec = P(*([None] * (ndim - 3) + [None, (ay, ax), None]))
    out_spec = P(*([None] * (ndim - 3) + [ax, ay, None]))

    def local(cl):
        d = jnp.fft.ifft(cl, axis=-3)
        d = lax.all_to_all(d, ax, split_axis=ndim - 3,
                           concat_axis=ndim - 2, tiled=True)
        d = lax.all_to_all(d, ay, split_axis=ndim - 3,
                           concat_axis=ndim - 2, tiled=True)
        d = jnp.fft.ifft(d, axis=-2)
        d = lax.all_to_all(d, ay, split_axis=ndim - 2,
                           concat_axis=ndim - 3, tiled=True)
        return jnp.fft.irfft(d, n=n_z, axis=-1)

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=out_spec, check_vma=False)(c)


def distributed_mean_product(x: jnp.ndarray, y: jnp.ndarray, mesh: Mesh,
                             axis: str = "x") -> jnp.ndarray:
    """(1/N) sum(x*y) over fields sharded on their first spatial axis —
    the psum-backed volume-average inner product replacing the
    reference's `allreduce(SUM)` (`FWD_Solve_Poiseuille.py:297`)."""
    ndim = x.ndim
    spec = P(*([None] * (ndim - 3) + [axis, None, None]))

    def local(xl, yl):
        return lax.psum(jnp.sum(xl * yl), axis)

    total = shard_map(local, mesh=mesh, in_specs=(spec, spec),
                      out_specs=P(), check_vma=False)(x, y)
    return total / np.prod(x.shape[-3:])
