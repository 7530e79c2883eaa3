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
