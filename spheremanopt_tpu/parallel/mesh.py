"""Device-mesh utilities: the TPU counterpart of the reference's
`MPI.COMM_WORLD` domain decomposition (SURVEY.md section 2, 'Distributed
communication backend').

The reference shards fields over MPI ranks inside Dedalus and then
*undoes* it by allgathering full vectors on every rank
(`Field_to_Vec`, `FWD_Solve_KDyn.py:91-137`). Here state stays sharded
end-to-end: fields carry NamedShardings over an ICI mesh axis and the
inner products reduce with psum-backed jnp.sum under GSPMD."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        # fail loudly: devs[:n] would silently build a SMALLER mesh and
        # run a different decomposition than the one configured (or die
        # later in an opaque all_to_all divisibility error)
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} device(s) "
            f"are visible (platform={devs[0].platform}); set n_shards to "
            "a value <= the visible device count, or force virtual CPU "
            "devices via --xla_force_host_platform_device_count")
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def make_mesh2d(px: int, py: int, axes=("x", "y")) -> Mesh:
    """2-D process mesh for pencil decompositions
    (`parallel.fft.distributed_rfftn_2d`)."""
    devs = jax.devices()
    n = px * py
    if n > len(devs):
        raise ValueError(
            f"requested a {px}x{py} mesh but only {len(devs)} device(s) "
            "are visible")
    return Mesh(np.asarray(devs[:n]).reshape(px, py), axis_names=tuple(axes))


def field_sharding(mesh: Mesh, ndim: int, sharded_dim: int,
                   axis: str = "x") -> NamedSharding:
    """Shard one spatial dimension of an ndim field (pencil/slab layout)."""
    spec = [None] * ndim
    spec[sharded_dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_fields(mesh: Mesh, xs: Sequence, sharded_dim: int, axis: str = "x"):
    """device_put a list of field arrays with one spatial dim sharded."""
    return [
        jax.device_put(x, field_sharding(mesh, np.ndim(x), sharded_dim, axis))
        for x in xs
    ]
