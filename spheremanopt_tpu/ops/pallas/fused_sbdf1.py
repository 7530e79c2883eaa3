"""Pallas TPU kernel: VMEM-resident fused SBDF1 integration for SH23.

The entire N-step pseudo-spectral integration runs inside ONE kernel:
the circulant step matrix M (folded transforms + implicit solve +
dealiasing, see problems/swift_hohenberg.py) stays pinned in VMEM, each
step is one MXU matmul plus VPU elementwise work, the Euler-rule cost
accumulates on-core, and the state trajectory is written to a VMEM
output buffer for the adjoint. No per-step HBM traffic at all: for
N=256 (mg=512) the matrix is 1 MB and a 1001-step trajectory is 2 MB,
comfortably inside the ~16 MB VMEM budget.

A jax.custom_vjp wires the kernel's trajectory output into a reverse
lax.scan (plain XLA matmuls with M^T), so `jax.grad` through
`fused_forward` reproduces the discrete adjoint exactly.

The state is carried as an (8, mg) tile (sublane-aligned for the VPU;
row 0 holds the data) — see the tiling constraints in the Pallas guide.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(m_ref, u0_ref, dtj_ref, uT_ref, j_ref, traj_ref, *, n_steps: int):
    """traj_ref[i] = u_i (pre-step states u_0..u_{n-1}); uT = u_n;
    J = dt * sum_{i=0..n} mean(u_i^2)."""
    dt = dtj_ref[0, 0]
    inv_dt = 1.0 / dt
    mg = u0_ref.shape[-1]
    m = m_ref[:]

    def body(i, carry):
        u, acc = carry
        traj_ref[i, :] = u[0, :]
        acc = acc + jnp.sum(u[0, :] * u[0, :])
        rhs = u * inv_dt + 1.8 * u * u - u * u * u
        u_new = jax.lax.dot_general(
            rhs, m,
            dimension_numbers=(((1,), (1,)), ((), ())),  # rhs @ M^T = (M rhs^T)^T
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # 3-pass f32 on the MXU;
            # the single-pass default drifts ~1e-2 over 1000 steps
        )
        return (u_new, acc)

    u0 = u0_ref[:]
    u, acc = jax.lax.fori_loop(0, n_steps, body, (u0, jnp.float32(0.0)))
    acc = acc + jnp.sum(u[0, :] * u[0, :])
    uT_ref[:] = u
    j_ref[0, 0] = dt * acc / mg


def _run_kernel(m: jnp.ndarray, u0: jnp.ndarray, dt: float, n_steps: int,
                interpret: bool = False):
    mg = u0.shape[-1]
    u0_tile = jnp.zeros((8, mg), jnp.float32).at[0, :].set(u0)
    dtj = jnp.asarray([[dt]], jnp.float32)
    uT, J, traj = pl.pallas_call(
        partial(_kernel, n_steps=n_steps),
        out_shape=(
            jax.ShapeDtypeStruct((8, mg), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, mg), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(m, u0_tile, dtj)
    return uT[0, :], J[0, 0], traj


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_forward(m, u0, dt: float, n_steps: int, interpret: bool = False):
    """-J for the SH23 objective via the fused kernel. Differentiable in
    u0 (the adjoint replays the kernel's trajectory in a reverse scan)."""
    _, J, _ = _run_kernel(m, u0, dt, n_steps, interpret)
    return -J


def _fwd(m, u0, dt, n_steps, interpret):
    uT, J, traj = _run_kernel(m, u0, dt, n_steps, interpret)
    return -J, (m, uT, traj)


def _bwd(dt, n_steps, interpret, res, gbar):
    m, uT, traj = res
    mg = uT.shape[-1]
    scale = -gbar * dt * (2.0 / mg)

    # lambda_N = d(-J)/du_N; reverse: lam_{i} = S'(u_i)^T lam_{i+1} + dE/du_i.
    # The M-cotangent accumulates sum_n lambda_{n+1} (x) rhs_n (the step is
    # u_{n+1} = M rhs_n), so grad w.r.t. the operator is exact too.
    lam = scale * uT

    def body(carry, u):
        lam, dm = carry
        rhs = u / dt + 1.8 * u * u - u * u * u
        dm = dm + jnp.outer(lam, rhs)
        w = lam @ m  # M^T lam
        lam_prev = w / dt + (3.6 * u - 3.0 * u * u) * w + scale * u
        return (lam_prev, dm), None

    (lam, dm), _ = jax.lax.scan(body, (lam, jnp.zeros_like(m)), traj, reverse=True)
    return (dm, lam)


fused_forward.defvjp(_fwd, _bwd)


def sh23_fused_objective(problem, interpret=None):
    """Build a jitted fused objective for a SwiftHohenberg problem
    instance (method='matmul', f32): x (raw grid) -> -J. Use on TPU;
    on CPU backends fall back to `problem.objective`."""
    m = np.asarray(problem._M, np.float32)
    p_mat = np.asarray(problem._P, np.float32)
    dt = float(problem.cfg.dt)
    n_steps = int(problem.cfg.n_iters)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    @jax.jit
    def objective(x_list):
        u0 = jnp.dot(jnp.asarray(p_mat), x_list[0].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        return fused_forward(jnp.asarray(m), u0, dt, n_steps, interpret)

    return objective
