"""Spectral resolution continuation for optimisation states.

Re-expresses an optimisation state produced by a COARSER (or finer)
study of the same problem family on a target problem's grid: transform
to spectral coefficients at the source resolution, zero-pad (or
truncate) the mode set, synthesise on the target grid, and renormalise
onto the spheres. Because every state the optimiser produces is
band-limited (ICs are filtered, gradients are truncated, steps are
linear combinations), upsampling preserves the represented FUNCTION to
machine precision.

Workflow this serves — coarse->fine warm-starting: run the 256x128
mixing study, then continue its optimum at 512x256 instead of starting
the fine study cold. The reference can only restart at the SAME
resolution (`DAL_PROGRESS.h5` stores flat vectors whose length must
match the domain, `FWD_Solve_SH23.py:787-800`); Dedalus itself has the
underlying capability (`set_scales`) but no reference problem wires it
to the optimiser. CLI: `--resume <file> --regrid`.

Everything here is init-time host numpy (exact f64) — regridding is a
one-shot study operation, not a compute path.
"""

from __future__ import annotations

import itertools

import numpy as np

from spheremanopt_tpu.ops.chebyshev import ChebyshevBasis1D


def _fourier_resample(u: np.ndarray, dst_sizes: tuple) -> np.ndarray:
    """Resample the trailing len(dst_sizes) periodic axes of a real
    field by rfftn zero-padding/truncation (function-value preserving).
    On the full-spectrum axes the smaller grid's Nyquist mode is
    dropped (it has no Hermitian partner; problem bands never populate
    it — every problem keeps |k| strictly below the truncation)."""
    u = np.asarray(u, np.float64)
    nd = len(dst_sizes)
    axes = tuple(range(u.ndim - nd, u.ndim))
    src_sizes = [u.shape[a] for a in axes]
    c = np.fft.rfftn(u, axes=axes) / float(np.prod(src_sizes))

    out_shape = (list(u.shape[: u.ndim - nd])
                 + list(dst_sizes[:-1]) + [dst_sizes[-1] // 2 + 1])
    out = np.zeros(out_shape, np.complex128)

    # per full axis: positive block [0 : p+1], negative block [-p :]
    blocks = []
    for ns, ndst in zip(src_sizes[:-1], dst_sizes[:-1]):
        m = min(ns, ndst)
        p = (m - 1) // 2
        ax_blocks = [(slice(0, p + 1), slice(0, p + 1))]
        if p > 0:
            ax_blocks.append((slice(ns - p, ns), slice(ndst - p, ndst)))
        blocks.append(ax_blocks)
    rmin = min(src_sizes[-1] // 2 + 1, dst_sizes[-1] // 2 + 1)
    lead = (slice(None),) * (u.ndim - nd)
    for combo in itertools.product(*blocks) if blocks else [()]:
        src_ix = lead + tuple(s for s, _ in combo) + (slice(0, rmin),)
        dst_ix = lead + tuple(d for _, d in combo) + (slice(0, rmin),)
        out[dst_ix] = c[src_ix]

    return np.fft.irfftn(out * float(np.prod(dst_sizes)),
                         s=tuple(dst_sizes), axes=axes)


def _cheb_pad(c: np.ndarray, n_dst: int, axis: int = -1) -> np.ndarray:
    """Zero-pad/truncate a Chebyshev coefficient axis (T_n coefficients
    represent the same function on [z0, z1] regardless of count)."""
    n_src = c.shape[axis]
    if n_src == n_dst:
        return c
    m = min(n_src, n_dst)
    pad_shape = list(c.shape)
    pad_shape[axis] = n_dst
    out = np.zeros(pad_shape, c.dtype)
    sl_src = [slice(None)] * c.ndim
    sl_dst = [slice(None)] * c.ndim
    sl_src[axis] = slice(0, m)
    sl_dst[axis] = slice(0, m)
    out[tuple(sl_dst)] = c[tuple(sl_src)]
    return out


def _renormalise(problem, xs):
    out = []
    for x, r in zip(xs, problem.radii):
        n = float(problem.inner_product(x, x))
        out.append(x * np.sqrt(r / n))
    return out


def expected_state_shapes(problem):
    """Canonical state-component shapes for `problem` (the layout
    `generate_ic` produces and the solvers consume), or None for
    problems with no fixed grid layout (PCA)."""
    kind = type(problem).__name__
    if kind == "SwiftHohenberg":
        return [(problem.basis.n_grid,)]
    if kind == "SwiftHohenbergBounded":
        return [(problem.cfg.npts,)]
    if kind == "KinematicDynamo":
        return [(3, problem.mg, problem.mg, problem.mg)] * 2
    if kind == "OptimalMixing":
        return [(2, problem.mgx, problem.mgz)]
    return None


def reshape_flat_state(problem, x_list):
    """Coerce loaded optimisation states to `problem`'s canonical
    layout. A reference-format `DAL_PROGRESS.h5` stores each component
    as a FLAT Dedalus vector (`Field_to_Vec` flattens every field
    C-order and concatenates them — the same byte order as this
    framework's channel-major states), so a flat component whose size
    matches is reshaped in place. Shaped components pass through
    (different-resolution shapes are `--regrid` sources). Flat
    components at a DIFFERENT resolution are reshaped where the grid is
    unambiguous (KDyn's 3*mg^3 cube); anything else fails loudly here
    instead of deep inside a solver einsum."""
    exp = expected_state_shapes(problem)
    if exp is None:
        return list(x_list)
    if len(x_list) != len(exp):
        raise ValueError(
            f"state has {len(x_list)} components; "
            f"{type(problem).__name__} expects {len(exp)}")
    kind = type(problem).__name__
    out = []
    for i, (x, shp) in enumerate(zip(x_list, exp)):
        x = np.asarray(x)
        if x.shape == shp or x.ndim == len(shp):
            out.append(x)
            continue
        if x.ndim == 1 and x.size == int(np.prod(shp)):
            out.append(x.reshape(shp))
            continue
        if x.ndim == 1 and kind == "KinematicDynamo" and x.size % 3 == 0:
            mg = int(round((x.size / 3) ** (1.0 / 3.0)))
            if 3 * mg ** 3 == x.size:   # coarse/fine flat cube: shape
                out.append(x.reshape(3, mg, mg, mg))  # it for --regrid
                continue
        raise ValueError(
            f"component {i}: loaded array of shape {x.shape} "
            f"({x.size} elements) does not match the expected state "
            f"shape {shp} ({int(np.prod(shp))} elements); for "
            "cross-resolution continuation save in the native .npz "
            "format (shapes preserved) and use --regrid")
    return out


def regrid_state(problem, x_list, renormalise: bool = True):
    """Re-express `x_list` (a state saved by a different-resolution
    study of the SAME problem family) on `problem`'s grid. Source
    resolutions are inferred from the array shapes; target transforms
    come from `problem`. Returns a list of numpy arrays in the
    problem's dtype, renormalised onto the spheres (the optimiser
    renormalises at entry regardless; renormalise=True keeps direct
    objective evaluations on-sphere too)."""
    kind = type(problem).__name__
    cfg = problem.cfg
    dt = np.dtype(cfg.dtype)

    if kind == "SwiftHohenberg":
        mg_d = problem.basis.n_grid
        xs = [_fourier_resample(np.asarray(x_list[0]), (mg_d,))]

    elif kind == "KinematicDynamo":
        # distributed targets included: the state layout is the same
        # replicated (c, mg, mg, mg) grid (np.asarray gathers a sharded
        # source); the optimiser re-shards at entry via shard_fields
        mg_d = problem.mg
        xs = [_fourier_resample(np.asarray(x), (mg_d,) * 3)
              for x in x_list]

    elif kind == "SwiftHohenbergBounded":
        u = np.asarray(x_list[0], np.float64)
        src_basis = ChebyshevBasis1D(u.shape[-1], cfg.z0, cfg.z1)
        c = src_basis.analysis @ u
        xs = [problem.basis.synthesis @ _cheb_pad(c, cfg.npts)]

    elif kind == "OptimalMixing":
        g = np.asarray(x_list[0], np.float64)          # (2, mgx_s, mgz_s)
        mgx_s, mgz_s = g.shape[-2:]
        nx_s = int(round(mgx_s / cfg.pad_factor))
        nz_s = int(round(mgz_s / cfg.pad_factor))
        kxn_s = nx_s // 2 + 1
        # source analysis (exact f64, same formulas as the problem's)
        j = np.arange(mgx_s)
        kxi = np.arange(kxn_s)
        Fx_s = np.exp(-2j * np.pi * np.outer(kxi, j) / mgx_s) / mgx_s
        Az_s = ChebyshevBasis1D(mgz_s, -1.0, 1.0).analysis[:nz_s]
        xmask_s = np.ones(kxn_s)
        if nx_s % 2 == 0:
            xmask_s[-1] = 0.0
        c = np.einsum("kj,cjz->ckz", Fx_s, g)
        c = np.einsum("nz,ckz->ckn", Az_s, c) * xmask_s[None, :, None]
        # pad/truncate both mode axes into the target layout
        out = np.zeros((g.shape[0], problem.kxn, cfg.nz), np.complex128)
        km, nm = min(kxn_s, problem.kxn), min(nz_s, cfg.nz)
        out[:, :km, :nm] = c[:, :km, :nm]
        out *= np.asarray(problem._xmask)[None, :, None]
        # target synthesis from the problem's exact f64 matrices
        gz = np.einsum("zn,ckn->ckz", problem._Vz64, out)
        xs = [np.einsum("jk,ckz->cjz", problem._Bx64, gz).real]

    else:
        raise ValueError(f"regrid_state: no rule for problem {kind!r}")

    xs = [np.asarray(x, dt) for x in xs]
    return _renormalise(problem, xs) if renormalise else xs
