"""Willis optimal kinematic dynamo: two-sphere optimisation over (B0, U).

Reference: `Example_Problems/Periodic_Domain(Fourier)/Kinematic_Dynamo/
FWD_Solve_KDyn.py`. The optimisation is

    max_{B0, U} J = (1/V) int |B(T)|^2 dV   ("Final"; or time-integrated)
    s.t.  (1/V) int |B0|^2 = M0,  (1/V) int |U|^2 = E0,
          dB/dt - nabla x (U x B) + grad(Pi) - (1/Rm) lap(B) = 0,
          div B = 0, div U = 0,   triply periodic, 24^3 modes,

CNAB1 timestepping with 3/2-rule dealiasing (ref `:211-216,443`).

TPU-first realisation:
  * state is a pair of (3, m, m, m) grid arrays (B and U components
    stacked) — the reference's `Field_to_Vec` triple-concatenation
    (`FWD_Solve_KDyn.py:91-137`) without the MPI allgather; the optimiser
    is shape-agnostic so no flattening is needed
  * the tau-pressure / divergence constraint pair
    (`FWD_Solve_KDyn.py:431-440`) is mode-wise Leray projection
    P = I - k k^T/k^2 applied to the CNAB1 right-hand side: exactly what
    the Dedalus pencil solve computes per Fourier mode, with the mean
    mode pinned to zero (`:437-440`)
  * the induction term nabla x (U x B) is evaluated as a padded-grid
    cross product followed by a spectral curl (i k x E-hat), which is
    discretely divergence-free
  * gradients for BOTH spheres come from one `jax.value_and_grad` of the
    discrete forward — the reference integrates an extra 4-variable
    velocity-gradient adjoint system `dt(nu_u) + grad P = -(curl G) x B_f`
    alongside the adjoint induction equation to accumulate dJ/dU
    (`FWD_Solve_KDyn.py:881-895`); here that entire system is the VJP of
    U's appearance in every forward step
  * all wavenumber/mask tensors are numpy (compiled-in HLO constants; see
    the axon closure rule in problems/swift_hohenberg.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from spheremanopt_tpu.problems.base import check_choice, check_x64
from spheremanopt_tpu.solvers.scan_utils import kahan_add, kahan_zero


@dataclass(frozen=True)
class KDynConfig:
    npts: int = 24
    length: float = 2.0 * np.pi
    rm: float = 1.0
    dt: float = 5e-4
    n_iters: int = 2000          # Rm/dt (ref `__main__` :1028-1031)
    m0: float = 1.0              # <B0,B0> sphere
    e0: float = 1.0              # <U,U> sphere
    cost: str = "Final"          # "Final" | "Integrated" (ref :655-673)
    pad_factor: float = 1.5      # Dedalus dealias=3/2
    dtype: str = "float64"
    remat: object = True         # True/"step": per-step jax.checkpoint;
                                 # "nested": sqrt(N)-memory two-level
                                 # checkpointing; "offload": per-step
                                 # carries stored in pinned HOST memory
                                 # (GEN_BUFFER-at-scale; HBM stays O(1)
                                 # in trajectory length); False: store-all
    n_shards: int = 0            # transform="distributed": mesh size
                                 # (0 = all visible devices)
    mesh_shape: tuple = ()       # transform="distributed": () = 1-D slab
                                 # over n_shards devices; (px, py) = 2-D
                                 # PENCIL decomposition (x over px, y
                                 # over py; parallel/fft.py
                                 # distributed_rfftn_2d) — the scaling
                                 # layout for chip counts past the slab
                                 # limit (<= grid size). The reference's
                                 # Dedalus accepts a 2-D process mesh it
                                 # never exercises (slab -np 4 runs only)
    transform: str = "matmul"    # "matmul" (per-axis DFT einsums, MXU-
                                 # native, GSPMD-shardable)
                                 # | "distributed" (pencil-decomposed
                                 # shard_map rfftn with all_to_all
                                 # transposes riding ICI — the scaling
                                 # path for grids beyond one chip,
                                 # parallel/fft.py; full-grid coefficient
                                 # layout, band kept by masking)
                                 # | "fft"
    adjoint: str = "discrete"    # "discrete" (autodiff) | "continuous"
                                 # (the ref's 8-variable adjoint system,
                                 # `FWD_Solve_KDyn.py:766-1004`)
    method: str = "xla"          # "xla" (lax.scan step, any transform —
                                 # the production path)
                                 # | "pallas" (EXPERIMENTAL: whole-solve
                                 # VMEM-resident fused integrator with a
                                 # hand-derived reverse sweep, ops/
                                 # pallas/kdyn_step.py; f32 +
                                 # transform="matmul" only. Fully
                                 # validated in interpret mode and the
                                 # forward verified on hardware, but
                                 # Mosaic compile of the unaligned
                                 # einsum body costs ~16 min/program on
                                 # this toolchain — see BASELINE.md —
                                 # so it is not the default anywhere)
    matmul_precision: str = "high"
                                 # MXU pass count for the f32 transform
                                 # einsums. Measured, 24^3 x 2000 fused
                                 # fwd+grad vs pinned f64 truth (r3,
                                 # BASELINE.md):
                                 #  "default"     73 ms; J 4.5e-3,
                                 #                grads ~1e-2 (1 bf16
                                 #                pass) — fast mode
                                 #  "high"        118 ms; J 9.3e-5,
                                 #                grads ~1e-4 (native
                                 #                3-pass) — DEFAULT:
                                 #                dominates both modes
                                 #                below
                                 #  "compensated" 175 ms; J 1.3e-4 but
                                 #                grads 3e-3: the VJP's
                                 #                cotangent is not
                                 #                hi/lo-split, so the
                                 #                reverse dots run
                                 #                single-pass (measured
                                 #                dead end vs "high";
                                 #                kept as the tested
                                 #                negative result)
                                 #  "highest"     197 ms; J 1.5e-4,
                                 #                grads 1.6e-4 (6-pass)
    carry: str = "natural"       # scan-carry layout: "natural" (complex
                                 # (3,n,n,n//2+1)) | "packed" (flat f32
                                 # re/im vector; same arithmetic — J
                                 # matches to reduction-order ULPs,
                                 # grads bitwise). MEASURED DEAD END on
                                 # TPU (r3, 24^3 x 2000 fused fwd+grad):
                                 # packed 157.6 ms vs natural 117.6 at
                                 # "high" (113.2 vs 74.1 at "default").
                                 # The lane-padding the flat carry was
                                 # meant to avoid is NOT on the scan
                                 # carry's critical path — XLA already
                                 # picks good carry layouts and keeps
                                 # step intermediates in VMEM (S(1) in
                                 # the compiled HLO); the per-step
                                 # pack/unpack relayout copies are pure
                                 # added cost. Kept as the tested
                                 # negative result. Not composable with
                                 # transform="distributed" (a flat
                                 # carry has no shardable axes).
    unroll: int = 1              # lax.scan unroll factor for the step
                                 # loop (trajectory bitwise identical).
                                 # MEASURED no-win at 24^3 x 2000
                                 # (118.6 / 120.5 / 120.5 / 145.5 ms at
                                 # 1/2/4/8): XLA already pipelines the
                                 # scan body; kept as a knob for other
                                 # grid shapes.
    project_gradients: bool = True
    # Leray-project dJ/dB0 and dJ/dU onto divergence-free fields. The
    # reference's adjoint systems solve with div G = div nu = 0 tau
    # constraints, so its gradients are solenoidal and the optimiser
    # stays on the div-free manifold; raw autodiff gradients carry a
    # compressible component (exact for unconstrained perturbations).
    # Taylor tests with solenoidal perturbations pass either way.
    solve_precision: str = "native"
    # "native": the f32 matmul_precision path above (exact f64 under
    # dtype='float64') | "df64": f64-EMULATED forward (double-float
    # carries + Ozaki exact-split transform matmuls, problems/kdyn_df)
    # — the same precision escape hatch MixingConfig(solve_precision=
    # "df64") provides, for horizons/Rm where the f32 ~1e-4 gradient
    # class is no longer enough. Discrete adjoint + transform='matmul'
    # + method='xla' only; a no-op under dtype='float64'.
    df_n_bits: int = 48          # df64 only: forward significand bits
                                 # covered by the Ozaki slices (48 = df
                                 # carry floor; 32 is faster at the
                                 # same GRADIENT class — see the mixing
                                 # n_bits frontier, BASELINE.md r4)
    df_slice_dtype: str = "float32"
                                 # df64 only: storage dtype of the
                                 # Ozaki slice stacks ("bfloat16" is
                                 # exact and halves the bytes)
    df_batched_einsums: bool = False
                                 # df64 only: one batched einsum per
                                 # rhs slice (measured TPU dead end on
                                 # mixing; knob kept for other backends)
    df_adjoint: bool = False     # df64 only: hand-rolled DOUBLE-FLOAT
                                 # adjoint — DF cotangent pairs through
                                 # exact transposed Ozaki contractions
                                 # (kdyn_df adjoint section; same
                                 # design as MixingConfig.df_adjoint),
                                 # breaking the ~1e-5 f32-reverse-sweep
                                 # gradient floor down to the
                                 # f32-output class. Stores the DF
                                 # coefficient trajectory (~0.4 GB at
                                 # 24^3 x 2000).


class KinematicDynamo:
    """Two-sphere problem: X = [B (3,m,m,m), U (3,m,m,m)]."""

    def __init__(self, cfg: KDynConfig = KDynConfig()):
        check_x64(cfg.dtype)
        check_choice("method", cfg.method, ("xla", "pallas"))
        check_choice("transform", cfg.transform,
                     ("matmul", "fft", "distributed"))
        check_choice("adjoint", cfg.adjoint, ("discrete", "continuous"))
        check_choice("cost", cfg.cost, ("Final", "Integrated"))
        check_choice("solve_precision", cfg.solve_precision,
                     ("native", "df64"))
        # df64 is an f32 TPU emulation mode; under dtype='float64' the
        # standard path is already exact and the engine is a no-op
        self._df64 = (cfg.solve_precision == "df64"
                      and jnp.dtype(cfg.dtype) == jnp.float32)
        if self._df64:
            if cfg.adjoint != "discrete":
                raise ValueError(
                    "solve_precision='df64' pairs with adjoint="
                    "'discrete' only (its gradient is jax.grad of the "
                    "df forward; the continuous adjoint integrates its "
                    "own f32 PDE and would discard the df accuracy)")
            if cfg.transform != "matmul":
                raise ValueError(
                    "solve_precision='df64' requires transform='matmul' "
                    "(the engine's Ozaki splits cover the per-axis DFT "
                    "matrices; fft/distributed transforms have no "
                    "constant-operator form to split)")
            if cfg.method != "xla":
                raise ValueError(
                    "solve_precision='df64' requires method='xla' (the "
                    "Pallas kernel is a closed f32 integrator)")
            if cfg.remat not in (True, "step", False):
                raise ValueError(
                    "solve_precision='df64' supports remat=True|'step'|"
                    f"False (got {cfg.remat!r}); nested/offload apply "
                    "to the standard path's scan utilities only")
        self.cfg = cfg
        n = cfg.npts
        self.mg = int(round(n * cfg.pad_factor))
        self.radii = [cfg.m0, cfg.e0]
        rdtype = jnp.dtype(cfg.dtype)
        self._rdtype = rdtype

        # --- numpy constant tensors (compiled into the executable) ---
        # For transform="distributed" the coefficient layout is the FULL
        # oversampled-grid rfftn layout (mg, mg, mg//2+1): truncation
        # becomes a band MASK instead of a reshape, so the pencil-
        # decomposed FFT needs no cross-shard band gather, and the same
        # step/Leray/energy code serves both layouts.
        M = self.mg if cfg.transform == "distributed" else n
        kfull = 2 * np.pi * np.fft.fftfreq(M, 1.0 / M) / cfg.length
        kr = 2 * np.pi * np.fft.rfftfreq(M, 1.0 / M) / cfg.length
        Mr = M // 2 + 1
        kx = kfull[:, None, None]
        ky = kfull[None, :, None]
        kz = kr[None, None, :]
        k64 = np.stack(
            [np.broadcast_to(kx, (M, M, Mr)),
             np.broadcast_to(ky, (M, M, Mr)),
             np.broadcast_to(kz, (M, M, Mr))]
        )
        self._k64 = k64  # exact f64 form (df64 engine splits from it)
        self._k = k64.astype(rdtype)
        k2 = (self._k ** 2).sum(axis=0)
        self._k2 = k2.astype(rdtype)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_k2 = np.where(k2 > 0, 1.0 / k2, 0.0)
        self._inv_k2 = inv_k2.astype(rdtype)

        # Nyquist-free keep mask (Dedalus keeps |k| < n/2 of the NPTS
        # band), mean zeroed by the Leray/mean handling below. Identical
        # retained mode set in both layouts.
        nyq = n // 2
        fidx = np.abs(np.fft.fftfreq(M) * M)
        full_keep = fidx < nyq
        r_keep = np.arange(Mr) < nyq
        keep = (full_keep[:, None, None] & full_keep[None, :, None]
                & r_keep[None, None, :])
        self._keep = keep  # bool (M,M,Mr)

        # rfftn Hermitian double-count weights for Parseval energies
        wz = np.full(Mr, 2.0)
        wz[0] = 1.0
        if M % 2 == 0:
            wz[-1] = 1.0
        pw64 = np.broadcast_to(wz[None, None, :], (M, M, Mr))
        self._pw64 = pw64
        self._pw = pw64.astype(rdtype)

        # CNAB1 diagonal factors: (1/dt -+ k^2/(2Rm))
        a = 1.0 / cfg.dt
        nu = 1.0 / (2.0 * cfg.rm)
        self._lhs_inv = (1.0 / (a + nu * k2)).astype(rdtype)
        self._rhs_fac = (a - nu * k2).astype(rdtype)

        # exact f64 dynamics constants for the df64 engine: derived from
        # the UNROUNDED k (the standard-path k2 above is built from the
        # rdtype-cast k — splitting from rounded values would bake a
        # 2^-24 discretisation perturbation, the r4 self-review lesson)
        k2_64 = (k64 ** 2).sum(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            self._inv_k264 = np.where(k2_64 > 0, 1.0 / k2_64, 0.0)
        self._lhs_inv64 = 1.0 / (a + nu * k2_64)
        self._rhs_fac64 = a - nu * k2_64

        if cfg.carry not in ("natural", "packed"):
            raise ValueError(f"carry must be 'natural'|'packed', got {cfg.carry!r}")
        if cfg.carry == "packed" and cfg.transform == "distributed":
            raise ValueError(
                "carry='packed' flattens the scan carry to a 1-D vector, "
                "which has no axis for the distributed transform's mesh "
                "sharding; use carry='natural' with transform='distributed'")

        if cfg.transform == "distributed":
            from spheremanopt_tpu.parallel.mesh import make_mesh, make_mesh2d

            if cfg.mesh_shape:
                if len(cfg.mesh_shape) != 2:
                    raise ValueError(
                        "mesh_shape must be a (px, py) pair for the 2-D "
                        f"pencil decomposition, got {cfg.mesh_shape!r}")
                self._mesh = make_mesh2d(*cfg.mesh_shape)
            else:
                self._mesh = make_mesh(cfg.n_shards or None)

        # Per-axis DFT matrices for the matmul transform path. On TPU,
        # 24^3-scale transforms are faster as three small batched einsums
        # on the MXU than as FFT kernels, fuse the band truncation for
        # free, and — unlike XLA FFT thunks — shard cleanly under GSPMD.
        cdt = np.complex64 if rdtype == jnp.float32 else np.complex128
        mg = self.mg
        freqs = np.concatenate([np.arange(0, n // 2 + 1), np.arange(-(n - n // 2 - 1), 0)])
        j = np.arange(mg)
        # forward: grid (mg) -> truncated modes, 1/mg per axis (f64
        # forms stashed pre-cast for the df64 engine's exact splits)
        self._Ff64 = np.exp(-2j * np.pi * np.outer(freqs, j) / mg) / mg
        self._Fz64 = (np.exp(-2j * np.pi
                             * np.outer(np.arange(n // 2 + 1), j) / mg)
                      / mg)
        self._Ff = self._Ff64.astype(cdt)
        self._Fz = self._Fz64.astype(cdt)
        # inverse: modes -> grid; z-axis carries the Hermitian doubling
        # (wz_n: doubling weights of the TRUNCATED n-band layout — the
        # module-level wz above is sized for the coefficient layout,
        # which is the mg-grid in distributed mode)
        wz_n = np.full(n // 2 + 1, 2.0)
        wz_n[0] = 1.0
        if n % 2 == 0:
            wz_n[-1] = 1.0
        self._Bf64 = np.exp(2j * np.pi * np.outer(j, freqs) / mg)
        self._Bz64 = (np.exp(2j * np.pi
                             * np.outer(j, np.arange(n // 2 + 1)) / mg)
                      * wz_n[None, :])
        self._Bf = self._Bf64.astype(cdt)
        self._Bz = self._Bz64.astype(cdt)

        if cfg.matmul_precision == "compensated":
            from spheremanopt_tpu.ops.compensated import split_complex_matrix

            if rdtype != jnp.float32:
                raise ValueError(
                    "matmul_precision='compensated' is an f32 TPU mode; "
                    "use dtype='float32' (or 'highest' for f64 runs)")
            if cfg.transform != "matmul":
                raise ValueError(
                    "matmul_precision='compensated' only applies to the "
                    "transform='matmul' einsum path; the fft/distributed "
                    "transforms would silently ignore it")
            self._Ff_q = split_complex_matrix(self._Ff)
            self._Fz_q = split_complex_matrix(self._Fz)
            self._Bf_q = split_complex_matrix(self._Bf)
            self._Bz_q = split_complex_matrix(self._Bz)

        if cfg.method == "pallas":
            if cfg.dtype != "float32":
                raise ValueError(
                    "method='pallas' is an f32 TPU kernel; use "
                    "dtype='float32' (or method='xla' for f64 runs)")
            if cfg.transform != "matmul":
                raise ValueError(
                    "method='pallas' supports transform='matmul' only")
            from spheremanopt_tpu.ops.pallas.kdyn_step import (
                make_consts, make_fused_energy)

            prec = {"default": jax.lax.Precision.DEFAULT,
                    "high": jax.lax.Precision.HIGH,
                    "compensated": jax.lax.Precision.HIGH,  # kernel dots
                    # carry no hand-split; HIGH is the same pass count
                    "highest": jax.lax.Precision.HIGHEST}[cfg.matmul_precision]
            self._fused_energy = make_fused_energy(
                make_consts(self), cfg.n_iters,
                interpret=jax.default_backend() != "tpu",
                precision=prec,
                integrated=cfg.cost == "Integrated", dt=cfg.dt)

        self._objective = jax.jit(self._objective_impl)
        w = 1.0 / self.mg ** 3  # IP weight: sum over comps of grid means

        def _riesz(raw):
            out = []
            for g in raw:
                g = g / w
                if cfg.project_gradients:
                    g = self.to_grid(self._leray(self.to_coeff(g)))
                out.append(g)
            return out

        def _grad(xs):
            return _riesz(jax.grad(self._objective_impl)(list(xs)))

        def _obj_and_grad(xs):
            J, raw = jax.value_and_grad(self._objective_impl)(list(xs))
            return J, _riesz(raw)

        self._gradient = jax.jit(_grad)
        self._obj_and_grad = jax.jit(_obj_and_grad)
        self._riesz = _riesz
        if cfg.method == "pallas":
            # no aux-output form: the Pallas objective is a closed kernel;
            # archivers fall back to the re-running `diagnostics`
            self._obj_and_diag = self._obj_grad_and_diag = None
        else:
            self._obj_and_diag = jax.jit(self._objective_aux_impl)

            def _obj_grad_diag(xs):
                (J, diag), raw = jax.value_and_grad(
                    self._objective_aux_impl, has_aux=True)(list(xs))
                return J, _riesz(raw), diag

            self._obj_grad_and_diag = jax.jit(_obj_grad_diag)
        # the continuous sweep also emits its per-step invariant series
        # (max|div G|, max|div nu|, |<G>| — see adjoint_diagnostics);
        # the gradient path discards them (XLA DCEs the reductions)
        self._grad_cnts = jax.jit(
            lambda xs: self._gradient_continuous_impl(xs)[0])
        self._grad_cnts_stats = jax.jit(self._gradient_continuous_impl)
        self._inner = jax.jit(
            lambda x, y: jnp.sum(jnp.mean(x * y, axis=(-3, -2, -1)))
        )

        # --- df64 engine: f64-emulated core triple (see kdyn_df) ---
        self._dfe = None
        if self._df64:
            from spheremanopt_tpu.problems.kdyn_df import KDynDFEngine

            self._dfe = KDynDFEngine(
                self,
                n_bits=int(cfg.df_n_bits),
                slice_dtype=(jnp.bfloat16
                             if cfg.df_slice_dtype == "bfloat16"
                             else np.dtype(cfg.df_slice_dtype)),
                batched=bool(cfg.df_batched_einsums),
                with_adjoint=bool(cfg.df_adjoint))
            self._objective_df = jax.jit(
                lambda xs: self._dfe.objective(list(xs)))
            self._objective_df_pair = jax.jit(
                lambda xs: self._dfe.objective_pair(list(xs)))
            # df_adjoint: differentiate the custom_vjp objective whose
            # backward IS the hand-rolled DF reverse sweep; otherwise
            # jax.grad of the df forward (f32 reverse sweep)
            _obj_adj_aux = None
            if cfg.df_adjoint:
                _obj_for_grad, _obj_adj_aux = \
                    self._dfe._build_adjoint_objective()
            else:
                _obj_for_grad = self._dfe.objective

            def _grad_df(xs):
                return _riesz(jax.grad(_obj_for_grad)(list(xs)))

            def _obj_and_grad_df(xs):
                J, raw = jax.value_and_grad(_obj_for_grad)(list(xs))
                return J, _riesz(raw)

            def _obj_and_grad_df_pair(xs):
                # fused form for HOST consumers: J as the full (hi, lo)
                # pair next to the gradient, from ONE solve (the host
                # Wolfe's fused phi compares float(J) per trial — the
                # f32 scalar would round every trial to ~ulp(J)).
                # Gradient definition is IDENTICAL to _obj_and_grad_df
                # (grad of hi + lo).
                if _obj_adj_aux is not None:
                    f = _obj_adj_aux   # DF-adjoint reverse sweep
                else:
                    def f(xs_):
                        Jdf = self._dfe._objective_df(list(xs_))
                        return (Jdf.hi + Jdf.lo,
                                jnp.stack([Jdf.hi, Jdf.lo]))

                (_, pair), raw = jax.value_and_grad(
                    f, has_aux=True)(list(xs))
                return pair, _riesz(raw)

            self._gradient_df = jax.jit(_grad_df)
            self._obj_and_grad_df = jax.jit(_obj_and_grad_df)
            self._obj_and_grad_df_pair = jax.jit(_obj_and_grad_df_pair)

    # ------------------------------------------------------------------
    # transforms (batched over the leading component axis)
    # ------------------------------------------------------------------

    def to_coeff(self, v_grid: jnp.ndarray) -> jnp.ndarray:
        """(c, mg, mg, mg) grid -> truncated coeffs: (c, n, n, n//2+1)
        for matmul/fft, band-masked (c, mg, mg, mg//2+1) for
        distributed."""
        if self.cfg.transform == "distributed":
            if self.cfg.mesh_shape:
                from spheremanopt_tpu.parallel.fft import distributed_rfftn_2d

                c = distributed_rfftn_2d(v_grid, self._mesh) / (self.mg ** 3)
            else:
                from spheremanopt_tpu.parallel.fft import distributed_rfftn

                c = distributed_rfftn(v_grid, self._mesh) / (self.mg ** 3)
            return jnp.where(jnp.asarray(self._keep), c, 0.0)
        if self.cfg.transform == "matmul":
            pr = self.cfg.matmul_precision
            if pr == "compensated":
                from spheremanopt_tpu.ops.compensated import (
                    comp_einsum_pair, repack)

                # v real: first axis application yields the re/im pair
                # directly; downstream applications ride a trailing
                # re/im channel dim (c) through repack
                p1, p2 = comp_einsum_pair("Zk,...abk->...abZ",
                                          self._Fz_q, v_grid)
                y = jnp.stack([p1, p2], axis=-1)
                y = repack(*comp_einsum_pair("Yb,...abZc->...aYZc",
                                             self._Ff_q, y))
                y = repack(*comp_einsum_pair("Xa,...aYZc->...XYZc",
                                             self._Ff_q, y))
                c = jax.lax.complex(y[..., 0], y[..., 1])
                return jnp.where(jnp.asarray(self._keep), c, 0.0)
            c = jnp.einsum("Zk,...abk->...abZ", self._Fz, v_grid, precision=pr)
            c = jnp.einsum("Yb,...abZ->...aYZ", self._Ff, c, precision=pr)
            c = jnp.einsum("Xa,...aYZ->...XYZ", self._Ff, c, precision=pr)
            return jnp.where(jnp.asarray(self._keep), c, 0.0)
        n, mg = self.cfg.npts, v_grid.shape[-1]
        c = jnp.fft.rfftn(v_grid, axes=(-3, -2, -1)) / (mg ** 3)
        h = n // 2
        c = jnp.concatenate([c[..., : h + 1, :, :], c[..., -(n - h - 1):, :, :]], axis=-3)
        c = jnp.concatenate([c[..., :, : h + 1, :], c[..., :, -(n - h - 1):, :]], axis=-2)
        c = c[..., :, :, : n // 2 + 1]
        return jnp.where(jnp.asarray(self._keep), c, 0.0)

    def to_grid(self, c: jnp.ndarray) -> jnp.ndarray:
        """Truncated coeffs -> (c, mg, mg, mg) oversampled grid."""
        n, mg = self.cfg.npts, self.mg
        if self.cfg.transform == "distributed":
            if self.cfg.mesh_shape:
                from spheremanopt_tpu.parallel.fft import distributed_irfftn_2d

                return distributed_irfftn_2d(c * (mg ** 3), self._mesh,
                                             n_z=mg)
            from spheremanopt_tpu.parallel.fft import distributed_irfftn

            return distributed_irfftn(c * (mg ** 3), self._mesh, n_z=mg)
        if self.cfg.transform == "matmul":
            pr = self.cfg.matmul_precision
            if pr == "compensated":
                from spheremanopt_tpu.ops.compensated import (
                    comp_einsum_pair, repack)

                y = jnp.stack([c.real, c.imag], axis=-1)
                y = repack(*comp_einsum_pair("aX,...XYZc->...aYZc",
                                             self._Bf_q, y))
                y = repack(*comp_einsum_pair("bY,...aYZc->...abZc",
                                             self._Bf_q, y))
                # final axis: only the real part of the grid survives —
                # (B y)_r = Br@yr - Bi@yi; apply each plane to just the
                # channel it needs (half the packed-channel work)
                from spheremanopt_tpu.ops.compensated import comp_einsum_one

                rhi, rlo, ihi, ilo = self._Bz_q
                g = (comp_einsum_one("kZ,...abZ->...abk", rhi, rlo,
                                     y[..., 0])
                     - comp_einsum_one("kZ,...abZ->...abk", ihi, ilo,
                                       y[..., 1]))
                return g.astype(self._rdtype)
            g = jnp.einsum("aX,...XYZ->...aYZ", self._Bf, c, precision=pr)
            g = jnp.einsum("bY,...aYZ->...abZ", self._Bf, g, precision=pr)
            g = jnp.einsum("kZ,...abZ->...abk", self._Bz, g, precision=pr)
            return g.real.astype(self._rdtype)
        h = n // 2
        batch = c.shape[:-3]
        out = jnp.zeros(batch + (mg, mg, mg // 2 + 1), dtype=c.dtype)
        lo, hi = slice(0, h + 1), slice(h + 1, n)
        out = out.at[..., : h + 1, : h + 1, : n // 2 + 1].set(c[..., lo, lo, :])
        out = out.at[..., mg - (n - h - 1):, : h + 1, : n // 2 + 1].set(c[..., hi, lo, :])
        out = out.at[..., : h + 1, mg - (n - h - 1):, : n // 2 + 1].set(c[..., lo, hi, :])
        out = out.at[..., mg - (n - h - 1):, mg - (n - h - 1):, : n // 2 + 1].set(c[..., hi, hi, :])
        return jnp.fft.irfftn(out * (mg ** 3), s=(mg, mg, mg), axes=(-3, -2, -1))

    # ------------------------------------------------------------------
    # dynamics
    # ------------------------------------------------------------------

    def _energy(self, c: jnp.ndarray) -> jnp.ndarray:
        """(1/V) int |B|^2 via Parseval over the 3 components."""
        pw = jnp.asarray(self._pw)
        return jnp.sum(pw * (c.real ** 2 + c.imag ** 2))

    def _leray(self, c: jnp.ndarray) -> jnp.ndarray:
        """Mode-wise projection onto divergence-free fields; also zeroes
        the mean mode (inv_k2[0,0,0] = 0 and rhs mean handled by keep)."""
        k = jnp.asarray(self._k)
        div = jnp.sum(k * c, axis=0)  # k . c  (i factors cancel in P)
        return c - k * (div * jnp.asarray(self._inv_k2))[None]

    def _induction(self, b_c: jnp.ndarray, u_grid: jnp.ndarray) -> jnp.ndarray:
        """F-hat = i k x (U x B)-hat with padded-grid cross product."""
        b = self.to_grid(b_c)
        e = jnp.stack([
            u_grid[1] * b[2] - u_grid[2] * b[1],
            u_grid[2] * b[0] - u_grid[0] * b[2],
            u_grid[0] * b[1] - u_grid[1] * b[0],
        ])
        e_c = self.to_coeff(e)
        k = jnp.asarray(self._k)
        return 1j * jnp.stack([
            k[1] * e_c[2] - k[2] * e_c[1],
            k[2] * e_c[0] - k[0] * e_c[2],
            k[0] * e_c[1] - k[1] * e_c[0],
        ])

    def _cnab1_step(self, b_c: jnp.ndarray, u_grid: jnp.ndarray,
                    ops: dict | None = None) -> jnp.ndarray:
        """CNAB1: (1/dt + k^2/2Rm) B' = (1/dt - k^2/2Rm) B + F, with the
        tau-pressure divergence constraint as Leray projection and the
        mean mode pinned to zero (ref equations :431-440).

        `ops` optionally overrides the Rm-dependent diagonal factors
        {"lhs_inv", "rhs_fac"} as traced operands (see
        `objective_and_gradient_rm`); the default closes over the
        config-Rm numpy constants (HLO constants — platform rule 1)."""
        if ops is None:
            lhs_inv = jnp.asarray(self._lhs_inv)
            rhs_fac = jnp.asarray(self._rhs_fac)
        else:
            lhs_inv, rhs_fac = ops["lhs_inv"], ops["rhs_fac"]
        rhs = rhs_fac * b_c + self._induction(b_c, u_grid)
        out = self._leray(rhs) * lhs_inv
        # zero mean mode (k=0): lhs_inv[0,0,0] is finite, so mask it
        return out.at[:, 0, 0, 0].set(0.0)

    def _remat_step(self, step):
        """Apply the configured trajectory-memory policy to one step.
        SINGLE wiring point shared by `_integrate` and `_integrate_aux`
        so a remat mode added to one cannot silently diverge the other."""
        if self.cfg.remat is True or self.cfg.remat == "step":
            return jax.checkpoint(step)
        if self.cfg.remat == "offload":
            # store-all in HOST memory: per-step carries offloaded to
            # pinned_host (the reference GEN_BUFFER's host-RAM snapshots,
            # `FWD_Solve_KDyn.py:341-355`) — HBM stays O(1) in the
            # trajectory length
            from spheremanopt_tpu.solvers.scan_utils import offload_checkpoint

            return offload_checkpoint(step)
        return step

    def _carry_codec(self, step, b0_c):
        """(step', b0', energy, unpack) for the configured scan-carry
        layout. carry='packed' is a layout experiment: the natural
        complex carry (3, n, n, n//2+1) has a tiny minor dim (13 at
        24^3) that the TPU (8,128) tile layout lane-pads ~10x in HBM;
        every scan iteration round-trips the carry (and, under remat,
        stores it as a residual for the reverse sweep) at the PADDED
        size. Packing re/im into one flat f32 vector makes the carry's
        minor dim its full length, so carry + residual traffic runs at
        logical size. pack/unpack are exact layout ops: trajectories
        match to reduction-order reassociation (measured 4 ULP on J,
        gradients bitwise — tests/test_kdyn.py::test_packed_carry_parity)."""
        if self.cfg.carry != "packed":
            return step, b0_c, self._energy, lambda b: b

        cshape = b0_c.shape

        def _pk(b):
            return jnp.stack([b.real, b.imag]).reshape(-1)

        def _un(f):
            r = f.reshape((2,) + cshape)
            return jax.lax.complex(r[0], r[1])

        def packed_step(bf, u):
            return _pk(step(_un(bf), u))

        def energy(bf):
            return self._energy(_un(bf))

        return packed_step, _pk(b0_c), energy, _un

    def _integrate(self, b0_c, u_grid, n_steps: int, ops: dict | None = None):
        if ops is None:
            step = self._cnab1_step
        else:
            def step(b, u):
                return self._cnab1_step(b, u, ops)
        step = self._remat_step(step)
        integrated = self.cfg.cost == "Integrated"
        step, b0, energy, _un = self._carry_codec(step, b0_c)

        if self.cfg.remat == "nested":
            # sqrt(N) memory: O(sqrt N) stored carries, one recompute per
            # chunk — for trajectories whose per-step snapshot buffer
            # would not fit HBM (the reference's GEN_BUFFER ceiling)
            from spheremanopt_tpu.solvers.scan_utils import nested_checkpoint_scan

            def one(b):
                e = energy(b) if integrated else jnp.zeros((), self._rdtype)
                return step(b, u_grid), e

            b, tot = nested_checkpoint_scan(one, b0, n_steps)
            b = _un(b)
            if integrated:
                return b, self.cfg.dt * (tot + self._energy(b))
            return b, self._energy(b)

        def body(carry, _):
            b, acc = carry
            if integrated:
                acc = kahan_add(acc, energy(b))
            b = step(b, u_grid)
            return (b, acc), None

        acc0 = kahan_zero(self._rdtype)
        (b, acc), _ = jax.lax.scan(body, (b0, acc0), xs=None,
                                   length=n_steps, unroll=self.cfg.unroll)
        b = _un(b)
        if integrated:
            acc = kahan_add(acc, self._energy(b))
            return b, self.cfg.dt * acc[0]
        return b, self._energy(b)

    def _objective_impl(self, x_list) -> jnp.ndarray:
        b0 = x_list[0].astype(self._rdtype)
        u = x_list[1].astype(self._rdtype)
        b0_c = self.to_coeff(b0)
        # band-limit U the way Vec_to_Field + Dedalus products do
        u_bl = self.to_grid(self.to_coeff(u))
        if self.cfg.method == "pallas":
            # whole solve in one VMEM-resident kernel (custom VJP carries
            # the hand-derived transposed sweep); the outer transforms
            # stay XLA and differentiate as usual
            return -self._fused_energy(b0_c.real, b0_c.imag, u_bl)
        _, J = self._integrate(b0_c, u_bl, self.cfg.n_iters)
        return -J

    def _integrate_aux(self, b0_c, u_grid, n_steps: int):
        """`_integrate` that also scans out the per-step magnetic-energy
        series from the SAME solve. Every memory/layout mode (remat incl.
        'nested', carry='packed', unroll) routes through the same shared
        wiring as the plain path (`_remat_step`/`_carry_codec`), so the J
        arithmetic is op-identical to `_integrate` for both costs — the
        only extra work is the per-step energy scalar."""
        step = self._remat_step(self._cnab1_step)
        integrated = self.cfg.cost == "Integrated"
        step, b0, energy, _un = self._carry_codec(step, b0_c)

        if self.cfg.remat == "nested":
            from spheremanopt_tpu.solvers.scan_utils import nested_checkpoint_scan

            def one(b):
                return step(b, u_grid), energy(b)

            b, tot, es = nested_checkpoint_scan(one, b0, n_steps,
                                                return_series=True)
            b = _un(b)
            eN = self._energy(b)
            energies = jnp.concatenate([es, eN[None]])
            if integrated:
                return b, self.cfg.dt * (tot + eN), energies
            return b, eN, energies

        def body(carry, _):
            b, acc = carry
            e = energy(b)
            if integrated:
                acc = kahan_add(acc, e)
            b = step(b, u_grid)
            return (b, acc), e

        acc0 = kahan_zero(self._rdtype)
        (b, acc), es = jax.lax.scan(body, (b0, acc0), xs=None,
                                    length=n_steps, unroll=self.cfg.unroll)
        b = _un(b)
        eN = self._energy(b)
        energies = jnp.concatenate([es, eN[None]])
        if integrated:
            acc = kahan_add(acc, eN)
            return b, self.cfg.dt * acc[0], energies
        return b, eN, energies

    def _objective_aux_impl(self, x_list):
        """(-J, diagnostics) captured from one forward solve — the ME
        series + div-B invariant the reference's GlobalFlowProperty
        monitors track along the FWD solve (`FWD_Solve_KDyn.py:
        608-650,941-973`). All aux outputs are real (host rule)."""
        b0 = x_list[0].astype(self._rdtype)
        u = x_list[1].astype(self._rdtype)
        b0_c = self.to_coeff(b0)
        u_bl = self.to_grid(self.to_coeff(u))
        b, J, energies = self._integrate_aux(b0_c, u_bl, self.cfg.n_iters)
        k = jnp.asarray(self._k)
        div_b = jnp.abs(jnp.sum(k * b, axis=0)).max()
        return -J, {"magnetic_energy": energies, "max_div_B": div_b,
                    "B_final": self.to_grid(b)}

    # ------------------------------------------------------------------
    # PDE-state restart (ref `IVP_FWD.load_state`, FWD_Solve_SH23.py:459-460)
    # ------------------------------------------------------------------

    def initial_state(self, x_list) -> dict:
        """Induction-solver state at t=0: B spectral coefficients as a
        stacked re/im plane plus the (fixed) band-limited stirring field."""
        if not hasattr(self, "_initial_state_fn"):
            @jax.jit
            def make(b0, u):
                b_c = self.to_coeff(b0.astype(self._rdtype))
                u_bl = self.to_grid(self.to_coeff(u.astype(self._rdtype)))
                return {"b": jnp.stack([b_c.real, b_c.imag]), "u": u_bl}

            self._initial_state_fn = make
        return self._initial_state_fn(jnp.asarray(x_list[0]),
                                      jnp.asarray(x_list[1]))

    def advance_state(self, state: dict, n_steps: int) -> dict:
        if not hasattr(self, "_advance"):
            def step(s):
                b = self._cnab1_step(s["b"][0] + 1j * s["b"][1], s["u"])
                return {"b": jnp.stack([b.real, b.imag]), "u": s["u"]}

            from spheremanopt_tpu.problems.base import SegmentAdvance
            self._advance = SegmentAdvance(step)
        return self._advance(state, n_steps)

    def state_fields(self, state) -> dict:
        if not hasattr(self, "_state_fields_fn"):
            @jax.jit
            def grid(s):
                return self.to_grid(s["b"][0] + 1j * s["b"][1])

            self._state_fields_fn = grid
        return {"b_grid": self._state_fields_fn(state),
                "b_hat_ri": state["b"], "u": state["u"]}

    def _curl_cross(self, a_c: jnp.ndarray, b_grid: jnp.ndarray) -> jnp.ndarray:
        """F(A, B) = (curl A) x B evaluated on the padded grid, truncated
        (the reference's F_x/F_y/F_z substitutions, `:841-848`)."""
        k = jnp.asarray(self._k)
        w_c = 1j * jnp.stack([
            k[1] * a_c[2] - k[2] * a_c[1],
            k[2] * a_c[0] - k[0] * a_c[2],
            k[0] * a_c[1] - k[1] * a_c[0],
        ])
        w = self.to_grid(w_c)
        f = jnp.stack([
            w[1] * b_grid[2] - w[2] * b_grid[1],
            w[2] * b_grid[0] - w[0] * b_grid[2],
            w[0] * b_grid[1] - w[1] * b_grid[0],
        ])
        return self.to_coeff(f)

    def _gradient_continuous_impl(self, x_list):
        """Continuous adjoint: the reference's 8-variable coupled system
        (`FWD_Solve_KDyn.py:855-895,903-908`): integrate

            dt(G) - (1/Rm) lap G - grad Pi = (curl G) x U [- 2 B_f]
            dt(nu) + grad P = -(curl G) x B_f,   div G = div nu = 0

        backward along the stored forward trajectory, G(T) = -2 B(T)
        ("Final") or 0 ("Integrated"), CNAB1 with Leray projection.
        Returns [dJ/dB0, dJ/dU] = [G(0), nu(0)]. First-order in dt; use
        adjoint='discrete' for Taylor-exact gradients."""
        cfg = self.cfg
        b0 = x_list[0].astype(self._rdtype)
        u = self.to_grid(self.to_coeff(x_list[1].astype(self._rdtype)))

        def fwd_body(b, _):
            b2 = self._cnab1_step(b, u)
            return b2, b2

        b0_c = self.to_coeff(b0)
        b_T, snaps = jax.lax.scan(fwd_body, b0_c, xs=None, length=cfg.n_iters)

        lhs_inv = jnp.asarray(self._lhs_inv)
        rhs_fac = jnp.asarray(self._rhs_fac)
        integrated = cfg.cost == "Integrated"

        k = jnp.asarray(self._k)

        def adj_body(carry, bf_c):
            g, nu = carry
            bf = self.to_grid(bf_c)
            f_g = self._curl_cross(g, u)
            if integrated:
                f_g = f_g - 2.0 * bf_c
            g_new = self._leray(rhs_fac * g + f_g) * lhs_inv
            g_new = g_new.at[:, 0, 0, 0].set(0.0)
            # nu system has no diffusion: forward Euler + projection
            f_nu = -self._curl_cross(g, bf)
            nu_new = nu + cfg.dt * self._leray(f_nu)
            nu_new = nu_new.at[:, 0, 0, 0].set(0.0)
            # per-step solenoidality/flux invariants of the adjoint
            # fields — the reference logs max|div B|, <B>, max|div U|
            # every ADJOINT step too (`FWD_Solve_KDyn.py:941-973`);
            # these must sit at Leray-projection roundoff
            stats = (jnp.abs(jnp.sum(k * g_new, axis=0)).max(),
                     jnp.abs(jnp.sum(k * nu_new, axis=0)).max(),
                     jnp.abs(g_new[:, 0, 0, 0]).max())
            return (g_new, nu_new), stats

        if integrated:
            g0 = jnp.zeros_like(b0_c)
        else:
            g0 = -2.0 * b_T
        nu0 = jnp.zeros_like(b0_c)
        (g, nu), stats = jax.lax.scan(adj_body, (g0, nu0), snaps,
                                      reverse=True)
        return [self.to_grid(g), self.to_grid(nu)], stats

    # ------------------------------------------------------------------
    # public triple
    # ------------------------------------------------------------------

    def objective(self, x_list):
        if self._dfe is not None:
            return self._objective_df(list(x_list))
        return self._objective(list(x_list))

    def objective_f64(self, x_list) -> float:
        """df64 mode only: -J reconstructed to double-float resolution
        on the host (the f32 scalar `objective` rounds to ~ulp(J),
        which swamps Taylor-remainder increments and fine line-search
        comparisons)."""
        if self._dfe is None:
            raise RuntimeError("objective_f64 requires "
                               "solve_precision='df64'")
        pair = np.asarray(self._objective_df_pair(list(x_list)),
                          np.float64)
        return float(pair[0] + pair[1])

    def gradient(self, x_list):
        if self._dfe is not None:
            return self._gradient_df(list(x_list))
        if self.cfg.adjoint == "continuous":
            return self._grad_cnts(list(x_list))
        return self._gradient(list(x_list))

    def adjoint_diagnostics(self, x_list) -> dict:
        """Invariant monitoring of the continuous-adjoint sweep: per-step
        max|div G|, max|div nu| and mean-flux |<G>| series (reported in
        forward-time order t = dt..T), plus the gradient the sweep
        produced — the one reference monitoring surface
        (`FWD_Solve_KDyn.py:941-973` logs max|div B|, <B> flux,
        max|div U| every adjoint step) the rebuild previously exposed
        only for the forward solve. The series must sit at
        Leray-projection roundoff; a drift flags a broken projector or
        operator stack. Requires adjoint='continuous' (the discrete
        adjoint is machine-verified by Taylor tests instead)."""
        if self.cfg.adjoint != "continuous":
            raise ValueError(
                "adjoint_diagnostics monitors the continuous-adjoint "
                "integration; construct with adjoint='continuous' (the "
                "discrete mode's gradient is jax.grad — its correctness "
                "surface is the Taylor-remainder tests)")
        grads, (div_g, div_nu, flux_g) = self._grad_cnts_stats(
            list(x_list))
        return {
            "adj_sim_time": self.cfg.dt * np.arange(1, self.cfg.n_iters + 1),
            "max_div_G": np.asarray(div_g),
            "max_div_nu": np.asarray(div_nu),
            "max_flux_G": np.asarray(flux_g),
            "gradient": grads,
        }

    def objective_and_gradient(self, x_list):
        """Fused (J, [dJ/dB0, dJ/dU]); under adjoint='continuous' there
        is no fused form (the continuous adjoint is its own backward PDE
        integration, not the VJP of the discrete forward), so the mode's
        gradient is paired with a separate forward — f_and_g consumers
        (Wolfe fused phi) must not mix gradient definitions."""
        if self._dfe is not None:
            # host consumers get pair-resolution J (see objective_f64)
            pair, g = self._obj_and_grad_df_pair(list(x_list))
            pair = np.asarray(pair, np.float64)
            return float(pair[0]) + float(pair[1]), g
        if self.cfg.adjoint == "continuous":
            return self._objective(list(x_list)), self._grad_cnts(list(x_list))
        return self._obj_and_grad(list(x_list))

    @property
    def objective_and_gradient_aux(self):
        """(fg(ops, xs), ops) for outer-jit drivers (optim/jit_driver).
        The standard KDyn path closes over small numpy constants (no
        operand stacks), so ops is None and drivers trace
        `objective_and_gradient` directly. Under df64 that fused host
        form reconstructs J on the host (float() of the pair), which
        cannot trace — this traceable f32-scalar form serves the device
        loop instead (its search state is f32; same gradient
        definition)."""
        if self._dfe is None:
            return None, None

        def fg(ops, xs):
            del ops  # no operand stacks: slices are HLO constants
            J, raw = jax.value_and_grad(self._dfe.objective)(list(xs))
            return J, self._riesz(raw)

        return fg, {}

    def _objective_rm_impl(self, ops, x_list) -> jnp.ndarray:
        b0 = x_list[0].astype(self._rdtype)
        u = x_list[1].astype(self._rdtype)
        b0_c = self.to_coeff(b0)
        u_bl = self.to_grid(self.to_coeff(u))
        _, J = self._integrate(b0_c, u_bl, self.cfg.n_iters, ops=ops)
        return -J

    @property
    def objective_and_gradient_rm(self):
        """(fg(ops, xs), make_ops(rm)): the fused objective+gradient with
        the Rm-dependent CNAB1 diagonal factors as explicit jit operands,
        so ONE compiled (device-loop) executable serves EVERY magnetic
        Reynolds number — the sweep capability behind
        `examples/kdyn_critical_rm.py` (the reference re-runs its whole
        `mpiexec` workload per Rm, `FWD_Solve_KDyn.py:1028-1036`).
        `make_ops` builds the numpy operand dict on the host."""

        def fg(ops, xs):
            J, raw = jax.value_and_grad(
                lambda xs_: self._objective_rm_impl(ops, xs_))(list(xs))
            return J, self._riesz(raw)

        def make_ops(rm: float) -> dict:
            # identical arithmetic/dtype path to the __init__ constants:
            # make_ops(cfg.rm) is bit-equal to (lhs_inv, rhs_fac)
            a = 1.0 / self.cfg.dt
            nu = 1.0 / (2.0 * float(rm))
            k2 = self._k2
            dt_np = self._lhs_inv.dtype
            return {"lhs_inv": (1.0 / (a + nu * k2)).astype(dt_np),
                    "rhs_fac": (a - nu * k2).astype(dt_np)}

        return fg, make_ops

    # ------------------------------------------------------------------
    # fused diagnostics: same-solve capture for zero-extra-cost archiving
    # ------------------------------------------------------------------

    @property
    def has_fused_diagnostics(self) -> bool:
        return self._obj_and_diag is not None

    def _diag_host(self, diag: dict) -> dict:
        out = dict(diag)
        out["sim_time"] = self.cfg.dt * np.arange(self.cfg.n_iters + 1)
        return out

    def objective_and_diagnostics(self, x_list):
        """(J, diagnostics dict) from ONE forward solve (vs `diagnostics`,
        which re-runs it). Used by `io.timeseries.FusedArchiver`."""
        if self._obj_and_diag is None:
            raise ValueError(
                "fused diagnostics unavailable for "
                f"method={self.cfg.method!r}, remat={self.cfg.remat!r}")
        J, diag = self._obj_and_diag(list(x_list))
        return J, self._diag_host(diag)

    def objective_gradient_and_diagnostics(self, x_list):
        """(J, grads, diagnostics) from one fused fwd+bwd solve (or, under
        adjoint='continuous', the mode's own gradient next to the
        diagnostics-carrying forward — see `objective_and_gradient`)."""
        if self._obj_grad_and_diag is None:
            raise ValueError(
                "fused diagnostics unavailable for "
                f"method={self.cfg.method!r}, remat={self.cfg.remat!r}")
        if self.cfg.adjoint == "continuous":
            J, diag = self.objective_and_diagnostics(x_list)
            return J, self._grad_cnts(list(x_list)), diag
        J, g, diag = self._obj_grad_and_diag(list(x_list))
        return J, g, self._diag_host(diag)

    def inner_product(self, x, y):
        """(1/V) int f . g dV = sum over components of grid means
        (ref `Inner_Prod_3`, `FWD_Solve_KDyn.py:173-181`)."""
        return self._inner(x, y)

    @property
    def inner_products(self):
        return self.inner_product

    def diagnostics(self, x_list) -> dict:
        """Per-step magnetic-energy series + div/flux invariants (the
        reference's GlobalFlowProperty monitors, `FWD_Solve_KDyn.py:
        608-650,941-973`) and final fields."""
        b0 = jnp.asarray(x_list[0], self._rdtype)
        u = jnp.asarray(x_list[1], self._rdtype)
        if not hasattr(self, "_diagnostics_fn"):
            @jax.jit
            def run(b0, u):
                b0_c = self.to_coeff(b0)
                u_bl = self.to_grid(self.to_coeff(u))

                def body(b, _):
                    return self._cnab1_step(b, u_bl), self._energy(b)

                b, energies = jax.lax.scan(body, b0_c, xs=None,
                                           length=self.cfg.n_iters)
                k = jnp.asarray(self._k)
                div_b = jnp.abs(jnp.sum(k * b, axis=0)).max()
                # keep all host-bound outputs real (complex transfers are
                # unimplemented on this platform)
                return (self.to_grid(b),
                        jnp.concatenate([energies, self._energy(b)[None]]),
                        div_b)

            self._diagnostics_fn = run
        b_grid, energies, div_b = self._diagnostics_fn(b0, u)
        return {
            "sim_time": self.cfg.dt * np.arange(self.cfg.n_iters + 1),
            "magnetic_energy": energies,
            "max_div_B": div_b,
            "B_final": b_grid,
        }

    # ------------------------------------------------------------------
    # initial conditions (ref `Generate_IC`, :183-317)
    # ------------------------------------------------------------------

    def _curl_of_noise(self, key, frac=0.25) -> jnp.ndarray:
        """curl-like combination of filtered-noise potential derivatives
        (ref takes B = curl-ish of (phi_y - phi_z, ...), :240-243)."""
        noise = jax.random.normal(key, (self.mg,) * 3, self._rdtype)
        c = self.to_coeff(noise[None])[0]
        # low-pass: keep lowest `frac` of mode indices per axis (ref
        # filter_field frac=0.25, :30-55); mask built on the actual
        # coefficient layout so the retained mode set is identical for
        # the truncated (matmul/fft) and full-grid (distributed) layouts
        n = self.cfg.npts
        M, Mr = c.shape[0], c.shape[2]
        idx = np.abs(np.fft.fftfreq(M) * M) / (n // 2)
        idxr = np.arange(Mr) / (n // 2)
        keep = ((idx[:, None, None] <= frac) & (idx[None, :, None] <= frac)
                & (idxr[None, None, :] <= frac))
        c = jnp.where(jnp.asarray(keep), c, 0.0)
        k = jnp.asarray(self._k)
        dx, dy, dz = 1j * k[0] * c, 1j * k[1] * c, 1j * k[2] * c
        return self.to_grid(jnp.stack([dy - dz, dz - dx, dx - dy]))

    def generate_ic(self, seed: int = 42, u_noise: bool = True) -> List[jnp.ndarray]:
        # prep-smooth B: 100 CNAB1 steps at dt=1e-3 (ref :297-302; the
        # reference accidentally passes the module globals Rm, dt — a
        # known bug we do not replicate, SURVEY.md section 2 quirks)
        prep = KinematicDynamo(KDynConfig(
            npts=self.cfg.npts, length=self.cfg.length, rm=1.0, dt=1e-3,
            n_iters=100, cost="Final", pad_factor=self.cfg.pad_factor,
            dtype=self.cfg.dtype, remat=False, transform=self.cfg.transform,
            n_shards=self.cfg.n_shards,
        ))
        if not u_noise:
            # Willis-type ABC-like base flow (ref :255-261)
            xs = np.arange(self.mg) * self.cfg.length / self.mg
            X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
            s3 = np.sqrt(3.0)
            u_base = np.stack([
                0.5 * np.sin(Y) * np.cos(Z) / s3,
                0.5 * np.sin(Z) * np.cos(X) / s3,
                0.5 * np.sin(X) * np.cos(Y) / s3,
            ]).astype(self._rdtype)
        else:
            u_base = None

        @jax.jit
        def make(key):
            key_b, key_u = jax.random.split(key)
            b = self._curl_of_noise(key_b)
            u = self._curl_of_noise(key_u) if u_noise else jnp.asarray(u_base)
            u = u * jnp.sqrt(self.cfg.e0 / self._inner(u, u))
            b_c, _ = prep._integrate(prep.to_coeff(b), u, 100)
            b = self.to_grid(b_c)
            b = b * jnp.sqrt(self.cfg.m0 / self._inner(b, b))
            return b, u

        b, u = make(jax.random.PRNGKey(seed))
        return [b, u]
