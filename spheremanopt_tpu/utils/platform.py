"""In-process JAX platform / precision selection, shared by every entry
point (CLI, server, examples, baselines, bench children).

Why this must be one helper and not per-file boilerplate (all measured,
CLAUDE.md platform rules 5-6): on an axon host, ``JAX_PLATFORMS=cpu`` in
the environment is IGNORED, and ``JAX_PLATFORM_NAME=cpu`` selects the
CPU but STILL initialises the axon TPU plugin — which hangs process
startup for the entire duration of a tunnel wedge (>60 s observed on a
CPU-only child). The only reliable CPU opt-out is
``jax.config.update("jax_platforms", "cpu")`` in-process before anything
touches ``jax.devices()``. A missed or drifted copy of that dance in a
new entry point silently reintroduces the wedge-hang; route every entry
point through :func:`apply_platform` instead.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform"]


def apply_platform(platform: str | None = None, x64="auto") -> bool:
    """Force the JAX backend in-process and resolve x64; return ``on_tpu``.

    platform: explicit backend name ("cpu", "tpu", ...). ``None`` honors
        a ``JAX_PLATFORM_NAME=cpu`` environment request by converting it
        into the safe in-process force (the env var alone would still
        initialise the axon plugin — the measured startup hang).
    x64: ``"auto"`` enables float64 exactly when the RESOLVED platform
        is CPU — the problems' f64 default configs would otherwise run
        silently downcast to f32 (and their constructors reject that
        loudly). ``True`` forces x64 on, ``None``/``False`` leaves the
        flag untouched (axon TPUs reject f64 kernels, so never force it
        there).

    Calling this initialises the JAX backend (it reads
    ``jax.devices()``), so it must run before any other jax use and
    after all config decisions feeding into ``platform``.
    """
    import jax

    if platform is None and \
            os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
        platform = "cpu"
    if platform:
        jax.config.update("jax_platforms", platform)
    on_tpu = jax.devices()[0].platform != "cpu"
    if (x64 == "auto" and not on_tpu) or x64 is True:
        jax.config.update("jax_enable_x64", True)
    return on_tpu
