"""Persistent on-disk XLA compilation cache.

On the axon TPU every program costs ~20-40 s through the remote compile
helper; the persistent cache works through the tunnel (measured,
CLAUDE.md platform rule 8) and makes warm processes skip those compiles
entirely. On CPU it likewise caches the test suite's large f64
executables across runs. Safe to call unconditionally: keying is by
HLO + compile flags, and failures degrade to a no-op.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory.

    Returns the directory used, or None if the backend rejected it.
    Honours `SMO_JAX_CACHE` (default `/tmp/smo_jax_cache`).
    """
    try:
        import jax

        d = path or os.environ.get("SMO_JAX_CACHE", "/tmp/smo_jax_cache")
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return d
    except Exception as e:
        # degrade to a no-op, but NOT silently: without the cache every
        # heavy TPU process repays ~20-40 s/program of remote compiles
        # (CLAUDE.md rule 8) and no caller checks the return value
        import warnings

        warnings.warn(f"persistent XLA compile cache disabled: {e!r} — "
                      "every program will pay its full compile",
                      RuntimeWarning)
        return None
