"""Content-keyed on-disk cache for f64 operator assembly.

The mixing problem's per-kx Chebyshev-tau solution operators are
assembled and inverted ONCE in f64 numpy at problem construction
(the reference's `build_solver()` LU factorisation step,
`FWD_Solve_Poiseuille.py:1028-1043`). At the reference resolution that
costs ~10 s on this host's single CPU core; at 512x256 it is ~8 min per
stack — per process. This cache stores the assembled arrays keyed by a
hash of every parameter that enters the build, mirroring the persistent
XLA compile cache policy (utils/jaxcache.py): warm construction drops
to a disk read.

Keying is conservative: any parameter change produces a different key
(a false miss only costs a rebuild; there is no way to get a stale hit
without a hash collision). Builder-code changes auto-invalidate:
callers mix `source_digest(<builder fns/classes>)` into the key, so a
forgotten manual bump can no longer serve stale operator stacks (wrong
physics) across code revisions; `_SALT` remains as a manual escape
hatch for changes outside the digested sources.

Env:
  SMO_OP_CACHE=0       disable entirely
  SMO_OP_CACHE=<path>  cache directory (default /tmp/smo_op_cache)
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

_SALT = "v1"


def _cache_dir() -> Optional[str]:
    env = os.environ.get("SMO_OP_CACHE")
    if env == "0":
        return None
    if env == "1":
        # "1" reads as enable-the-default, not as a relative cache dir
        # named ./1 (a measured operator footgun)
        return "/tmp/smo_op_cache"
    return env or "/tmp/smo_op_cache"


def source_digest(*objs) -> str:
    """Digest of the SOURCE of the given functions/classes, for mixing
    into cache keys: editing a digested builder auto-invalidates its
    entries. Falls back to repr() for objects without retrievable
    source (builtins, REPL definitions) — conservative either way."""
    import inspect

    h = hashlib.sha256()
    for o in objs:
        try:
            h.update(inspect.getsource(o).encode())
        except (OSError, TypeError):
            h.update(repr(o).encode())
    return h.hexdigest()[:16]


def cache_key(parts: dict) -> str:
    """Stable hash of the build parameters (sorted repr + version salt)."""
    blob = _SALT + "|" + repr(sorted(parts.items()))
    return hashlib.sha256(blob.encode()).hexdigest()[:32]


def cached_arrays(parts: dict,
                  builder: Callable[[], Sequence[Optional[np.ndarray]]],
                  names: Sequence[str]) -> Tuple[Optional[np.ndarray], ...]:
    """Return `builder()`'s tuple of (possibly-None) numpy arrays,
    serving it from / saving it to the on-disk cache. Writes are atomic
    (tmp file + rename) so a crashed process never leaves a torn entry;
    unreadable entries are rebuilt and rewritten."""
    d = _cache_dir()
    if d is None:
        return tuple(builder())
    path = os.path.join(d, f"ops_{cache_key(parts)}.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return tuple(z[n] if f"has_{n}" not in z.files or z[f"has_{n}"]
                             else None for n in names)
        except Exception:
            try:
                os.unlink(path)   # torn/corrupt entry: rebuild below
            except OSError:
                pass
    arrays = tuple(builder())
    payload = {}
    for n, a in zip(names, arrays):
        if a is None:
            payload[f"has_{n}"] = np.asarray(False)
            payload[n] = np.zeros(0)
        else:
            payload[f"has_{n}"] = np.asarray(True)
            payload[n] = a
    try:
        os.makedirs(d, exist_ok=True)
        # suffix must END in .npz: np.savez appends ".npz" otherwise and
        # the atomic rename below would miss the actual written file
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
        os.close(fd)
        np.savez(tmp, **payload)
        os.replace(tmp, path)
    except OSError:
        pass   # cache is best-effort: disk-full/readonly must not fail builds
    return arrays
