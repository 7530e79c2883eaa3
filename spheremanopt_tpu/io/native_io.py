"""ctypes bindings for the native async record writer (native/fastio.cpp).

Builds the shared library on first use (g++ -O3, cached in
native/build/). Provides:

  * AsyncRecordWriter — non-blocking named-record writer used for
    per-iteration optimiser checkpoints and trajectory snapshots
  * read_records       — pure-python reader with CRC verification

Falls back gracefully: callers should catch NativeIOUnavailable and use
the npz path (io.checkpoint / io.timeseries) when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "fastio.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libfastio.so")

_MAGIC = b"SMO1\x00\x00\x00\x01"


class NativeIOUnavailable(RuntimeError):
    pass


_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise NativeIOUnavailable(f"failed to build fastio: {e}") from e


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else None
    if not os.path.exists(_LIB):
        if src_mtime is None:
            raise NativeIOUnavailable(f"neither {_LIB} nor {_SRC} exists")
        rebuild = True
    else:
        rebuild = src_mtime is not None and os.path.getmtime(_LIB) < src_mtime
    if rebuild:
        _build()
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        # A stale/incompatible binary (e.g. built on a different
        # arch/glibc) must not break the documented graceful-fallback
        # contract: rebuild from source once, else report unavailable.
        if src_mtime is None:
            raise NativeIOUnavailable(f"cannot load {_LIB}: {e}") from e
        _build()
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e2:
            raise NativeIOUnavailable(
                f"rebuilt {_LIB} still fails to load: {e2}"
            ) from e2
    lib.fio_open.restype = ctypes.c_void_p
    lib.fio_open.argtypes = [ctypes.c_char_p]
    lib.fio_enqueue.restype = ctypes.c_int
    lib.fio_enqueue.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_void_p, ctypes.c_int64]
    lib.fio_flush.restype = ctypes.c_int
    lib.fio_flush.argtypes = [ctypes.c_void_p]
    lib.fio_close.restype = ctypes.c_int
    lib.fio_close.argtypes = [ctypes.c_void_p]
    lib.fio_stats_records.restype = ctypes.c_int64
    lib.fio_stats_records.argtypes = [ctypes.c_void_p]
    lib.fio_stats_bytes.restype = ctypes.c_int64
    lib.fio_stats_bytes.argtypes = [ctypes.c_void_p]
    lib.fio_crc32.restype = ctypes.c_uint32
    lib.fio_crc32.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fio_error.restype = ctypes.c_int
    lib.fio_error.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class AsyncRecordWriter:
    """Named-array record writer; enqueue returns immediately, a C++
    thread drains to disk. Arrays are serialised as
    '<name>|<dtype>|<shape csv>' headers with raw payloads."""

    def __init__(self, path: str):
        lib = _load()
        self._lib = lib
        self._handle = lib.fio_open(path.encode())
        if not self._handle:
            raise NativeIOUnavailable(f"fio_open failed for {path}")
        self.path = path

    def write(self, name: str, array) -> None:
        if "|" in name:
            raise ValueError(f"record name must not contain '|': {name!r}")
        a = np.ascontiguousarray(np.asarray(array))
        # byte-order-agnostic dtypes (bool, int8, ...) have .str == '|b1'
        # etc. — the leading '|' would corrupt the 3-field tag format, so
        # strip it (np.dtype roundtrips the bare code fine)
        dt = a.dtype.str.lstrip("|")
        tag = f"{name}|{dt}|{','.join(map(str, a.shape))}"
        rc = self._lib.fio_enqueue(
            self._handle, tag.encode(), a.ctypes.data_as(ctypes.c_void_p),
            a.nbytes,
        )
        if rc != 0:
            raise IOError(f"fio_enqueue failed for {name} "
                          "(writer error or queue cap exceeded)")

    def flush(self) -> None:
        """Block until every enqueued record reached the OS. Raises if
        any write failed (disk full / EIO) — flush() returning is the
        durability signal, so it must not lie."""
        if self._lib.fio_flush(self._handle) != 0:
            raise IOError(
                f"native writer reported an I/O failure for {self.path} "
                "(disk full or write error); records since the failure "
                "were NOT persisted")

    @property
    def stats(self):
        return {
            "records": self._lib.fio_stats_records(self._handle),
            "bytes": self._lib.fio_stats_bytes(self._handle),
        }

    def close(self) -> None:
        if self._handle:
            self._lib.fio_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_records(path: str, verify_crc: bool = True) -> Dict[str, np.ndarray]:
    """Load all records; later records with the same name win (so a
    rewritten progress checkpoint reads back its newest state)."""
    lib = _load()
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise IOError(f"{path}: bad magic")
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (name_len,) = np.frombuffer(head, np.uint32)
            tag_b = f.read(int(name_len))
            len_b = f.read(8)
            crc_b = f.read(4)
            if len(tag_b) < int(name_len) or len(len_b) < 8 or len(crc_b) < 4:
                break  # truncated header (crash mid-write): ignore tail
            tag = tag_b.decode(errors="replace")
            (payload_len,) = np.frombuffer(len_b, np.uint64)
            (crc,) = np.frombuffer(crc_b, np.uint32)
            payload = f.read(int(payload_len))
            if len(payload) < int(payload_len):
                break  # truncated payload: ignore tail
            if verify_crc:
                got = lib.fio_crc32(payload, len(payload))
                if np.uint32(got) != crc:
                    raise IOError(f"{path}: CRC mismatch for record {tag}")
            # rsplit: the dtype field of legacy files may itself start
            # with '|' (byte-order-agnostic codes); name is '|'-free
            name, rest = tag.split("|", 1)
            dtype, shape = rest.rsplit("|", 1)
            shape = tuple(int(s) for s in shape.split(",") if s)
            # .copy(): frombuffer over the read bytes is read-only; the
            # npz loaders return writable arrays and restore paths mutate
            # loaded state in place
            out[name] = (np.frombuffer(payload, np.dtype(dtype))
                         .reshape(shape).copy())
    return out
