"""Native async record writer (C++ fastio) tests."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from spheremanopt_tpu.io import native_io


@pytest.fixture(scope="module")
def available():
    try:
        native_io._load()
    except native_io.NativeIOUnavailable as e:  # pragma: no cover
        pytest.skip(f"no native toolchain: {e}")
    return True


def test_roundtrip_arrays(tmp_path, available):
    path = str(tmp_path / "traj.smo")
    rng = np.random.RandomState(0)
    arrays = {
        "u": rng.randn(128).astype(np.float32),
        "B": (rng.randn(3, 8, 8, 5) + 1j * rng.randn(3, 8, 8, 5)).astype(np.complex64),
        "step": np.asarray([42], np.int64),
    }
    with native_io.AsyncRecordWriter(path) as w:
        for k, v in arrays.items():
            w.write(k, v)
        w.flush()
        assert w.stats["records"] == 3
    loaded = native_io.read_records(path)
    for k, v in arrays.items():
        np.testing.assert_array_equal(loaded[k], v)


def test_last_record_wins(tmp_path, available):
    path = str(tmp_path / "progress.smo")
    with native_io.AsyncRecordWriter(path) as w:
        for i in range(5):
            w.write("x_opt", np.full(16, float(i)))
        w.flush()
    loaded = native_io.read_records(path)
    np.testing.assert_array_equal(loaded["x_opt"], np.full(16, 4.0))


def test_truncated_tail_ignored(tmp_path, available):
    path = str(tmp_path / "crash.smo")
    with native_io.AsyncRecordWriter(path) as w:
        w.write("good", np.arange(10.0))
        w.flush()
    # simulate a crash mid-record: append garbage header
    with open(path, "ab") as f:
        f.write(np.uint32(4).tobytes() + b"bad!" + np.uint64(1 << 30).tobytes())
    loaded = native_io.read_records(path)
    assert "good" in loaded and "bad!" not in loaded


def test_crc_detects_corruption(tmp_path, available):
    path = str(tmp_path / "corrupt.smo")
    with native_io.AsyncRecordWriter(path) as w:
        w.write("x", np.arange(100.0))
        w.flush()
    data = bytearray(open(path, "rb").read())
    data[-8] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError, match="CRC"):
        native_io.read_records(path)


def test_throughput_nonblocking(tmp_path, available):
    """Enqueue must be much faster than synchronous writes: 50 x 1 MB
    enqueues should return quickly while the writer drains."""
    import time

    path = str(tmp_path / "big.smo")
    block = np.random.RandomState(1).randn(131072).astype(np.float64)  # 1 MB
    w = native_io.AsyncRecordWriter(path)
    t0 = time.perf_counter()
    for i in range(50):
        w.write(f"snap_{i}", block)
    enqueue_t = time.perf_counter() - t0
    w.flush()
    w.close()
    assert enqueue_t < 2.0, enqueue_t
    loaded = native_io.read_records(path)
    assert len(loaded) == 50


def test_byteorder_agnostic_dtypes_roundtrip(tmp_path, available):
    """bool/int8 dtypes have numpy .str codes with a leading '|'
    ('|b1'), which corrupted the 3-field record tag and made the WHOLE
    file unreadable (self-review r3). Also: loaded arrays must be
    writable like the npz loaders' (frombuffer alone is read-only)."""
    path = str(tmp_path / "b.smo")
    with native_io.AsyncRecordWriter(path) as w:
        w.write("converged", np.asarray(True))
        w.write("flags", np.array([1, 0, 1], np.int8))
        w.write("x", np.arange(4.0))
        w.flush()
    out = native_io.read_records(path)
    assert bool(out["converged"]) is True
    np.testing.assert_array_equal(out["flags"], [1, 0, 1])
    out["x"][0] = 7.0   # writable, matching load_progress semantics
    with pytest.raises(ValueError, match=r"\|"):
        with native_io.AsyncRecordWriter(str(tmp_path / "c.smo")) as w:
            w.write("bad|name", np.arange(3))
