"""Native (C++) MAT-v5 reader: parity with scipy.io.loadmat.

The native reader (ip_avsr_tpu/native/matread.cc) handles the strict numeric
subset that covers the whole .mat ABI; everything else must fall back to
scipy with identical observable behavior through io.matio.load_mat_file.
"""

import os

import numpy as np
import pytest
import scipy.io as sio

from ip_avsr_tpu import native
from ip_avsr_tpu.io import matio

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native reader unavailable (no compiler)")


def _cases():
    rng = np.random.RandomState(0)
    return {
        "f32": rng.randn(29, 40).astype(np.float32),
        "f64": rng.randn(5, 7),
        "u8": rng.randint(0, 255, (30, 40)).astype(np.uint8),
        "i16": rng.randint(-99, 99, (4, 4)).astype(np.int16),
        "i32": rng.randint(-5, 5, (10,)).astype(np.int32),
        "i64": rng.randint(-5, 5, (3, 2)).astype(np.int64),
        "empty": np.zeros((0, 3), np.float64),
        "scalar": np.array([[3.5]]),
        "three_d": rng.randn(3, 4, 5).astype(np.float32),
    }


@pytest.mark.parametrize("compress", [False, True])
def test_numeric_parity_with_scipy(tmp_path, compress):
    p = os.path.join(tmp_path, "t.mat")
    sio.savemat(p, _cases(), do_compression=compress)
    ref = sio.loadmat(p)
    got = native.load_mat_native(p)
    assert got is not None
    for k in _cases():
        assert ref[k].dtype == got[k].dtype
        assert ref[k].shape == got[k].shape
        np.testing.assert_array_equal(ref[k], got[k])
    got["f32"][0, 0] = 1.0  # arrays must be writable like scipy's


def test_fortran_order_semantics(tmp_path):
    """The reorder_data F-vs-C trap (SURVEY.md §7) lives downstream of the
    loader; the loader itself must hand back the exact element order scipy
    does for non-contiguous saves."""
    p = os.path.join(tmp_path, "f.mat")
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    sio.savemat(p, {"x": x.T})  # save a transposed (non-C-contiguous) view
    np.testing.assert_array_equal(sio.loadmat(p)["x"],
                                  native.load_mat_native(p)["x"])


def test_unsupported_content_falls_back(tmp_path):
    p = os.path.join(tmp_path, "s.mat")
    sio.savemat(p, {"s": "hello", "x": np.ones((2, 2))})
    assert native.load_mat_native(p) is None
    d = matio.load_mat_file(p)  # transparently served by scipy
    np.testing.assert_array_equal(d["x"], np.ones((2, 2)))
    assert "hello" in str(d["s"])


def test_corrupt_file_falls_back_to_scipy_error(tmp_path):
    p = os.path.join(tmp_path, "bad.mat")
    with open(p, "wb") as f:
        f.write(b"not a mat file at all" * 10)
    assert native.load_mat_native(p) is None
    with pytest.raises(Exception):
        matio.load_mat_file(p)


def test_load_mat_files_parallel_order_and_fallback(tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(12):
        p = os.path.join(tmp_path, f"v{i}.mat")
        if i == 5:  # one scipy-only file in the middle
            sio.savemat(p, {"s": "text", "targetsVec": np.array([[i]])})
        else:
            sio.savemat(p, {"dataMatrix": rng.randn(7, 9).astype(np.float32),
                            "targetsVec": np.array([[i]])}, do_compression=True)
        paths.append(p)
    outs = matio.load_mat_files(paths, workers=4)
    for i, d in enumerate(outs):
        assert int(np.asarray(d["targetsVec"]).ravel()[0]) == i


def test_dbn_checkpoint_roundtrip_through_native(tmp_path):
    """The w1..wN ABI (dbn/extractNN.m:86-105) read back through the native
    path must load bit-identically."""
    rng = np.random.RandomState(2)
    weights = [rng.randn(8, 6).astype(np.float32), rng.randn(6, 4).astype(np.float32)]
    biases = [rng.randn(6).astype(np.float32), rng.randn(4).astype(np.float32)]
    p = os.path.join(tmp_path, "dbn.mat")
    matio.save_dbn_mat(weights, biases, p)
    assert native.load_mat_native(p) is not None  # served natively
    w2, b2 = matio.load_dbn_mat(p, n_layers=2)
    for a, b in zip(weights, w2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(biases, b2):
        np.testing.assert_array_equal(a, b)


def test_env_kill_switch(tmp_path, monkeypatch):
    monkeypatch.setenv("IP_AVSR_NATIVE", "0")
    assert not native.available()
    p = os.path.join(tmp_path, "t.mat")
    sio.savemat(p, {"x": np.ones((2, 2))})
    np.testing.assert_array_equal(matio.load_mat_file(p)["x"], np.ones((2, 2)))


def test_logical_arrays_fall_back(tmp_path):
    """MATLAB logical arrays load as bool through scipy; the strict parser
    must defer rather than return uint8 for them."""
    p = os.path.join(tmp_path, "l.mat")
    sio.savemat(p, {"m": np.array([[True, False], [False, True]])})
    if sio.loadmat(p)["m"].dtype == np.bool_:
        assert native.load_mat_native(p) is None
    d = matio.load_mat_file(p)
    assert d["m"].dtype == sio.loadmat(p)["m"].dtype


def test_fuzz_mutations_never_crash_or_diverge():
    """Mutation fuzz of the C++ parser (scripts/fuzz_matread.py): random
    byte flips / truncations / splices of valid .mat files must never crash
    the process, and whenever both the native reader and scipy parse a
    mutant, they must agree byte-for-byte.  Runs in a SUBPROCESS so a
    segfault fails this test instead of killing the pytest worker.  (The
    fuzzer already caught one real divergence: NUL-in-name truncation
    through the C string interface — now a strict-parser fallback.)"""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                          "fuzz_matread.py")
    proc = subprocess.run([sys.executable, script, "200", "0"],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, (
        f"fuzzer failed (rc={proc.returncode}; negative = signal/crash):\n"
        f"{proc.stdout}\n{proc.stderr}")
    assert "fuzzed 200 mutants" in proc.stdout
