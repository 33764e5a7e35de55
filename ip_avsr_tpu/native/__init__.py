"""Native (C++) data-loader bindings.

``matread.cc`` is a strict little-endian MAT-v5 parser for the numeric
arrays that make up this framework's entire ``.mat`` ABI (datasets,
``w1..wN`` checkpoints, LSTM bundles — SURVEY.md §1).  It is compiled on
first use (``make`` in this directory; g++ + libz only) and driven through
ctypes, which releases the GIL for the duration of each call — so
:func:`load_many` parses and inflates many corpus shards in parallel from an
ordinary Python thread pool, the role the reference fills with sequential
scipy.io.loadmat calls in its inner batch loop (utils/datagen.py:5-64).

Anything the strict parser does not support (cell/char/struct/sparse/
complex/big-endian) makes :func:`load_mat_native` return ``None`` and the
caller (io/matio.load_mat_file) falls back to scipy wholesale, so observable
behavior never diverges.  Set ``IP_AVSR_NATIVE=0`` to disable entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libipavsr_matread.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False

# MAT v5 storage (mi*) types -> numpy dtypes
_MITYPES = {1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16, 5: np.int32,
            6: np.uint32, 7: np.float32, 9: np.float64, 12: np.int64,
            13: np.uint64}
# MATLAB array classes (mx*) -> numpy dtypes
_CLASSES = {6: np.float64, 7: np.float32, 8: np.int8, 9: np.uint8,
            10: np.int16, 11: np.uint16, 12: np.int32, 13: np.uint32,
            14: np.int64, 15: np.uint64}


def available() -> bool:
    """True when the native library is usable (built or buildable)."""
    if os.environ.get("IP_AVSR_NATIVE", "1") == "0":
        return False
    return _load_lib() is not None


def _load_lib():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_DIR, "matread.cc")
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(src)
                     and os.path.getmtime(src) > os.path.getmtime(_SO)))
        if stale:  # also rebuilds when matread.cc is newer than the .so —
            try:   # a stale prebuilt binary silently shadowed source fixes
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.ipav_open.restype = ctypes.c_void_p
        lib.ipav_open.argtypes = [ctypes.c_char_p]
        lib.ipav_error.restype = ctypes.c_char_p
        lib.ipav_error.argtypes = [ctypes.c_void_p]
        lib.ipav_count.restype = ctypes.c_int
        lib.ipav_count.argtypes = [ctypes.c_void_p]
        lib.ipav_name.restype = ctypes.c_char_p
        lib.ipav_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_mitype.restype = ctypes.c_int
        lib.ipav_mitype.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_class.restype = ctypes.c_int
        lib.ipav_class.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_ndim.restype = ctypes.c_int
        lib.ipav_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_dims.restype = ctypes.POINTER(ctypes.c_int64)
        lib.ipav_dims.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_data.restype = ctypes.c_void_p
        lib.ipav_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_nbytes.restype = ctypes.c_int64
        lib.ipav_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ipav_close.restype = None
        lib.ipav_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def load_mat_native(path) -> Optional[dict]:
    """Parse one .mat file.  Returns a scipy.io.loadmat-compatible dict
    (storage dtypes, Fortran data order, min-2-D arrays), or ``None`` when
    the file needs the scipy fallback."""
    if os.environ.get("IP_AVSR_NATIVE", "1") == "0":
        return None  # kill switch also honored on direct calls, not just available()
    lib = _load_lib()
    if lib is None:
        return None
    h = lib.ipav_open(os.fsencode(str(path)))
    try:
        err = lib.ipav_error(h)
        if err:
            return None
        out = {"__header__": b"MATLAB 5.0 MAT-file (ip_avsr_tpu native reader)",
               "__version__": "1.0", "__globals__": []}
        for i in range(lib.ipav_count(h)):
            mitype = lib.ipav_mitype(h, i)
            mclass = lib.ipav_class(h, i)
            if mitype not in _MITYPES or mclass not in _CLASSES:
                return None
            nd = lib.ipav_ndim(h, i)
            dims = [lib.ipav_dims(h, i)[j] for j in range(nd)]
            nbytes = lib.ipav_nbytes(h, i)
            if nbytes:
                # one copy: view the C buffer, reshape Fortran, materialize
                buf = (ctypes.c_char * nbytes).from_address(lib.ipav_data(h, i))
                arr = (np.frombuffer(buf, dtype=_MITYPES[mitype])
                       .reshape(dims, order="F").copy(order="F"))
            else:
                arr = np.empty(dims, dtype=_MITYPES[mitype], order="F")
            # scipy's default mat_dtype=False keeps the STORAGE dtype, so no
            # upcast to the class dtype here — parity with loadmat
            out[lib.ipav_name(h, i).decode()] = arr
        return out
    except Exception:
        # any native-side surprise (non-UTF8 name, reshape mismatch on a
        # crafted file, ...) defers to the scipy fallback — the documented
        # contract is "returns None when the file needs scipy"
        return None
    finally:
        lib.ipav_close(h)


def load_many(paths, workers: Optional[int] = None, fallback=None) -> list:
    """Parse many .mat files in parallel (C parser + zlib run without the
    GIL).  ``fallback(path)`` handles files the native parser rejects
    (default: scipy.io.loadmat).  Returns dicts in input order."""
    if fallback is None:
        import scipy.io as sio

        fallback = sio.loadmat
    if os.environ.get("IP_AVSR_NATIVE", "1") == "0":
        return [fallback(p) for p in paths]  # kill switch: pure-fallback path
    if workers is None:
        workers = min(16, os.cpu_count() or 4)

    def one(p):
        d = load_mat_native(p)
        return d if d is not None else fallback(p)

    if workers <= 1 or len(paths) <= 1:
        return [one(p) for p in paths]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(one, paths))
