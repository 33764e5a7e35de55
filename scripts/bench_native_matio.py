"""Native vs scipy .mat corpus loading benchmark.

Generates a synthetic per-video corpus (the gen_batch_from_file shape:
one compressed .mat per utterance, utils/datagen.py:5-64) and times
sequential scipy, sequential native, and the thread-pool native loader.

NOTE: the build/CI container exposes ONE CPU core (os.cpu_count() == 1), so
the thread-pool numbers there only measure overhead; the GIL-free parallel
path needs a multi-core host to show its scaling.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.io as sio

from ip_avsr_tpu import native


def main():
    nfiles = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    frames, dim = 29, 1144
    rng = np.random.RandomState(0)
    if not native.available():
        print("native reader unavailable")
        return
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(nfiles):
            p = os.path.join(td, f"v{i}.mat")
            sio.savemat(p, {"dataMatrix": rng.randn(frames, dim).astype(np.float32),
                            "targetsVec": np.array([[i % 10]], dtype=np.int32)},
                        do_compression=True)
            paths.append(p)
        for p in paths:  # warm the page cache: measure parsing, not disk
            open(p, "rb").read()

        t0 = time.perf_counter()
        ref = [sio.loadmat(p) for p in paths]
        t_scipy = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = [native.load_mat_native(p) for p in paths]
        t_nat = time.perf_counter() - t0
        workers = os.cpu_count() or 1
        t0 = time.perf_counter()
        got_par = native.load_many(paths, workers=workers)
        t_par = time.perf_counter() - t0

        for a, b, c in zip(ref, got, got_par):
            np.testing.assert_array_equal(a["dataMatrix"], b["dataMatrix"])
            np.testing.assert_array_equal(a["dataMatrix"], c["dataMatrix"])

        print(f"{nfiles} files x ({frames},{dim}) f32 compressed:")
        print(f"  scipy sequential : {t_scipy*1e3:7.1f} ms")
        print(f"  native sequential: {t_nat*1e3:7.1f} ms  ({t_scipy/t_nat:.2f}x)")
        print(f"  native {workers:2d} threads: {t_par*1e3:7.1f} ms  ({t_scipy/t_par:.2f}x)")


if __name__ == "__main__":
    main()
