"""Mutation fuzzer for the native C++ MAT-v5 reader.

Builds valid .mat files (compressed + uncompressed, several dtypes), then
applies deterministic random mutations — byte flips, truncations, random
splices — and feeds each mutant to the native parser.  Contract under
adversarial input:

  * the process NEVER crashes (all parse paths are bounds-checked);
  * the native reader either returns a dict, or returns None / raises
    (both of which make io.matio fall back to scipy);
  * whenever BOTH the native reader and scipy parse a mutant successfully,
    they agree on names, dtypes, shapes, and bytes (the parity contract
    cannot be weakened by corruption: strictness may only ever turn into
    fallback, not into silently divergent data).

Exit code 0 = contract held for every mutant.  Run standalone for a bigger
budget: ``python scripts/fuzz_matread.py [n_mutants] [seed]``.  The suite
runs it as a subprocess (tests/test_native_matio.py) so that a segfault
fails the test instead of killing pytest.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.io as sio

from ip_avsr_tpu import native


def build_seeds(tmp):
    rng = np.random.RandomState(0)
    base = {
        "dataMatrix": rng.randn(40, 30).astype(np.float32),
        "targetsVec": rng.randint(0, 10, (40, 1)).astype(np.int32),
        "u8": rng.randint(0, 255, (8, 9)).astype(np.uint8),
        "small": np.array([[3.5]]),
    }
    paths = []
    for compress in (False, True):
        p = os.path.join(tmp, f"seed_{int(compress)}.mat")
        sio.savemat(p, base, do_compression=compress)
        paths.append(p)
    return paths


def mutate(data: bytes, rng) -> bytes:
    buf = bytearray(data)
    kind = rng.randint(3)
    if kind == 0:  # flip 1-8 random bytes
        for _ in range(rng.randint(1, 9)):
            buf[rng.randint(len(buf))] = rng.randint(256)
    elif kind == 1:  # truncate at a random offset (incl. inside the header)
        buf = buf[: rng.randint(1, len(buf))]
    else:  # splice random garbage over a random span
        off = rng.randint(len(buf))
        span = min(rng.randint(1, 64), len(buf) - off)
        buf[off : off + span] = bytes(rng.randint(0, 256, span, dtype=np.uint8))
    return bytes(buf)


def check_one(path) -> str:
    """Parse with both readers; return a tag for the outcome bucket."""
    try:
        nat = native.load_mat_native(path)
    except Exception:
        return "native_raise"  # clean Python-level failure: fallback path
    if nat is None:
        return "native_fallback"
    try:
        ref = sio.loadmat(path)
    except Exception:
        # native accepted what scipy rejects: allowed only if the native
        # result is well-formed numeric arrays (it is, by construction of
        # the wrapper); count it separately so a blowup is visible
        return "native_only"
    ref = {k: v for k, v in ref.items() if not k.startswith("__")}
    nat = {k: v for k, v in nat.items() if not k.startswith("__")}
    if set(nat) != set(ref):
        raise AssertionError(f"name sets diverge: {sorted(nat)} vs {sorted(ref)}")
    for k in nat:
        a, b = nat[k], ref[k]
        if a.dtype != b.dtype or a.shape != b.shape or not np.array_equal(
                a, b, equal_nan=True):
            raise AssertionError(
                f"key {k}: native {a.dtype}{a.shape} != scipy {b.dtype}{b.shape}"
                " or bytes diverge")
    return "both_parse_equal"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if not native.available():
        print("native reader unavailable; nothing to fuzz")
        return
    rng = np.random.RandomState(seed)
    buckets = {}
    with tempfile.TemporaryDirectory() as tmp:
        seeds = [open(p, "rb").read() for p in build_seeds(tmp)]
        mutant_path = os.path.join(tmp, "mutant.mat")
        for i in range(n):
            blob = mutate(seeds[i % len(seeds)], rng)
            with open(mutant_path, "wb") as f:
                f.write(blob)
            tag = check_one(mutant_path)
            buckets[tag] = buckets.get(tag, 0) + 1
    print(f"fuzzed {n} mutants: " + ", ".join(
        f"{k}={v}" for k, v in sorted(buckets.items())))


if __name__ == "__main__":
    main()
