"""Persistent XLA compilation cache setup.

TPU compiles in this environment go through a remote compile service and can
take minutes for large graphs; the persistent cache makes any program's
second run (across processes) near-instant.  Call :func:`enable` early, before
the first jit compilation.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/ip_avsr_tpu_xla")


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    try:
        # inside the try: an unwritable HOME (read-only container) must
        # degrade to uncached compilation, not crash the program
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Threshold 0 so every client-side artifact is cached (the axon TPU
        # backend's compile() returns in <1s, under any positive threshold).
        # KNOWN LIMIT of this environment: the backend defers the real TPU
        # compilation to FIRST EXECUTION inside a remote helper, outside the
        # persistent cache's reach — measured: compile() 0.05s, first
        # execution ~100s, second 0.04s, across processes every time.  The
        # cache still covers CPU runs and the local compile steps; the
        # per-process first-execution cost of big TPU programs is an
        # environment property, not something this flag can remove.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # older/newer jax may rename flags; the cache is an optimization only
        pass
