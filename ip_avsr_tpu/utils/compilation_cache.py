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

    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # older/newer jax may rename flags; the cache is an optimization only
        pass
