"""Dispatch context for auto-selected Pallas kernels.

The heuristics in delta_kernel/lstm_kernel refuse to auto-dispatch when more
than one device is visible: an opaque ``pallas_call`` embedded in a
GSPMD-sharded program cannot be partitioned.  Inside a ``shard_map`` body,
however, shapes are already per-device and the kernels are exactly as safe
as on a single chip — the shard_map trainer (train/trainer.py mesh_mode
"shard_map") wraps its compute in :func:`local_shapes` to tell the
heuristics so.  The flag is read at TRACE time (dispatch happens in Python
while the body is being traced), which is why a context manager around the
traced body is sufficient.
"""

from __future__ import annotations

import contextlib
import contextvars

_local_shapes = contextvars.ContextVar("pallas_local_shapes", default=False)
_disabled = contextvars.ContextVar("pallas_disabled", default=False)


@contextlib.contextmanager
def local_shapes():
    """Mark the enclosed trace as operating on per-device (local) shapes."""
    token = _local_shapes.set(True)
    try:
        yield
    finally:
        _local_shapes.reset(token)


@contextlib.contextmanager
def disabled():
    """Force auto-dispatch OFF for the enclosed trace.

    Needed when a program is explicitly compiled for a NON-default device
    (e.g. bench.py's CPU-reference baselines on a TPU-default process):
    the heuristics only see the default backend, and a TPU kernel baked
    into a CPU-compiled jit fails at lowering."""
    token = _disabled.set(True)
    try:
        yield
    finally:
        _disabled.reset(token)


def shapes_are_local() -> bool:
    return _local_shapes.get()


def auto_dispatch_ok() -> bool:
    """Common gate for the kernel heuristics: a TPU backend whose traced
    shapes are per-device — either a single visible device, or a shard_map
    body that declared :func:`local_shapes`."""
    import jax

    try:
        if _disabled.get():
            return False
        if jax.default_backend() != "tpu":
            return False
        return jax.device_count() == 1 or shapes_are_local()
    except Exception:  # pragma: no cover
        return False
