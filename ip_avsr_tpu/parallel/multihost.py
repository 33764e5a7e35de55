"""Multi-host input pipeline helpers (DCN-side of the scale-out design).

Within a slice, batches shard over ICI (parallel/mesh.py).  Across hosts,
each process loads only its local shard of the global batch and the global
array is assembled from per-process shards without any cross-host data
movement — the standard JAX multi-host input recipe
(``jax.make_array_from_process_local_data``).  The reference has no
multi-host story at all (SURVEY.md §2.6); this is the rebuild's new
capability, degraded gracefully to a plain device_put on a single host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_local_slice(global_batch: int) -> slice:
    """The half-open [start, stop) row range this process should load.

    The global batch must divide evenly by the process count — uneven shards
    cannot be expressed to ``make_array_from_process_local_data`` (every
    process must contribute the same extent along the sharded axis).  Pad the
    global batch to a process-count multiple first (see
    parallel/mesh.pad_batch_to_multiple) if it doesn't divide.
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} must be a multiple of the process "
            f"count {n_proc}; pad it first (mesh.pad_batch_to_multiple)")
    per = global_batch // n_proc
    idx = jax.process_index()
    return slice(idx * per, (idx + 1) * per)


def global_batch_from_local(mesh: Mesh, local_arrays, global_batch: int = None,
                            axis_name: str = "data"):
    """Assemble globally-sharded arrays from per-process local shards.

    ``local_arrays`` is a pytree of host arrays holding THIS process's rows
    of the global batch (use :func:`process_local_slice` to know which);
    ``global_batch`` is the true global row count (defaults to
    ``local_rows * process_count``, which is only correct because
    :func:`process_local_slice` enforces even shards).  Returns a pytree of
    jax Arrays sharded along ``axis_name`` of ``mesh``.  On a single-process
    runtime this reduces to a sharded device_put.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def assemble(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        rows = global_batch if global_batch is not None \
            else x.shape[0] * jax.process_count()
        global_shape = (rows,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(assemble, local_arrays)
