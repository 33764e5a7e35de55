"""Device mesh + sharding helpers: TPU-native scale-out.

The reference trains on a single Theano device with no distributed execution
at all (SURVEY.md §2.6).  Here scale-out is first-class and expressed the
JAX way: a named :class:`jax.sharding.Mesh` over the available devices, batch
data sharded along the ``data`` axis (riding ICI within a slice), parameters
and optimizer state replicated, and XLA inserting the gradient all-reduce
(psum) automatically from the sharding annotations — no hand-written
collectives or external comm library.

The same code path runs single-chip (mesh of one device) and multi-chip; the
driver validates the multi-chip path on a virtual CPU mesh via
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; all other axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place every array's leading axis across the mesh's data axis."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) on every device."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(arrays: Sequence[np.ndarray], multiple: int):
    """Zero-pad the leading axis to a multiple of the mesh size so shards are
    equal.  Returns (padded_arrays, original_batch).  Pair with a zero mask /
    zero sample weight so pad rows don't contribute to the loss."""
    b = arrays[0].shape[0]
    target = int(-(-b // multiple) * multiple)
    if target == b:
        return list(arrays), b
    out = []
    for a in arrays:
        pad = np.zeros((target - b,) + a.shape[1:], a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    return out, b
