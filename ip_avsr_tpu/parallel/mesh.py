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


def make_mesh_nd(shape: dict, devices=None) -> Mesh:
    """Mesh from an ordered ``{axis_name: size}`` dict, e.g.
    ``{"data": 4, "model": 2}`` — the dp x tp layout.  Uses the first
    ``prod(sizes)`` devices."""
    sizes = [int(s) for s in shape.values()]
    n = 1
    for s in sizes:
        n *= s
    devices = list(jax.devices() if devices is None else devices)
    if len(devices) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(sizes), tuple(shape.keys()))


def adenet_param_rules(model_axis: str = "model"):
    """Default tensor-parallel sharding rules for AdeNet parameter trees.

    The FLOPs (and the parameter bytes) of these models live in the dense
    encoder stacks (2000/1000/500/50 per stream, SURVEY.md §2.2); the LSTM
    and head weights are comparatively tiny and stay replicated — sharding
    them would put a collective inside every scan step for negligible memory
    relief (docs/SCALING.md).  Rule: every encoder weight matrix is sharded
    on its OUTPUT (hidden-units) axis, ``P(None, model)``; its bias vector is
    sharded to match; everything else replicated.  Column-sharded weights
    need no collective in the forward (each shard computes its own slice of
    the activations) — XLA inserts the all-gather only where the next
    operand requires it.
    """

    def rule(path, leaf) -> P:
        names = [str(getattr(k, "key", "")) for k in path]
        if "encoder" in names:
            if names[-1] == "w" and leaf.ndim == 2:
                return P(None, model_axis)
            if names[-1] == "b" and leaf.ndim == 1:
                return P(model_axis)
        return P()

    return rule


def param_shardings(params, mesh: Mesh, rules=None,
                    model_axis: str = "model"):
    """NamedSharding pytree for a parameter tree under tensor parallelism.

    ``rules(path, leaf) -> PartitionSpec`` (default:
    :func:`adenet_param_rules`).  A rule whose sharded dimension does not
    divide the mesh axis size is demoted to replicated — uneven shards work
    under GSPMD but pessimize every consumer, and at these model sizes
    replication is strictly better than padding.
    """
    rules = rules or adenet_param_rules(model_axis)

    def one(path, leaf):
        spec = rules(path, leaf)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            # validate against the size of the axes the spec ACTUALLY names
            # (custom rules may shard over any axis, incl. tuples); an axis
            # the mesh does not have demotes to replicated like any other
            # inapplicable rule (e.g. the default encoder rules on a 1-D
            # data-only mesh) instead of raising KeyError
            axes = axis if isinstance(axis, tuple) else (axis,)
            if any(a not in mesh.shape for a in axes):
                spec = P()
                break
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def opt_state_shardings(opt_state, params, param_sh, mesh: Mesh):
    """Shardings for an optimizer-state tree: any top-level entry that is
    tree-congruent with ``params`` (adam's m/v, adadelta's accu/delta_accu,
    momentum's velocity) mirrors the parameter shardings; everything else
    (step counters) is replicated.  Works for every optimizer in
    train/optimizers.py without optimizer-specific knowledge."""
    p_struct = jax.tree_util.tree_structure(params)
    rep = replicated_sharding(mesh)

    def one(entry):
        if jax.tree_util.tree_structure(entry) == p_struct:
            return param_sh
        return jax.tree_util.tree_map(lambda _: rep, entry)

    if isinstance(opt_state, dict):
        return {k: one(v) for k, v in opt_state.items()}
    return jax.tree_util.tree_map(lambda _: rep, opt_state)


def zero1_spec(leaf, size: int, axis_name: str = "data") -> P:
    """ZeRO-1 PartitionSpec for one optimizer-moment leaf: shard the largest
    axis divisible by ``size``; replicate leaves with no such axis (small
    biases/scalars — their bytes are negligible)."""
    if getattr(leaf, "ndim", 0) == 0:
        return P()
    dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
    for d in dims:
        if leaf.shape[d] % size == 0 and leaf.shape[d] >= size:
            spec = [None] * leaf.ndim
            spec[d] = axis_name
            return P(*spec)
    return P()


def zero1_opt_state_shardings(opt_state, params, mesh: Mesh,
                              axis_name: str = "data"):
    """ZeRO-1 shardings for an optimizer-state tree: every top-level entry
    that is tree-congruent with ``params`` (adam's m/v, adadelta's
    accumulators, momentum's velocity) has each leaf sharded over the
    ``data`` axis via :func:`zero1_spec`; everything else (step counters)
    replicated.

    With the batch sharded on the same axis and parameters replicated, the
    SPMD partitioner turns the gradient all-reduce into a reduce-scatter
    feeding per-device moment/update shards, followed by one all-gather of
    the parameter update — the classic ZeRO-1 schedule, derived entirely
    from sharding annotations.  Per-device optimizer bytes drop ~n_dev-fold;
    collective bytes are unchanged (an all-reduce IS a reduce-scatter +
    all-gather)."""
    size = mesh.shape[axis_name]
    p_struct = jax.tree_util.tree_structure(params)
    rep = replicated_sharding(mesh)

    def shard_like_params(entry):
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(mesh,
                                       zero1_spec(leaf, size, axis_name)),
            entry)

    def one(entry):
        if jax.tree_util.tree_structure(entry) == p_struct:
            return shard_like_params(entry)
        return jax.tree_util.tree_map(lambda _: rep, entry)

    if isinstance(opt_state, dict):
        return {k: one(v) for k, v in opt_state.items()}
    return jax.tree_util.tree_map(lambda _: rep, opt_state)


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
