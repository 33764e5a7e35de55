"""Sequence parallelism (sp): shard the TIME axis across a mesh axis.

The reference is single-device and its utterances are short (T ~ 30 frames,
SURVEY.md §5 "long-context: absent"), so sp is not needed for parity — this
module is the scale-out design for the regime the reference never reached:
long feature streams (e.g. `embed_temporal_info`-style stacked windows or
un-segmented recordings) where one device can't hold a batch of full
sequences, or where the frame-parallel prefix dominates.

Design (Megatron-SP-shaped, but for this architecture):

* The per-stream prefix — dense encoder, DeltaLayer, dropout — is
  frame-parallel except for the delta's +/-window neighborhood.  It runs
  under ``shard_map`` with batch sharded on the ``data`` axis and time on the
  ``seq`` axis.  The delta window is satisfied with an explicit **halo
  exchange**: each shard ships its ``window`` boundary frames to its
  neighbors over ICI with ``lax.ppermute`` (two non-wrapping shifts), the
  outermost shards edge-replicate — reproducing the reference's global
  edge padding (utils/signal.py:59-80) exactly.  Acceleration coefficients
  re-exchange the freshly computed deltas (delta-of-delta with its own edge
  padding), so a single-hop halo of ``window`` frames suffices per order.
* The LSTM stage is sequential in time, so after the prefix the features are
  resharded time->batch with one all-to-all (expressed as a sharding
  constraint ``P((data, seq))`` on the batch axis — XLA inserts the
  collective), and the recurrence runs fully data-parallel over
  data x seq devices.  No device idles in either stage.

Everything differentiates: ``ppermute``'s transpose is the reverse permute,
so the same halo pattern (in reverse) carries gradients back across shard
boundaries automatically.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ip_avsr_tpu.models import adenet


def halo_exchange_time(x: jnp.ndarray, halo: int, axis_name: str,
                       n_shards: int) -> jnp.ndarray:
    """Extend a time-sharded block with ``halo`` frames from each neighbor.

    ``x`` is this shard's (B, T_local, D) block of a global (B, T, D) array
    sharded along time on mesh axis ``axis_name``.  Returns
    (B, T_local + 2*halo, D).  The first/last shards edge-replicate their own
    boundary frame, which equals global edge padding.  Requires
    ``T_local >= halo`` (single-hop exchange).
    """
    if halo <= 0:
        return x
    T_local = x.shape[1]
    if T_local < halo:
        raise ValueError(
            f"sequence-parallel halo needs T_local >= window: {T_local} < {halo} "
            f"(use fewer 'seq' shards or a smaller delta window)")
    idx = jax.lax.axis_index(axis_name)
    # ship boundary frames to the neighbors; non-wrapping, so the outermost
    # shards receive zeros and overwrite them with edge replication below
    from_left = jax.lax.ppermute(
        x[:, -halo:, :], axis_name, [(i, i + 1) for i in range(n_shards - 1)])
    from_right = jax.lax.ppermute(
        x[:, :halo, :], axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    first = jnp.broadcast_to(x[:, :1, :], (x.shape[0], halo, x.shape[2]))
    last = jnp.broadcast_to(x[:, -1:, :], (x.shape[0], halo, x.shape[2]))
    left_pad = jnp.where(idx == 0, first, from_left)
    right_pad = jnp.where(idx == n_shards - 1, last, from_right)
    return jnp.concatenate([left_pad, x, right_pad], axis=1)


def _delta_from_ext(x_ext: jnp.ndarray, window: int) -> jnp.ndarray:
    """Delta coefficients for the centre block of an already-extended
    (B, T_local + 2*window, D) array — the one shared tap formula
    (ops/delta.delta_taps_from_padded), fed the halo-exchanged block
    instead of an edge-padded one."""
    from ip_avsr_tpu.ops.delta import delta_taps_from_padded

    return delta_taps_from_padded(x_ext, window)


def append_delta_coeff_sp(x: jnp.ndarray, window: int, axis_name: str,
                          n_shards: int) -> jnp.ndarray:
    """Sequence-parallel DeltaLayer body: [x, delta, accel] on the feature
    axis of a time-sharded block.  Call inside ``shard_map``.  Matches
    ops/delta.append_delta_coeff on the gathered result exactly: each order
    exchanges a fresh halo, so acceleration sees globally-exact deltas."""
    d = _delta_from_ext(halo_exchange_time(x, window, axis_name, n_shards), window)
    a = _delta_from_ext(halo_exchange_time(d, window, axis_name, n_shards), window)
    return jnp.concatenate([x, d, a], axis=-1)


def adenet_forward_sp(
    params: dict,
    config: adenet.AdeNetConfig,
    inputs: Sequence[jnp.ndarray],
    mask: jnp.ndarray,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    seq_axis: str = "seq",
    train: bool = False,
    dropout_rng=None,
    window=None,
    return_aux: bool = False,
):
    """adenet_forward with a sequence-parallel prefix.

    The prefix (encoder/delta/dropout) runs under shard_map with inputs
    sharded (B on ``data_axis``, T on ``seq_axis``); the recurrent head runs
    data-parallel over ALL devices (batch resharded onto
    ``(data_axis, seq_axis)`` via one all-to-all).  Numerically equal to
    ``adenet_forward`` for train=False; under training the dropout masks are
    drawn per shard (rng folded with the mesh coordinates), so they are valid
    Lasagne-semantics masks but not bitwise those of the unsharded program.
    Batch-norm streams train with SYNCED statistics psum'd over BOTH mesh
    axes (batch and time are each sharded, and Lasagne BN pools every
    non-feature axis), reproducing the global-minibatch moments exactly;
    ``return_aux=True`` surfaces the updated running averages like
    ``adenet_forward`` does.

    Constraints (checked): T divisible by the seq axis, T_local >= window,
    and B divisible by data*seq.
    """
    n_seq = mesh.shape[seq_axis]
    n_data = mesh.shape[data_axis]
    B, T = inputs[0].shape[0], inputs[0].shape[1]
    # window override mirrors adenet_forward's (the Trainer passes
    # options.window); it sets the halo size, so the checks use it too
    window = config.window if window is None else int(window)
    if T % n_seq != 0:
        raise ValueError(f"T={T} not divisible by seq axis {n_seq}")
    # the window only matters where a delta halo will actually be exchanged;
    # a model with no delta streams has no halo, so any T_local works
    # (over-strict rejection found by the TrainOptions interaction matrix)
    if any(s.use_delta for s in config.streams) and (T // n_seq) < window:
        raise ValueError(f"T_local={T // n_seq} < window={window}")
    if B % (n_data * n_seq) != 0:
        raise ValueError(f"B={B} not divisible by data*seq={n_data * n_seq}")
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)
    n = len(config.streams)
    rngs = jax.random.split(dropout_rng, n + max(config.agg_layers, 1))

    def prefix_local(params, *xs):
        di = jax.lax.axis_index(data_axis)
        si = jax.lax.axis_index(seq_axis)
        shard_rngs = [jax.random.fold_in(jax.random.fold_in(rngs[i], di), si)
                      for i in range(n)]
        delta_fn = lambda x: append_delta_coeff_sp(  # noqa: E731
            x, window, seq_axis, n_seq)
        feats, aux = adenet.stream_prefix(params, config, list(xs), train,
                                          shard_rngs, window=window,
                                          delta_fn=delta_fn,
                                          bn_axis=(data_axis, seq_axis))
        return tuple(feats), aux

    in_specs = (P(),) + tuple(P(data_axis, seq_axis, None) for _ in range(n))
    out_specs = (tuple(P(data_axis, seq_axis, None) for _ in range(n)), P())
    feats, aux = shard_map(prefix_local, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)(params, *inputs)

    # one all-to-all: time-sharded -> batch-sharded over every device, so the
    # sequential recurrence keeps all data*seq devices busy
    head_batch = NamedSharding(mesh, P((data_axis, seq_axis), None, None))
    feats = [jax.lax.with_sharding_constraint(f, head_batch) for f in feats]
    mask_c = jax.lax.with_sharding_constraint(
        mask, NamedSharding(mesh, P((data_axis, seq_axis), None)))
    out = adenet.head_forward(params, config, feats, mask_c, train, rngs[n:])
    if return_aux:
        return out, aux
    return out
