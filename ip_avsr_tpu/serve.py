"""Serving: one jitted program from raw ROI pixels to class probabilities.

The reference's serve path (oulu/demo.py:274-447) runs host-side feature
prep per utterance and a compiled batch-1 forward.  Here the entire chain —
diff images, DCT features, normalizations, encoders, deltas, LSTMs, fusion,
aggregation, softmax (and optionally the majority vote) — is one XLA program:
raw (B, T, D) uint8/float pixels in, (B, C) scores out, nothing on the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.ops import pipeline
from ip_avsr_tpu.ops.voting import majority_voting_layer_masked


def make_trimodal_server(
    params: dict,
    config: adenet.AdeNetConfig,
    image_shape,
    dct_coeffs: Optional[int] = None,
    dct_mean=None,
    dct_std=None,
    vote: bool = True,
):
    """Returns a jitted ``(raw, mask) -> (B, C) scores`` callable for a
    trimodal (raw, dct, diff) model."""
    if (dct_mean is None) != (dct_std is None):
        raise ValueError("dct_mean and dct_std must be given together "
                         "(featurewise normalization needs both)")
    dct_coeffs = dct_coeffs or config.streams[1].input_dim

    @jax.jit
    def serve(raw, mask):
        raw = raw.astype(jnp.float32)
        streams = pipeline.trimodal_streams(raw, mask, image_shape, dct_coeffs,
                                            dct_mean, dct_std)
        out = adenet.adenet_forward(params, config, list(streams), mask, train=False)
        if out.ndim == 3:  # per-step head -> majority vote on device
            if vote:
                # MASKED vote: the caller supplies a mask, so padded frames
                # must not cast votes (a padded utterance's constant pad-tail
                # argmax would otherwise outvote the real frames)
                return majority_voting_layer_masked(out, mask,
                                                    config.output_classes)
            return out
        return out

    return serve


def make_server(params: dict, config: adenet.AdeNetConfig, vote: bool = True):
    """Generic server for preprocessed streams: (streams, mask) -> scores."""

    @jax.jit
    def serve(streams, mask):
        out = adenet.adenet_forward(params, config, list(streams), mask, train=False)
        if out.ndim == 3 and vote:
            # masked: padded frames must not vote (see make_trimodal_server)
            return majority_voting_layer_masked(out, mask,
                                                config.output_classes)
        return out

    return serve


class PipelinedServer:
    """Async batch-1 serving that amortizes the host<->device ROUND TRIP.

    Measured on the tunnel-attached chip: a jitted dispatch with host-numpy
    inputs is ~0.03 ms (fully async — h2d rides along), but EVERY d2h fetch
    pays the full ~33 ms transport round trip, even for futures whose
    compute finished long ago — fetches do not overlap each other.  So
    per-request fetching can never beat the round trip, no matter how deep
    the dispatch pipeline (BENCH r2's synchronous p50 ~35 ms is already
    transport-bound).

    The fix is to make the round trip carry MANY results: ``map`` dispatches
    each request immediately (free), concatenates every ``depth`` score
    futures into one on-device array (also a free dispatch), and fetches
    that block with a single d2h — one round trip per ``depth`` requests,
    while the next block's requests keep dispatching behind it.  Sustained
    per-request latency approaches ``round_trip/depth + on_device``; the
    results still come back in submission order.

    Transport bytes matter as much as round trips here (~38 MB/s with
    ~1 ms/message overhead measured through the tunnel): serve RAW uint8
    pixels through ``make_trimodal_server`` (33 KB/request; DCT/diff/norms
    computed on-device) rather than preprocessed f32 streams (270 KB).

    ``serve_fn`` wraps any jitted request function (default: the generic
    preprocessed-streams server); requests in ``map`` are its argument
    tuples.

    ``batch`` > 1 additionally MICRO-BATCHES the uploads: up to ``batch``
    same-shaped queued requests are stacked host-side (one np.concatenate on
    the leading axis) into a single dispatch, so the tunnel's fixed
    per-message cost (~1 ms measured, on top of ~38 MB/s of bandwidth)
    amortizes over ``batch`` requests on the h2d side exactly as ``depth``
    amortizes the d2h round trip.  Results still come back split
    per-request, in submission order.  This is only valid when the served
    program treats batch rows independently — true of every layer on the
    serve path (samplewise/sequencewise norms, DCT, encoders, masked LSTMs,
    eval-mode BN, masked voting are all per-row) but NOT of a model
    containing ``znormalize`` (minibatch statistics); keep ``batch=1`` for
    those.
    """

    def __init__(self, params: dict = None, config: adenet.AdeNetConfig = None,
                 vote: bool = True, depth: int = 8, serve_fn=None,
                 batch: int = 1):
        self._serve = serve_fn or make_server(params, config, vote=vote)
        self._depth = max(1, int(depth))
        self._batch = max(1, int(batch))

    def submit(self, *args):
        """Dispatch one request; returns an opaque handle (a device future)."""
        return self._serve(*jax.tree_util.tree_map(jnp.asarray, args))

    def result(self, handle):
        """Block until ``handle``'s scores are on the host."""
        import numpy as np

        return np.asarray(handle)

    def _pack(self, handles, sizes):
        # one on-device concat (an async dispatch) -> one d2h for the block;
        # ``sizes`` are the per-REQUEST row counts (a micro-batched handle
        # covers several requests), driving the per-request unpack
        return jnp.concatenate(handles, axis=0), list(sizes)

    def _unpack(self, packed):
        import numpy as np

        arr, sizes = packed
        host = np.asarray(arr)  # the block's single round trip
        off = 0
        for s in sizes:
            yield host[off : off + s]
            off += s

    def map(self, requests):
        """Pipelined generator: ``requests`` yields argument tuples for the
        serve fn (e.g. ``(streams, mask)`` for the generic server, ``(raw,
        mask)`` for a trimodal raw-pixel server); yields (B, C) score arrays
        in submission order.  Keeps one packed
        block in flight beyond the one being drained, so block i's fetch
        overlaps block i+1's dispatch/compute.  With ``batch`` > 1,
        same-shaped consecutive requests are stacked host-side into one
        dispatch (see the class docstring for when that is valid)."""
        import collections

        import numpy as np

        block, sizes = [], []   # dispatched handles + per-request row counts
        stage = []              # host request tuples awaiting one dispatch
        pending = collections.deque()

        def _dispatch_stage():
            # stack the staged same-shaped requests into ONE h2d + dispatch
            # (tree-aware: an argument may be a LIST of stream arrays)
            rows = [int(jax.tree_util.tree_leaves(req)[0].shape[0])
                    for req in stage]
            if len(stage) == 1:
                args = stage[0]
            else:
                args = jax.tree_util.tree_map(
                    lambda *xs: np.concatenate([np.asarray(x) for x in xs],
                                               axis=0), *stage)
            h = self.submit(*args)
            stage.clear()
            # the block concat needs matching trailing dims (a per-step
            # vote=False server returns (B, T, C) whose T follows the
            # request): a shape change flushes the current block instead of
            # crashing the concat mid-stream
            if block and h.shape[1:] != block[-1].shape[1:]:
                pending.append(self._pack(block, sizes))
                block.clear()
                sizes.clear()
            block.append(h)
            sizes.extend(rows)
            if len(block) >= self._depth:
                pending.append(self._pack(block, sizes))
                block.clear()
                sizes.clear()

        def _shapes(req):
            return tuple(np.shape(leaf) for leaf in
                         jax.tree_util.tree_leaves(req))

        for req in requests:
            req = tuple(req)
            # only identically-shaped requests can share a stacked dispatch
            if stage and _shapes(req) != _shapes(stage[-1]):
                _dispatch_stage()
            stage.append(req)
            if len(stage) >= self._batch:
                _dispatch_stage()
            while len(pending) > 1:
                yield from self._unpack(pending.popleft())
        if stage:
            _dispatch_stage()
        if block:
            pending.append(self._pack(block, sizes))
        while pending:
            yield from self._unpack(pending.popleft())


def make_bucketed_server(params: dict, config: adenet.AdeNetConfig,
                         batch_buckets=(1, 8, 32), time_buckets=(32, 64),
                         vote: bool = True, allow_time_truncation: bool = False):
    """Production server for ARBITRARY request sizes under static XLA shapes.

    XLA compiles one program per shape; a naive server would recompile for
    every new (batch, T).  This wrapper rounds each request up to the nearest
    (batch_bucket, time_bucket) — at most ``len(batch_buckets) *
    len(time_buckets)`` compilations ever — zero-padding rows/frames (padded
    rows carry an all-zero mask; padded frames are masked) and slicing the
    padding off the scores.  Requests with more utterances than the biggest
    batch bucket are processed in chunks of it.  Time cannot be chunked (the
    recurrence carries state across frames), so a request LONGER than the
    biggest time bucket raises — size ``time_buckets[-1]`` to the corpus
    maximum, or opt in to lossy prefix classification with
    ``allow_time_truncation=True``.

    Returns ``serve(streams, lengths) -> (B, C) scores`` where ``streams[i]``
    is (B, T_actual, D_i) and ``lengths`` the per-utterance frame counts.
    """
    import numpy as np

    batch_buckets = sorted(set(int(b) for b in batch_buckets))
    time_buckets = sorted(set(int(t) for t in time_buckets))
    # vote inside the bucketed server must be MASKED (padded frames cannot
    # cast votes, or T-bucket padding would change the scores)
    inner = make_server(params, config, vote=False)

    @jax.jit
    def vote_fn(out, mask):
        return majority_voting_layer_masked(out, mask, config.output_classes)

    def _bucket(v, buckets):
        for b in buckets:
            if v <= b:
                return b
        return buckets[-1]

    def serve(streams, lengths):
        lengths = np.asarray(lengths).reshape(-1)
        B = len(lengths)
        T = int(streams[0].shape[1])
        max_b = batch_buckets[-1]
        if B > max_b:  # chunk oversized requests by the largest bucket
            outs = [serve([s[i : i + max_b] for s in streams],
                          lengths[i : i + max_b])
                    for i in range(0, B, max_b)]
            return jnp.concatenate(outs, axis=0)
        bb = _bucket(B, batch_buckets)
        tb = _bucket(T, time_buckets)
        if T > tb:
            if not allow_time_truncation:
                raise ValueError(
                    f"request has T={T} frames but the largest time bucket is "
                    f"{tb}; raise time_buckets or pass allow_time_truncation="
                    f"True to classify the first {tb} frames only")
            streams = [s[:, :tb] for s in streams]
            lengths = np.minimum(lengths, tb)
            T = tb
        padded = []
        for s in streams:
            s = jnp.asarray(s, jnp.float32)
            s = jnp.pad(s, ((0, bb - B), (0, tb - T), (0, 0)))
            padded.append(s)
        mask = jnp.asarray(
            (np.arange(tb)[None, :]
             < np.pad(lengths, (0, bb - B))[:, None]).astype(np.float32))
        scores = inner(padded, mask)
        if scores.ndim == 3 and vote:
            scores = vote_fn(scores, mask)
        if scores.ndim == 3:
            # vote=False per-step scores: slice the TIME-bucket padding off
            # too (those frames don't exist in the request; their softmax
            # outputs are pad-input artifacts)
            return scores[:B, :T]
        return scores[:B]

    return serve
