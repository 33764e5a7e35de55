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
from ip_avsr_tpu.ops.voting import (majority_voting_layer,
                                    majority_voting_layer_masked)


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
    dct_coeffs = dct_coeffs or config.streams[1].input_dim

    @jax.jit
    def serve(raw, mask):
        raw = raw.astype(jnp.float32)
        streams = pipeline.trimodal_streams(raw, mask, image_shape, dct_coeffs,
                                            dct_mean, dct_std)
        out = adenet.adenet_forward(params, config, list(streams), mask, train=False)
        if out.ndim == 3:  # per-step head -> majority vote on device
            if vote:
                return majority_voting_layer(out, config.output_classes)
            return out
        return out

    return serve


def make_server(params: dict, config: adenet.AdeNetConfig, vote: bool = True):
    """Generic server for preprocessed streams: (streams, mask) -> scores."""

    @jax.jit
    def serve(streams, mask):
        out = adenet.adenet_forward(params, config, list(streams), mask, train=False)
        if out.ndim == 3 and vote:
            return majority_voting_layer(out, config.output_classes)
        return out

    return serve


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
        return scores[:B]

    return serve
