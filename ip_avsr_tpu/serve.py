"""Serving: one jitted program from raw ROI pixels to class probabilities.

The reference's serve path (oulu/demo.py:274-447) runs host-side feature
prep per utterance and a compiled batch-1 forward.  Here the entire chain —
diff images, DCT features, normalizations, encoders, deltas, LSTMs, fusion,
aggregation, softmax (and optionally the majority vote) — is one XLA program:
raw (B, T, D) uint8/float pixels in, (B, C) scores out, nothing on the host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.ops import pipeline
from ip_avsr_tpu.ops.voting import majority_voting_layer


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
