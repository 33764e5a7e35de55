"""Majority voting over per-timestep predictions.

* ``majority_voting_layer`` — custom/layers.py:124-152: per-timestep argmax,
  per-class vote counts, softmax over counts (differentiable output shape
  (B, C)).  Counts every timestep (no mask), as the layer does.
* ``masked_majority_vote`` — the evaluation rule of the runners
  (runners/4stream.py:52-87 evaluate_model2): votes counted over *valid*
  frames only, prediction = argmax of counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def majority_voting_layer(probs: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B, T, C) -> (B, C) softmax of per-class argmax counts."""
    preds = jnp.argmax(probs, axis=-1)  # (B, T)
    onehot = jax.nn.one_hot(preds, num_classes, dtype=probs.dtype)  # (B, T, C)
    votes = jnp.sum(onehot, axis=1)
    return jax.nn.softmax(votes, axis=-1)


def majority_voting_layer_masked(probs: jnp.ndarray, mask: jnp.ndarray,
                                 num_classes: int) -> jnp.ndarray:
    """(B, T, C), (B, T) -> (B, C) softmax of per-class argmax counts over
    VALID frames only.  Equals :func:`majority_voting_layer` when every frame
    is valid; required wherever the time axis is padded (bucketed serving),
    so padding cannot cast votes."""
    preds = jnp.argmax(probs, axis=-1)
    onehot = jax.nn.one_hot(preds, num_classes, dtype=probs.dtype)
    votes = jnp.sum(onehot * mask[..., None].astype(probs.dtype), axis=1)
    return jax.nn.softmax(votes, axis=-1)


def masked_majority_vote(probs, mask) -> np.ndarray:
    """Per-sequence majority vote over valid frames (host-side eval).

    probs: (B, T, C); mask: (B, T).  Matches evaluate_model2: each valid
    frame's argmax casts a vote; ties break toward the lower class id.
    """
    probs = np.asarray(probs)
    mask = np.asarray(mask).astype(bool)
    preds = np.argmax(probs, axis=-1)  # (B, T)
    B, T = preds.shape
    C = probs.shape[-1]
    votes = np.zeros((B, C), dtype=np.int64)
    rows = np.repeat(np.arange(B), T).reshape(B, T)
    np.add.at(votes, (rows[mask], preds[mask]), 1)
    return np.argmax(votes, axis=-1)
