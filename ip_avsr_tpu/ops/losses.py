"""Objectives.

* ``temporal_softmax_loss`` — custom/objectives.py:4-39.  NOTE the reference
  feeds this the network's *softmax probabilities* and the loss applies its
  own (max-subtracted) softmax again before the masked NLL; that double
  softmax is reproduced here because training dynamics (and therefore
  accuracy parity) depend on it.
* ``categorical_crossentropy`` — Lasagne objectives on utterance-level
  (slice) models: mean of -log p[y] over the batch.
* ``squared_error`` — autoencoder reconstruction objective
  (avletters/ae_finetuner.py, avletters/avletters_convae.py:258-261).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def temporal_softmax_loss(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
                          return_parts: bool = False):
    """Masked per-timestep cross entropy, averaged over valid frames.

    x: (N, T, V) scores (in practice: already-softmaxed probabilities —
       reference quirk, see module docstring); y: (N, T) int labels;
       mask: (N, T) 1 for valid frames.

    ``return_parts=True`` returns ``(weighted_nll_sum, frame_count)``
    instead of their quotient — the data-parallel shard_map trainer psums
    both parts so every shard computes the exact global loss (a shard of
    all-pad rows contributes 0/0-free zeros, not a NaN quotient).
    """
    N, T, V = x.shape
    x_flat = x.reshape(N * T, V)
    y_flat = y.reshape(N * T)
    mask_flat = mask.reshape(N * T).astype(x.dtype)
    total_frames = jnp.sum(mask_flat)
    log_probs = jax.nn.log_softmax(x_flat, axis=1)
    nll = -jnp.take_along_axis(log_probs, y_flat[:, None].astype(jnp.int32), axis=1)[:, 0]
    num = jnp.sum(mask_flat * nll)
    if return_parts:
        return num, total_frames
    return num / total_frames


def categorical_crossentropy(probs: jnp.ndarray, y: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Mean -log(probs[y]) over the batch; ``probs`` are softmax outputs
    (Lasagne categorical_crossentropy on a softmax layer)."""
    p = jnp.take_along_axis(probs, y[:, None].astype(jnp.int32), axis=1)[:, 0]
    if eps:
        p = jnp.clip(p, eps, 1.0)
    return -jnp.mean(jnp.log(p))


def categorical_crossentropy_masked(probs: jnp.ndarray, y: jnp.ndarray,
                                    sample_weight: jnp.ndarray,
                                    return_parts: bool = False):
    """Weighted mean -log(probs[y]); ``sample_weight`` zeroes out batch-pad
    rows so a statically padded partial batch matches the reference's
    variable-size batch loss exactly.  ``return_parts`` as in
    :func:`temporal_softmax_loss`."""
    p = jnp.take_along_axis(probs, y[:, None].astype(jnp.int32), axis=1)[:, 0]
    w = sample_weight.astype(probs.dtype)
    # clamp where w == 0: a pad row whose picked-class probability underflows
    # to exactly 0 in f32 would give 0 * log(0) = NaN (and 0/0 grads),
    # poisoning the whole step; the clamp leaves weighted rows untouched
    p = jnp.where(w > 0, p, 1.0)
    num = -jnp.sum(w * jnp.log(p))
    if return_parts:
        return num, jnp.sum(w)
    return num / jnp.maximum(jnp.sum(w), 1.0)


def squared_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (Lasagne squared_error().mean())."""
    return jnp.mean((pred - target) ** 2)


def l2_regularization(params, scale: float) -> jnp.ndarray:
    """Sum of squared weights over 2D+ params (Lasagne regularize_network_params
    with l2 penalizes weight matrices, not biases)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = 0.0
    for leaf in leaves:
        if leaf.ndim >= 2:
            total = total + jnp.sum(leaf ** 2)
    return scale * total
