"""Normalization layers.

* ``znormalize`` — custom/layers.py:83-102 ZNormalizeLayer: z-normalize a
  (B, T, D) input with the minibatch's own feature statistics (stateless).
* batch norm — Lasagne BatchNormLayer semantics as used by adenet_v1
  (modelzoo/adenet_v1.py:82 ``batch_norm``): normalize over all axes except
  the feature axis, learned gamma/beta, exponential running averages
  (alpha=0.01... Lasagne default 1e-4 per update with inverse bias correction;
  we use the standard exponential moving average with alpha=0.01, which
  converges to the same statistics) used at eval time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def znormalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize by per-feature mean/std of the whole minibatch (all leading
    axes pooled), reproducing ZNormalizeLayer."""
    orig_shape = x.shape
    flat = x.reshape(-1, orig_shape[-1])
    means = flat.mean(axis=0)
    stds = flat.std(axis=0)
    return ((flat - means) / (stds + eps)).reshape(orig_shape)


def init_batch_norm(dim: int, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (params, state): learned gamma/beta and running mean/inv_std."""
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batch_norm_forward(params, state, x, train: bool, eps: float = 1e-4,
                       alpha: float = 0.01, axis_name=None):
    """Apply BN over the last axis; returns (y, new_state).

    ``axis_name`` (a mesh axis name or tuple of names) makes the training
    statistics CROSS-SHARD: inside a ``shard_map`` body (or a
    sequence-parallel prefix) each shard sees only its local rows, so the
    local (sum, sumsq, count) moments are psum'd over the named axes before
    deriving mean/var — every shard then normalizes with exactly the global
    minibatch statistics, bit-identical to the unsharded program whenever the
    shards are equal-sized (the trainer pads batches to a mesh multiple, so
    they always are).  Eval mode uses the running averages and needs no
    collective.
    """
    feat = x.shape[-1]
    flat = x.reshape(-1, feat)
    if train:
        if axis_name is not None:
            # TWO-pass formulation (psum the mean, then psum the squared
            # deviations): numerically equal to the unsharded jnp.var.  The
            # one-pass E[x^2] - mean^2 form saves a collective but
            # catastrophically cancels in f32 when |mean| >> std
            # (unnormalized raw-pixel activations: mean ~2e3, std ~1e-2
            # gives a NEGATIVE "variance" and NaN through the sqrt — found
            # by review, repro'd), so the second psum is the price of not
            # NaN-ing exactly the inputs BN exists to fix.
            count = jax.lax.psum(jnp.float32(flat.shape[0]), axis_name)
            mean = jax.lax.psum(flat.sum(axis=0), axis_name) / count
            d = flat - mean
            var = jax.lax.psum((d * d).sum(axis=0), axis_name) / count
        else:
            mean = flat.mean(axis=0)
            var = flat.var(axis=0)
        new_state = {
            "mean": (1 - alpha) * state["mean"] + alpha * mean,
            "var": (1 - alpha) * state["var"] + alpha * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (flat - mean) / jnp.sqrt(var + eps) * params["gamma"] + params["beta"]
    return y.reshape(x.shape), new_state
