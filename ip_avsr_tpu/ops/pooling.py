"""Pooling ops.

* ``masked_mean_pool`` — custom/layers.py:155-175 MeanPoolLayer: mean over
  valid timesteps of a (B, T, D) sequence given a (B, T) mask.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean_pool(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D), (B, T) -> (B, D): sum of valid frames / count of valid frames."""
    m = mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return total / count
