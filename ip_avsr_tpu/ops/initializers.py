"""Weight initializers with Lasagne-compatible semantics.

The reference's runners select among GlorotUniform / Normal(0.1) / Uniform /
Orthogonal by config string (runners/4stream.py:212-220); gate defaults in
custom layers are Normal(0.1) (Lasagne Gate defaults) or Orthogonal
(modelzoo/adenet_v3.py:71-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot_uniform(key, shape, dtype=jnp.float32, gain=1.0):
    if len(shape) < 2:
        # Lasagne raises here; biases are initialized by constant() instead.
        raise ValueError("glorot_uniform requires >=2D shapes")
    fan_in, fan_out = shape[0], shape[1]
    limit = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def normal(std=0.1, mean=0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def uniform(rng_range=0.01):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-rng_range, maxval=rng_range)

    return init


def orthogonal(key, shape, dtype=jnp.float32, gain=1.0):
    """Orthogonal init via SVD of a Gaussian (Lasagne init.Orthogonal).

    The SVD runs on the host (NumPy): initialization is eager one-time work,
    and large SVDs dispatched to an accelerator backend are pathologically
    slow (and pointless) there.
    """
    flat_shape = (shape[0], int(np.prod(shape[1:])))
    a = np.asarray(jax.random.normal(key, flat_shape, jnp.float32))
    u, _, vt = np.linalg.svd(a, full_matrices=False)
    q = u if u.shape == flat_shape else vt
    return jnp.asarray(gain * q.reshape(shape), dtype)


def constant(value=0.0):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


_REGISTRY = {
    "glorot": glorot_uniform,
    "norm": normal(0.1),
    "uniform": uniform(),
    "ortho": orthogonal,
}


def select_weight_init(name):
    """Config string -> initializer (runners/4stream.py:212-220 mapping)."""
    if callable(name):
        return name
    return _REGISTRY[name]
