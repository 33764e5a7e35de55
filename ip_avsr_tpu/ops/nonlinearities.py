"""Nonlinearity registry (string -> jnp function).

Parity with custom/nonlinearities.py:4-16 and the Lasagne definitions the
reference maps to (e.g. ``very_leaky_rectify`` uses slope 1/3, ``ScaledTanh``
defaults to scale_in=1, scale_out=1; the conv-AE uses ScaledTanh(0.5, 2.4),
avletters/avletters_convae.py:7-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rectify(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def leaky_rectify(x, leakiness=0.01):
    return jnp.where(x > 0, x, leakiness * x)


def very_leaky_rectify(x):
    return leaky_rectify(x, 1.0 / 3.0)


def tanh(x):
    return jnp.tanh(x)


def linear(x):
    return x


identity = linear


def softmax(x):
    return jax.nn.softmax(x, axis=-1)


def softplus(x):
    return jax.nn.softplus(x)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


def scaled_tanh(x, scale_in=1.0, scale_out=1.0):
    return scale_out * jnp.tanh(scale_in * x)


def make_scaled_tanh(scale_in, scale_out):
    return lambda x: scaled_tanh(x, scale_in, scale_out)


_REGISTRY = {
    "rectify": rectify,
    "relu": rectify,
    "sigmoid": sigmoid,
    "sigm": sigmoid,
    "leaky_rectify": leaky_rectify,
    "very_leaky_rectify": very_leaky_rectify,
    "tanh": tanh,
    "linear": linear,
    "softmax": softmax,
    "softplus": softplus,
    "elu": elu,
    "scaled_tanh": scaled_tanh,
    "identity": identity,
}


def select_nonlinearity(name):
    """String -> activation fn (custom/nonlinearities.py:4-16). Accepts a
    callable pass-through so config plumbing can hand functions around."""
    if callable(name):
        return name
    return _REGISTRY[name]
