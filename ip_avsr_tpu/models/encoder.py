"""Dense "DBNF" encoder stacks (pretrained or freshly initialized).

Parity: modelzoo/pretrained_encoder.py:4-16 and modelzoo/autoencoder.py:40-60
— a chain of dense layers named fc1..fcN / bottleneck with per-layer
nonlinearities; weights may come from a MATLAB-pretrained ``.mat`` checkpoint
(w1..wN/b1..bN) or fresh Glorot init.

TPU note: the encoder runs on (B*T, D) flattened frames so the whole batch's
frames form one large MXU matmul per layer (the reference does the same
reshape, modelzoo/adenet_v2.py:37-40).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.ops import initializers as inits
from ip_avsr_tpu.ops.nonlinearities import select_nonlinearity

DEFAULT_NAMES = ("fc1", "fc2", "fc3", "bottleneck")


def init_encoder_params(key, input_dim: int, shapes: Sequence[int],
                        w_init=inits.glorot_uniform, dtype=jnp.float32) -> dict:
    """Fresh dense stack (modelzoo/pretrained_encoder.py:12-16 create_encoder)."""
    params = {}
    fan_in = input_dim
    keys = jax.random.split(key, len(shapes))
    for i, units in enumerate(shapes):
        name = DEFAULT_NAMES[i] if i < len(DEFAULT_NAMES) else f"fc{i + 1}"
        params[name] = {
            "w": w_init(keys[i], (fan_in, int(units)), dtype),
            "b": jnp.zeros((int(units),), dtype),
        }
        fan_in = int(units)
    return params


def pretrained_encoder_params(weights, biases, names=DEFAULT_NAMES) -> dict:
    """Wrap loaded (weights, biases) lists into the encoder param pytree
    (modelzoo/pretrained_encoder.py:4-9 create_pretrained_encoder)."""
    params = {}
    for i, (w, b) in enumerate(zip(weights, biases)):
        name = names[i] if i < len(names) else f"fc{i + 1}"
        params[name] = {"w": jnp.asarray(np.asarray(w), jnp.float32),
                        "b": jnp.asarray(np.asarray(b), jnp.float32).reshape(-1)}
    return params


def encoder_forward(params: dict, x: jnp.ndarray, nonlinearities: Sequence,
                    names=None, matmul_dtype=None) -> jnp.ndarray:
    """Apply the dense stack to (..., D) inputs."""
    names = names or sorted(params.keys(), key=_layer_sort_key)
    if len(nonlinearities) != len(names):
        raise ValueError(
            f"encoder has {len(names)} layers {list(names)} but "
            f"{len(nonlinearities)} nonlinearities {list(nonlinearities)} — "
            f"zip() would silently drop layers")
    out = x
    # accumulate in f32 (MXU-native), widened to f64 when the compute dtype
    # is f64 (the finite-difference validation suite runs the model at x64)
    acc = jnp.promote_types(jnp.float32, x.dtype)
    for name, nl in zip(names, nonlinearities):
        w, b = params[name]["w"], params[name]["b"]
        if matmul_dtype is not None:
            y = jnp.dot(out.astype(matmul_dtype), w.astype(matmul_dtype),
                        preferred_element_type=acc)
        else:
            y = jnp.dot(out, w, preferred_element_type=acc)
        out = select_nonlinearity(nl)(y + b)
    return out


def _layer_sort_key(name: str):
    """fc1 < fc2 < fc3 < bottleneck < fc5 < ... < fc10 (init order).  The
    overflow names sort NUMERICALLY — a plain string sort would put fc10
    before fc5 and scramble deep stacks."""
    order = {n: i for i, n in enumerate(DEFAULT_NAMES)}
    if name in order:
        return (order[name], 0)
    digits = "".join(c for c in name if c.isdigit())
    return (99, int(digits) if digits else 0)


def encoder_output_dim(params: dict, names=None) -> int:
    names = names or sorted(params.keys(), key=_layer_sort_key)
    return int(params[names[-1]]["w"].shape[1])
