"""In-graph delta / acceleration coefficients (the DeltaLayer).

Numerical target: the Theano scan implementation the reference compiles into
its models (utils/signal.py:59-80, custom/layers.py:105-121), which computes

    delta[t] = sum_{theta=1..W} (y[t+theta] - y[t-theta]) / (2*theta)

over a sequence edge-padded by W frames on each side (first/last frame
repeated), then applies the same filter again for the acceleration term and
concatenates [x, delta, accel] on the feature axis (output dim x3).

Note this differs from the *host-side* feature deltas
(data/preprocessing.deltas): that one is the unnormalized slope
``sum theta*(y[t+theta]-y[t-theta])``.  Both conventions exist in the
reference; models use this one.

TPU design: the O(T*W) nested Theano scan is re-expressed as a closed-form
FIR filter — W shifted adds over a statically padded tensor — which XLA fuses
into a handful of vector ops with no sequential dependence, instead of a
per-timestep loop.  A fused Pallas kernel that computes both orders in one
VMEM pass (one HBM read of x, one write of [x, d, a]) lives in
ops/pallas/delta_kernel.py and is used on TPU for large inputs.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def delta_filter_weights(window: int, normalized: bool = True) -> np.ndarray:
    """FIR taps for offsets -window..window.

    normalized=True  -> tap(o) =  sign(o) / (2|o|)   (in-graph DeltaLayer)
    normalized=False -> tap(o) =  o                  (host-side feature deltas)
    """
    offsets = np.arange(-window, window + 1, dtype=np.float32)
    if normalized:
        with np.errstate(divide="ignore"):
            taps = np.where(offsets == 0, 0.0, np.sign(offsets) / (2.0 * np.abs(offsets)))
    else:
        taps = offsets
    return taps.astype(np.float32)


def _edge_pad_time(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Repeat the first/last frame ``window`` times along the time axis (-2)."""
    pad = [(0, 0)] * x.ndim
    pad[-2] = (window, window)
    return jnp.pad(x, pad, mode="edge")


def delta_taps_from_padded(padded: jnp.ndarray, window: int,
                           normalized: bool = True) -> jnp.ndarray:
    """The delta FIR taps over an ALREADY time-extended (..., T + 2*window, D)
    array, returning the (..., T, D) centre block.  Shared by
    :func:`delta_coeff` (edge-padded input) and the sequence-parallel path
    (halo-exchanged input, parallel/sequence.py) so the tap formula lives in
    exactly one place."""
    T = padded.shape[-2] - 2 * window
    out = jnp.zeros(padded.shape[:-2] + (T,) + padded.shape[-1:], padded.dtype)
    for theta in range(1, window + 1):
        coeff = (1.0 / (2.0 * theta)) if normalized else float(theta)
        fwd = jnp.asarray(padded[..., window + theta : window + theta + T, :])
        bwd = jnp.asarray(padded[..., window - theta : window - theta + T, :])
        out = out + coeff * (fwd - bwd)
    return out


def delta_coeff(x: jnp.ndarray, window: int, normalized: bool = True) -> jnp.ndarray:
    """Single-order delta along the time axis (axis -2) of ``x`` (..., T, D)."""
    if window <= 0:
        return jnp.zeros_like(x)
    return delta_taps_from_padded(_edge_pad_time(x, window), window,
                                  normalized=normalized)


def append_delta_coeff(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[x, delta, accel] on the feature axis; x is (..., T, D) -> (..., T, 3D).

    Matches utils/signal.py:59-80 semantics (acceleration = delta of delta,
    each with its own edge padding).
    """
    d = delta_coeff(x, window)
    a = delta_coeff(d, window)
    return jnp.concatenate([x, d, a], axis=-1)


@functools.partial(jnp.vectorize, signature="(t,d)->(t,e)", excluded=(1,))
def _append_delta_single(x, window):  # pragma: no cover - convenience wrapper
    return append_delta_coeff(x, window)


def delta_layer(x: jnp.ndarray, window: int, use_pallas: str = "auto") -> jnp.ndarray:
    """DeltaLayer forward: (B, T, D) -> (B, T, 3D).

    ``use_pallas``: "auto" picks the fused Pallas kernel on TPU when shapes
    are large enough to pay off; "never"/"always" force the choice.
    """
    if use_pallas != "never":
        from ip_avsr_tpu.ops.pallas import delta_kernel

        if use_pallas == "always" or delta_kernel.should_use_pallas(x, window):
            return delta_kernel.append_delta_pallas(x, window)
    return append_delta_coeff(x, window)
