"""On-device input pipeline: raw mouth-ROI batches -> model-ready streams.

The reference prepares every feature stream on the host with NumPy
(diff images, samplewise/sequencewise normalization, DCT — SURVEY.md §1 L2)
and ships three separate tensors to the device per batch.  For TPU serving
that triples host->HBM traffic and leaves the work on the CPU; here the whole
chain runs on device under one jit, so a raw (B, T, D) ROI batch fans out to
(raw_norm, dct, diff_norm) with XLA fusing the elementwise stages.

Numerics mirror the host ops (data/preprocessing.py citations inline).
"""

from __future__ import annotations

import jax.numpy as jnp

from ip_avsr_tpu.ops.dct import compute_dct_features_device


def samplewise_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-frame zero-mean/unit-std over the feature axis
    (data/preprocessing.normalize_input centralize semantics).

    ``eps`` guards the all-zero pad frames of a padded batch: without it
    0/0 NaNs leak through delta windows and the masked LSTM carry
    (0 * NaN = NaN) and poison every timestep of shorter sequences.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    std = jnp.std(centered, axis=-1, keepdims=True)
    return centered / (std + eps)


def diff_images(x: jnp.ndarray) -> jnp.ndarray:
    """Temporal difference along axis -2 with the first diff duplicated at
    t=0 (data/preprocessing.compute_diff_images).  Operates per padded batch
    row; pad frames are masked downstream."""
    d = x[..., 1:, :] - x[..., :-1, :]
    return jnp.concatenate([d[..., :1, :], d], axis=-2)


def sequencewise_mean_subtract(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract each sequence's masked mean image from its valid frames
    (data/preprocessing.sequencewise_mean_image_subtraction)."""
    m = mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=-2, keepdims=True)
    count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    return (x - total / count) * m


def featurewise_normalize(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Apply precomputed train-split feature statistics
    (data/preprocessing.featurewise_normalize_sequence apply step)."""
    return (x - mean) / std


def trimodal_streams(
    raw: jnp.ndarray,
    mask: jnp.ndarray,
    image_shape,
    dct_coeffs: int = 90,
    dct_mean=None,
    dct_std=None,
) -> tuple:
    """Raw (B, T, D) ROI batch -> (raw_norm, dct, diff_norm) on device,
    replicating the trimodal host chain (oulu/trimodal_with_val.py:311-339:
    diff images from raw, mean-removed DCT, samplewise-normalized raw/diff)."""
    B, T, D = raw.shape
    m = mask.astype(raw.dtype)[..., None]
    diff = diff_images(raw)
    dct = compute_dct_features_device(raw.reshape(B * T, D), image_shape,
                                      dct_coeffs).reshape(B, T, dct_coeffs)
    dct = sequencewise_mean_subtract(dct, mask)
    if dct_mean is not None:
        dct = featurewise_normalize(dct, dct_mean, dct_std)
        dct = dct * m  # keep pad frames zero after the affine shift
    # zero every masked position BEFORE normalization: the first pad frame's
    # diff is -raw[T_valid-1] (a non-zero "ghost"), and samplewise_normalize
    # would rescale it to unit std — the training pipeline computes diffs
    # per video host-side and zero-pads, so serve-time features at the last
    # valid frames' delta windows would otherwise diverge from training
    return (samplewise_normalize(raw * m) * m, dct,
            samplewise_normalize(diff * m) * m)
