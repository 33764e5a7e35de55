"""On-device DCT / zigzag features (jnp), for fused TPU input pipelines.

Numerics mirror the host-side path (data/preprocessing.compute_dct_features,
reference utils/preprocessing.py:417-434): orthonormal DCT-II along the
flattened pixel axis, zigzag scan of the coefficient plane, keep coefficients
1..no_coeff (skipping DC).  The zigzag gather indices are computed statically
on the host, so on device this is one DCT plus one gather — fully fusable.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.fft as jfft

from ip_avsr_tpu.data.preprocessing import zigzag_indices


def dct2_ortho(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal DCT-II along the last axis."""
    return jfft.dct(x, type=2, norm="ortho", axis=-1)


def compute_dct_features_device(X: jnp.ndarray, image_shape, no_coeff: int = 30) -> jnp.ndarray:
    """(N, H*W) flattened images -> (N, no_coeff) zigzag DCT features."""
    coeffs = dct2_ortho(X)
    order = jnp.asarray(zigzag_indices(image_shape)[1 : no_coeff + 1])
    return jnp.take(coeffs, order, axis=-1)
