"""LeCun local contrast normalization (LCN) via Gaussian convolution.

Parity target: utils/lcn.py:9-121 (gaussian_filter / lecun_lcn) — subtract a
Gaussian-weighted local mean, then divide by the local standard deviation
floored at its per-image mean.  The reference built this as a Theano conv
graph; here it is a jitted XLA convolution (same math, minus the reference's
duplicated ``centered_X`` line, flagged as a quirk in SURVEY.md §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NCHW", "OIHW", "NCHW")


def gaussian_filter(kernel_shape: int, sigma: float = None) -> np.ndarray:
    """2D Gaussian kernel, normalized to sum 1 (utils/lcn.py:9-21 semantics)."""
    sigma = sigma if sigma is not None else kernel_shape / 4.0
    mid = kernel_shape // 2
    ys, xs = np.mgrid[0:kernel_shape, 0:kernel_shape]
    g = np.exp(-((xs - mid) ** 2 + (ys - mid) ** 2) / (2.0 * sigma ** 2))
    g /= (2 * np.pi * sigma ** 2)
    return (g / g.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("kernel_shape", "threshold"))
def lecun_lcn(x: jnp.ndarray, kernel_shape: int = 9, threshold: float = 1e-4) -> jnp.ndarray:
    """Local contrast normalization of (B, 1, H, W) images (utils/lcn.py:24-61)."""
    g = jnp.asarray(gaussian_filter(kernel_shape))[None, None]
    pad = kernel_shape // 2
    padding = [(pad, pad), (pad, pad)]
    local_mean = jax.lax.conv_general_dilated(x, g, (1, 1), padding, dimension_numbers=_DN)
    centered = x - local_mean
    local_var = jax.lax.conv_general_dilated(centered ** 2, g, (1, 1), padding,
                                             dimension_numbers=_DN)
    local_std = jnp.sqrt(jnp.maximum(local_var, 0.0))
    per_img_mean = jnp.mean(local_std, axis=(2, 3), keepdims=True)
    divisor = jnp.maximum(jnp.maximum(local_std, per_img_mean), threshold)
    return centered / divisor


def make_lecun_lcn(kernel_shape: int = 9, threshold: float = 1e-4):
    """Factory returning an LCN callable (utils/lcn.py:64 make_lecun_lcn)."""
    return functools.partial(lecun_lcn, kernel_shape=kernel_shape, threshold=threshold)
