"""Stacked denoising autoencoder (SDE) pretraining.

Parity with avletters/sde_autoencoder.py:40-69: each layer is a denoising AE
with Gaussian input corruption and a tied (W^T) linear decoder; hidden layers
use sigmoid encoders (sigma=0.5), the bottleneck layer is linear (sigma=0.3);
layers are trained greedily on the previous layer's clean codes with squared
error + adadelta; the final stack of encoder weights is the DBNF-style
encoder (exportable via the w1..wN .mat ABI together with mirrored decoders).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.ops import initializers as inits
from ip_avsr_tpu.ops import losses
from ip_avsr_tpu.train import optimizers as opt_lib


def train_denoising_layer(
    key,
    data: np.ndarray,
    encode_size: int,
    sigma: float,
    encoder_nonlinearity: str,
    epochs: int = 20,
    batchsize: int = 128,
    log_fn: Callable[[str], None] = print,
):
    """Train one tied-weight denoising AE layer; returns (W, b_enc)."""
    n, d = data.shape
    batchsize = min(batchsize, n)  # n < batchsize would otherwise run
    # ZERO batches and silently return untrained params ('loss = 0.000000')
    w = inits.glorot_uniform(key, (d, encode_size))
    params = {"w": w, "b_enc": jnp.zeros((encode_size,)), "b_dec": jnp.zeros((d,))}
    opt = opt_lib.adadelta()
    opt_state = opt.init(params)
    nl = jax.nn.sigmoid if encoder_nonlinearity == "sigmoid" else (lambda x: x)

    @jax.jit
    def step(params, opt_state, batch, noise_key):
        def loss_fn(p):
            corrupted = batch + sigma * jax.random.normal(noise_key, batch.shape)
            code = nl(corrupted @ p["w"] + p["b_enc"])
            recon = code @ p["w"].T + p["b_dec"]
            return losses.squared_error(recon, batch)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.apply(params, grads, opt_state)
        return params, opt_state, loss

    rng = np.random.RandomState(0)
    jkey = key
    for epoch in range(epochs):
        order = rng.permutation(n)
        total, count = jnp.float32(0.0), 0
        for start in range(0, n - batchsize + 1, batchsize):
            jkey, noise_key = jax.random.split(jkey)
            batch = jnp.asarray(data[order[start : start + batchsize]])
            params, opt_state, loss = step(params, opt_state, batch, noise_key)
            total = total + loss  # device-side accumulate: no per-batch sync
            count += 1
        log_fn(f"SDE layer epoch {epoch + 1}: loss = {float(total) / max(count, 1):.6f}")
    return np.asarray(params["w"]), np.asarray(params["b_enc"])


def train_sde(
    key,
    data: np.ndarray,
    layer_sizes: Sequence[int],
    epochs: int = 20,
    batchsize: int = 128,
    hidden_sigma: float = 0.5,
    bottleneck_sigma: float = 0.3,
    log_fn: Callable[[str], None] = print,
):
    """Greedy SDE stack; the last layer is the linear bottleneck.

    Returns (weights, biases): one (W, b) per encoder layer, ready for
    models.encoder.pretrained_encoder_params or the w1..wN export (a mirrored
    decoder can be appended exactly as pretrain.unfold does for DBNs).
    """
    x = np.asarray(data, np.float32)
    weights: List[np.ndarray] = []
    biases: List[np.ndarray] = []
    for i, size in enumerate(layer_sizes):
        is_bottleneck = i == len(layer_sizes) - 1
        key, layer_key = jax.random.split(key)
        nl = "linear" if is_bottleneck else "sigmoid"
        sigma = bottleneck_sigma if is_bottleneck else hidden_sigma
        log_fn(f"SDE layer {i + 1}: {x.shape[1]} -> {size} ({nl}, sigma={sigma})")
        w, b = train_denoising_layer(layer_key, x, size, sigma, nl, epochs,
                                     batchsize, log_fn)
        weights.append(w)
        biases.append(b)
        code = x @ w + b
        x = code if is_bottleneck else np.asarray(jax.nn.sigmoid(jnp.asarray(code)))
    return weights, biases
