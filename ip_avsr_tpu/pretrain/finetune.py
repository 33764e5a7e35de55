"""Autoencoder finetuning.

* ``finetune_autoencoder`` — parity with */ae_finetuner.py (e.g.
  avletters/ae_finetuner.py:32-146): load a w1..wN unfolded AE, minimize
  squared reconstruction error + L2 (5e-3) with adadelta (or nesterov
  momentum), batch-shuffled epochs; returns updated (weights, biases).
* ``train_convae`` — parity with avletters/avletters_convae.py:202-330:
  adadelta (lr 0.8), squared error, lr *= 0.9 decay after epoch 10, epochwise
  shuffled fixed-size batches; returns conv-AE params.

Both run as one jitted update step re-used across all batches (static shapes).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.models import convae as convae_mod
from ip_avsr_tpu.models import encoder as encoder_mod
from ip_avsr_tpu.ops import losses
from ip_avsr_tpu.train import optimizers as opt_lib


def ae_params_from_lists(weights, biases) -> dict:
    """(w1..wN, b1..bN) lists -> parameter pytree with fc{i} names."""
    return {
        f"fc{i + 1}": {"w": jnp.asarray(np.asarray(w), jnp.float32),
                       "b": jnp.asarray(np.asarray(b), jnp.float32).reshape(-1)}
        for i, (w, b) in enumerate(zip(weights, biases))
    }


def ae_params_to_lists(params: dict):
    names = sorted(params.keys(), key=lambda n: int(n[2:]))
    weights = [np.asarray(params[n]["w"]) for n in names]
    biases = [np.asarray(params[n]["b"]) for n in names]
    return weights, biases


def ae_forward(params: dict, x, activations: Sequence[str]):
    names = sorted(params.keys(), key=lambda n: int(n[2:]))
    return encoder_mod.encoder_forward(params, x, activations, names=names)


def finetune_autoencoder(
    weights,
    biases,
    activations: Sequence[str],
    train_X: np.ndarray,
    epochs: int = 30,
    batchsize: int = 128,
    optimizer: str = "adadelta",
    learning_rate: Optional[float] = None,
    l2: float = 0.005,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
):
    """Finetune an unfolded AE on reconstruction; returns (weights, biases)."""
    params = ae_params_from_lists(weights, biases)
    opt = opt_lib.select_optimizer(optimizer, learning_rate)
    opt_state = opt.init(params)
    acts = tuple(activations)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            recon = ae_forward(p, batch, acts)
            return losses.squared_error(recon, batch) + losses.l2_regularization(p, l2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.apply(params, grads, opt_state)
        return params, opt_state, loss

    X = np.asarray(train_X, np.float32)
    rng = np.random.RandomState(seed)
    n = len(X)
    batchsize = min(batchsize, n)  # n < batchsize would otherwise run
    # ZERO batches and silently return untrained params ('loss = 0.000000')
    for epoch in range(epochs):
        order = rng.permutation(n)
        total, count = jnp.float32(0.0), 0
        for start in range(0, n - batchsize + 1, batchsize):
            batch = jnp.asarray(X[order[start : start + batchsize]])
            params, opt_state, loss = step(params, opt_state, batch)
            total = total + loss  # device-side accumulate: no per-batch sync
            count += 1
        log_fn(f"AE finetune epoch {epoch + 1}: loss = {float(total) / max(count, 1):.6f}")
    return ae_params_to_lists(params)


def train_convae(
    train_X: np.ndarray,
    config: convae_mod.ConvAEConfig = convae_mod.ConvAEConfig(),
    epochs: int = 25,
    batchsize: int = 128,
    learning_rate: float = 0.8,
    decay_start: int = 10,
    decay_rate: float = 0.9,
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
    stop_flag: Optional[Callable[[], bool]] = None,
):
    """Train the conv-AE end to end (avletters/avletters_convae.py:202-330).

    ``stop_flag`` mirrors the reference's SIGINT-graceful stop (:204-209):
    when it returns True the loop exits after the current epoch.
    """
    params = convae_mod.init_convae_params(jax.random.PRNGKey(seed), config)
    opt = opt_lib.adadelta(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng, lr):
        def loss_fn(p):
            recon = convae_mod.convae_forward(p, config, batch, train=config.use_dropout,
                                              rng=rng)
            return losses.squared_error(recon, batch)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.apply(params, grads, opt_state, learning_rate=lr)
        return params, opt_state, loss

    X = np.asarray(train_X, np.float32)
    rng = np.random.RandomState(seed)
    jrng = jax.random.PRNGKey(seed + 1)
    lr = learning_rate
    n = len(X)
    batchsize = min(batchsize, n)  # n < batchsize would otherwise run
    # ZERO batches and silently return untrained params ('loss = 0.000000')
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        total, count = jnp.float32(0.0), 0
        for start in range(0, n - batchsize + 1, batchsize):
            batch = jnp.asarray(X[order[start : start + batchsize]])
            jrng, step_rng = jax.random.split(jrng)
            params, opt_state, loss = step(params, opt_state, batch, step_rng,
                                           jnp.asarray(lr, jnp.float32))
            total = total + loss  # device-side accumulate: no per-batch sync
            count += 1
        history.append(float(total) / max(count, 1))
        log_fn(f"conv-AE epoch {epoch + 1}: loss = {history[-1]:.6f} (lr={lr:.4f})")
        if epoch + 1 >= decay_start:
            lr *= decay_rate
        if stop_flag is not None and stop_flag():
            log_fn("stop requested; ending conv-AE training")
            break
    return params, history
