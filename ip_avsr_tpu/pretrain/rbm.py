"""RBM contrastive-divergence pretraining (CD-1) in JAX.

Numerical parity targets (the MATLAB DBN toolbox the reference depends on):
  * hyperparameters — dbn/dbnParamsInit.m:19-45: 10 epochs, batch 100,
    lr 0.1 (0.001 when either layer is linear/ReLU), L2 2e-4 on weights,
    momentum 0.5 -> 0.9 after epoch 5, CD "type" 1 (Hinton probs) vs 2 (states)
  * update rule — dbn/trainRBM.m:54-166: momentum SGD on the CD-1 gradient
    estimate, gradient divided by the *configured* batchsize even for the
    final partial batch; weights init 0.1*randn (0.01 for ReLU), biases 0
  * activations — dbn/computeActivations.m:15-48
  * stochastic states — dbn/computeStates.m:18-33: sigm -> Bernoulli sample,
    linear -> +N(0,1), ReLU -> max(0, x + sigmoid(x)*noise) (NReLU)

TPU design: one jitted CD-1 step per minibatch with static shapes; the final
partial batch is zero-padded and a row mask keeps sums/outer-products exact
(masking probs/states before every reduction reproduces the variable-size
batch arithmetic bit-for-bit in expectation).  Matmuls (data^T @ probs) hit
the MXU.  Stochastic sampling uses jax.random — distributional, not bitwise,
parity with MATLAB's rand/randn (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RBMHyperParams:
    """dbn/dbnParamsInit.m:19-45 defaults."""

    epochs: int = 10
    batchsize: int = 100
    lr_w: float = 0.1
    lr_vb: float = 0.1
    lr_hb: float = 0.1
    lr_w_linear: float = 0.001
    lr_vb_linear: float = 0.001
    lr_hb_linear: float = 0.001
    weight_penalty_l2: float = 0.0002
    init_momentum: float = 0.5
    final_momentum: float = 0.9
    momentum_epoch_thres: int = 5
    cd_type: int = 1  # 1: probs in the negative phase (Hinton), 2: states

    def rates_for(self, vl_type: str, hl_type: str):
        if "linear" in (vl_type, hl_type) or "relu" in (vl_type, hl_type):
            return self.lr_w_linear, self.lr_vb_linear, self.lr_hb_linear
        return self.lr_w, self.lr_vb, self.lr_hb


def compute_activations(layer_type: str, x: jnp.ndarray) -> jnp.ndarray:
    """dbn/computeActivations.m:15-48."""
    lt = layer_type.lower()
    if lt == "sigm":
        return jax.nn.sigmoid(x)
    if lt == "tanh":
        return jnp.tanh(x)
    if lt == "linear":
        return x
    if lt == "relu":
        return jnp.maximum(0.0, x)
    if lt == "leakyrelu":
        return jnp.maximum(0.01 * x, x)
    if lt == "softplus":
        return jnp.log1p(jnp.exp(x))
    if lt == "softsign":
        return x / (1.0 + jnp.abs(x))
    if lt == "softmax":
        return jax.nn.softmax(x, axis=1)
    raise ValueError(f"unknown layer type: {layer_type}")


def compute_states(layer_type: str, probs: jnp.ndarray, x: jnp.ndarray, key) -> jnp.ndarray:
    """dbn/computeStates.m:18-33 (sigm: Bernoulli; linear: +N(0,1); ReLU: NReLU)."""
    lt = layer_type.lower()
    if lt == "sigm":
        return (probs > jax.random.uniform(key, probs.shape)).astype(probs.dtype)
    if lt == "linear":
        return probs + jax.random.normal(key, probs.shape, probs.dtype)
    if lt == "relu":
        sigma = jax.nn.sigmoid(x)
        noise = sigma * jax.random.normal(key, probs.shape, probs.dtype)
        return jnp.maximum(0.0, x + noise)
    # other activation types have no stochastic state rule in the toolbox;
    # fall back to the deterministic activation
    return probs


def rbm_up(data, weights, hidbiases, hl_type, key):
    """dbn/RBMup.m:24-35 — returns (activations, states)."""
    pre = data @ weights + hidbiases
    probs = compute_activations(hl_type, pre)
    return probs, compute_states(hl_type, probs, pre, key)


def rbm_down(states, weights, visbiases, vl_type, key):
    """dbn/RBMdown.m:26-36 — returns (activations, states)."""
    pre = states @ weights.T + visbiases
    probs = compute_activations(vl_type, pre)
    return probs, compute_states(vl_type, probs, pre, key)


def init_rbm(key, num_dims: int, num_hid: int, vl_type: str, hl_type: str):
    """dbn/trainRBM.m:58-66 — 0.1*randn weights (0.01 for ReLU), zero biases."""
    scale = 0.01 if "relu" in (vl_type.lower(), hl_type.lower()) else 0.1
    return {
        "weights": scale * jax.random.normal(key, (num_dims, num_hid), jnp.float32),
        "hidbiases": jnp.zeros((1, num_hid), jnp.float32),
        "visbiases": jnp.zeros((1, num_dims), jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=("vl_type", "hl_type", "cd_type", "batchsize"),
                   donate_argnums=(0, 1))
def cd1_step(state, velocity, data, row_mask, key, momentum, lrs,
             *, vl_type, hl_type, cd_type, batchsize, weight_penalty_l2=0.0002):
    """One CD-1 minibatch update (dbn/trainRBM.m:95-158).

    ``row_mask`` (B, 1) zeroes padded rows out of every reduction so a
    zero-padded final batch matches MATLAB's smaller final batch exactly.
    """
    lr_w, lr_vb, lr_hb = lrs
    k1, k2, k3 = jax.random.split(key, 3)
    w, hb, vb = state["weights"], state["hidbiases"], state["visbiases"]
    data = data * row_mask

    pos_probs, pos_states = rbm_up(data, w, hb, hl_type, k1)
    pos_probs = pos_probs * row_mask
    pos_states = pos_states * row_mask
    pos_hid = pos_probs if cd_type == 1 else pos_states
    posprods = data.T @ pos_hid
    poshidact = jnp.sum(pos_hid, axis=0, keepdims=True)
    posvisact = jnp.sum(data, axis=0, keepdims=True)

    neg_vis_probs, neg_vis_states = rbm_down(pos_states, w, vb, vl_type, k2)
    neg_vis = (neg_vis_probs if cd_type == 1 else neg_vis_states) * row_mask
    neg_hid_probs, _ = rbm_up(neg_vis, w, hb, hl_type, k3)
    neg_hid_probs = neg_hid_probs * row_mask
    negprods = neg_vis.T @ neg_hid_probs
    negvisact = jnp.sum(neg_vis, axis=0, keepdims=True)
    neghidact = jnp.sum(neg_hid_probs, axis=0, keepdims=True)
    err = jnp.sum(((data - neg_vis) * row_mask) ** 2)

    grad_w = (posprods - negprods) / batchsize
    grad_vb = (posvisact - negvisact) / batchsize
    grad_hb = (poshidact - neghidact) / batchsize

    new_vel = {
        "weights": momentum * velocity["weights"] + lr_w * (grad_w - weight_penalty_l2 * w),
        "visbiases": momentum * velocity["visbiases"] + lr_vb * grad_vb,
        "hidbiases": momentum * velocity["hidbiases"] + lr_hb * grad_hb,
    }
    new_state = {
        "weights": w + new_vel["weights"],
        "hidbiases": hb + new_vel["hidbiases"],
        "visbiases": vb + new_vel["visbiases"],
    }
    return new_state, new_vel, err


def train_rbm(
    key,
    data: np.ndarray,
    num_hid: int,
    vl_type: str,
    hl_type: str,
    hyper: RBMHyperParams = RBMHyperParams(),
    log_fn=print,
):
    """Train one RBM (dbn/trainRBM.m:72-169).  Returns (rbm_state, errors)."""
    from ip_avsr_tpu.utils import compilation_cache

    compilation_cache.enable()  # the epoch scan is a big one-time compile
    data = np.asarray(data, np.float32)
    n, d = data.shape
    bs = hyper.batchsize
    n_batches = -(-n // bs)
    lrs = hyper.rates_for(vl_type.lower(), hl_type.lower())

    key, init_key = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    state = init_rbm(init_key, d, num_hid, vl_type, hl_type)
    velocity = {k: jnp.zeros_like(v) for k, v in state.items()}
    rng = np.random.RandomState(np.asarray(jax.random.key_data(init_key))[-1] % (2**31))

    errors = []
    for epoch in range(hyper.epochs):
        order = rng.permutation(n)
        momentum = (hyper.final_momentum if epoch + 1 > hyper.momentum_epoch_thres
                    else hyper.init_momentum)
        # stack the epoch's shuffled batches once and run ONE on-device scan:
        # a single host<->device round trip per epoch instead of one per
        # minibatch (the key-split order inside the scan matches the
        # per-batch loop exactly, so results are unchanged)
        # one vectorized gather + zero-pad (identical to a per-batch slice
        # loop over `order`, without the Python hot loop each epoch)
        batch_stack = np.zeros((n_batches * bs, d), np.float32)
        batch_stack[:n] = data[order]
        batch_stack = batch_stack.reshape(n_batches, bs, d)
        mask_stack = (np.arange(n_batches * bs) < n).astype(np.float32) \
            .reshape(n_batches, bs, 1)
        state, velocity, key, err_sum = _rbm_epoch(
            state, velocity, key, jnp.asarray(batch_stack),
            jnp.asarray(mask_stack), jnp.asarray(momentum, jnp.float32),
            tuple(jnp.asarray(r, jnp.float32) for r in lrs),
            vl_type=vl_type.lower(), hl_type=hl_type.lower(),
            cd_type=hyper.cd_type, batchsize=bs,
            weight_penalty_l2=hyper.weight_penalty_l2,
        )
        err_sum = float(err_sum)
        errors.append(err_sum / n)
        log_fn(f"RBM epoch {epoch + 1}: mse/sample = {err_sum / n:.6f}")
    return {k: np.asarray(v) for k, v in state.items()}, errors


@functools.partial(jax.jit,
                   static_argnames=("vl_type", "hl_type", "cd_type",
                                    "batchsize", "weight_penalty_l2"))
def _rbm_epoch(state, velocity, key, batch_stack, mask_stack, momentum, lrs,
               *, vl_type, hl_type, cd_type, batchsize, weight_penalty_l2):
    """One epoch of CD-1 minibatch updates as a single lax.scan."""

    def body(carry, inputs):
        state, velocity, key, err_sum = carry
        batch, mask = inputs
        key, step_key = jax.random.split(key)
        state, velocity, err = cd1_step(
            state, velocity, batch, mask, step_key, momentum, lrs,
            vl_type=vl_type, hl_type=hl_type, cd_type=cd_type,
            batchsize=batchsize, weight_penalty_l2=weight_penalty_l2)
        return (state, velocity, key, err_sum + err), None

    (state, velocity, key, err_sum), _ = jax.lax.scan(
        body, (state, velocity, key, jnp.float32(0.0)),
        (batch_stack, mask_stack))
    return state, velocity, key, err_sum


def normalise_data(tr_fcn: str, data: np.ndarray, ps: Optional[tuple] = None):
    """dbn/normaliseData.m:6-34 — linear: featurewise mapstd; sigm: /max.

    Unlike the MATLAB original, the 'sigm' branch also honors the ``ps``
    reuse contract: the first call records the training max, later calls
    (val/test) divide by THAT max instead of their own — otherwise splits
    with different dynamic ranges are silently scaled inconsistently for
    the pretrained network.  First-call results are identical to MATLAB.
    """
    if tr_fcn.lower() == "linear":
        if ps is None:
            mean = data.mean(axis=0)
            std = data.std(axis=0, ddof=1)
            std = np.where(std == 0, 1.0, std)
            ps = (mean, std)
        mean, std = ps
        return (data - mean) / std, ps
    if tr_fcn.lower() == "sigm":
        if ps is None:
            ps = (float(np.max(data)),)
        return data / ps[0], ps
    return data, ps
