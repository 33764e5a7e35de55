"""Pure-NumPy reference forward pass for AdeNet models.

Two purposes:
  1. an independent numerical cross-check for the JAX implementation
     (same math, different framework), and
  2. the measured "reference CPU" throughput denominator for BASELINE.md —
     the reference repo publishes no numbers (BASELINE.md), so the rebuild
     measures a CPU implementation equivalent to what Theano compiled:
     BLAS matmuls plus per-timestep recurrence loops.

Supports the composer topologies used by the flagship benchmarks (encoders,
delta, per-stream LSTMs, sum fusion, BLSTM aggregator, per-step or last-step
softmax).  No dropout/batch-norm (inference path).
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


_NONLIN = {
    "sigmoid": _sigmoid,
    "sigm": _sigmoid,
    "linear": lambda x: x,
    "rectify": lambda x: np.maximum(x, 0),
    "relu": lambda x: np.maximum(x, 0),
    "tanh": np.tanh,
}


def encoder_forward_np(enc_params: dict, x: np.ndarray, nonlinearities) -> np.ndarray:
    names = sorted(enc_params.keys(), key=lambda n: ({"fc1": 0, "fc2": 1, "fc3": 2,
                                                      "bottleneck": 3}.get(n, 99), n))
    out = x
    for name, nl in zip(names, nonlinearities):
        out = _NONLIN[nl](out @ np.asarray(enc_params[name]["w"])
                          + np.asarray(enc_params[name]["b"]))
    return out


def delta_np(x: np.ndarray, window: int) -> np.ndarray:
    """In-graph delta semantics (utils/signal.py:59-80): sum (y[t+k]-y[t-k])/2k."""
    T = x.shape[-2]
    pad = np.concatenate([np.repeat(x[..., :1, :], window, axis=-2), x,
                          np.repeat(x[..., -1:, :], window, axis=-2)], axis=-2)
    out = np.zeros_like(x)
    for k in range(1, window + 1):
        out += (pad[..., window + k : window + k + T, :]
                - pad[..., window - k : window - k + T, :]) / (2.0 * k)
    return out


def append_delta_np(x: np.ndarray, window: int) -> np.ndarray:
    d = delta_np(x, window)
    a = delta_np(d, window)
    return np.concatenate([x, d, a], axis=-1)


def lstm_forward_np(p: dict, x: np.ndarray, mask: np.ndarray,
                    backwards: bool = False) -> np.ndarray:
    w_in = np.asarray(p["w_in"]); w_hid = np.asarray(p["w_hid"]); b = np.asarray(p["b"])
    B, T, D = x.shape
    H = w_hid.shape[0]
    peep = "w_cell_to_ingate" in p
    if backwards:
        x = x[:, ::-1]
        mask = mask[:, ::-1]
    x_proj = x.reshape(B * T, D) @ w_in
    x_proj = x_proj.reshape(B, T, 4 * H) + b
    cell = np.repeat(np.asarray(p["cell_init"]), B, 0)
    hid = np.repeat(np.asarray(p["hid_init"]), B, 0)
    outs = np.empty((B, T, H), dtype=x.dtype)
    for t in range(T):
        gates = x_proj[:, t] + hid @ w_hid
        i, f, c, o = np.split(gates, 4, axis=1)
        if peep:
            i = i + cell * np.asarray(p["w_cell_to_ingate"])
            f = f + cell * np.asarray(p["w_cell_to_forgetgate"])
        i, f, c = _sigmoid(i), _sigmoid(f), np.tanh(c)
        new_cell = f * cell + i * c
        if peep:
            o = o + new_cell * np.asarray(p["w_cell_to_outgate"])
        o = _sigmoid(o)
        new_hid = o * np.tanh(new_cell)
        m = mask[:, t : t + 1].astype(x.dtype)
        cell = m * new_cell + (1 - m) * cell
        hid = m * new_hid + (1 - m) * hid
        outs[:, t] = hid
    return outs[:, ::-1] if backwards else outs


def adenet_forward_np(params: dict, config, inputs, mask) -> np.ndarray:
    """NumPy replica of models/adenet.adenet_forward (inference)."""
    B, T = inputs[0].shape[:2]
    mask = np.asarray(mask, np.float32)
    stream_outs = []
    for i, spec in enumerate(config.streams):
        sp = params["streams"][spec.name]
        x = np.asarray(inputs[i], np.float32)
        if spec.encoder_shapes:
            flat = x.reshape(B * T, spec.input_dim)
            x = encoder_forward_np(sp["encoder"], flat,
                                   spec.encoder_nonlinearities).reshape(B, T, -1)
        if spec.use_delta:
            x = append_delta_np(x, config.window)
        if spec.use_lstm:
            x = lstm_forward_np(sp["lstm"], x, mask)
        stream_outs.append(x)

    if config.fusiontype == "sum":
        fused = np.sum(stream_outs, axis=0)
    elif config.fusiontype == "concat":
        fused = np.concatenate(stream_outs, axis=-1)
    elif config.fusiontype == "adasum":
        fused = sum(np.asarray(params["adasum"][f"adacoeff{i}"]) * s
                    for i, s in enumerate(stream_outs))
    else:
        raise ValueError(config.fusiontype)

    agg = fused
    for lp in params["aggregator"]:
        if "bwd" in lp:
            agg = (lstm_forward_np(lp["fwd"], agg, mask)
                   + lstm_forward_np(lp["bwd"], agg, mask, backwards=True))
        else:
            agg = lstm_forward_np(lp["fwd"], agg, mask)

    w = np.asarray(params["output"]["w"]); b = np.asarray(params["output"]["b"])
    if config.output_mode == "per_step":
        logits = agg.reshape(B * T, -1) @ w + b
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return (e / e.sum(axis=1, keepdims=True)).reshape(B, T, -1)
    logits = agg[:, -1, :] @ w + b
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)
