"""Ablation timing of the flagship forward: which component owns the time.

Times each piece of the trimodal forward (encoders, delta, stream LSTMs,
BLSTM aggregator, full model) with the chained-iteration discipline from
bench.py, at the bench's headline shape.  Diagnostic tool, not part of the
bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build
from ip_avsr_tpu.models import adenet, encoder as encoder_mod
from ip_avsr_tpu.ops import lstm as lstm_ops
from ip_avsr_tpu.ops.delta import delta_layer


def timed(fn, args, iters=20, label=""):
    @jax.jit
    def chained(n, *args):
        def body(_, carry):
            acc, x0 = carry
            out = fn(x0, *args[1:])
            s = jnp.sum(out).astype(jnp.float32)
            return acc + s, x0 + 0.0 * s
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), args[0]))
        return acc

    _ = float(chained(1, *args))
    t0 = time.perf_counter()
    _ = float(chained(iters, *args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt*1e3:8.3f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    train_mode = len(sys.argv) > 2 and sys.argv[2] == "train"
    cfg, params, inputs, mask = build(B, "bfloat16")
    if jax.default_backend() == "tpu" and not train_mode:
        cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "lstm_impl": "pallas"})
    dev = jax.devices()[0]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    if train_mode:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x, params)
    params = jax.device_put(params, dev)
    raw, dct, diff = [jax.device_put(x, dev) for x in inputs]
    mask_d = jax.device_put(mask.astype(np.float32), dev)
    T = raw.shape[1]
    mm = jnp.bfloat16

    spec0 = cfg.streams[0]
    enc_p = params["streams"][spec0.name]["encoder"]

    def enc_fn(x):
        flat = x.reshape(B * T, spec0.input_dim)
        return encoder_mod.encoder_forward(enc_p, flat, spec0.encoder_nonlinearities,
                                           matmul_dtype=mm)

    timed(enc_fn, (raw,), label="encoder x1 (1144->50)")

    enc50 = jnp.zeros((B, T, 50), jnp.float32)
    enc50 = jax.device_put(np.random.RandomState(0).randn(B, T, 50).astype(np.float32), dev)

    timed(lambda x: delta_layer(x, cfg.window), (enc50,), label="delta (50-dim, w=9)")
    dct_dev = jax.device_put(np.random.RandomState(0).randn(B, T, 90).astype(np.float32), dev)
    timed(lambda x: delta_layer(x, cfg.window), (dct_dev,), label="delta (90-dim, w=9)")

    # stream LSTM: feature dim 150, H=500 (adenet_v3 2x width)
    sl_name = spec0.name
    sl = params["streams"][sl_name]["lstm"]
    H = sl["w_hid"].shape[0]
    feat = jax.device_put(np.random.RandomState(0).randn(B, T, sl["w_in"].shape[0])
                          .astype(np.float32), dev)

    def stream_lstm(x):
        if cfg.lstm_impl == "pallas" and not train_mode:
            from ip_avsr_tpu.ops.pallas import lstm_kernel
            return lstm_kernel.lstm_forward_pallas(sl, x, mask_d, matmul_dtype=mm)
        return lstm_ops.lstm_forward(sl, x, mask_d, matmul_dtype=mm)

    timed(stream_lstm, (feat,), label=f"stream LSTM (D=150,H={H})")

    agg = params["aggregator"][0]
    fdim = cfg.fused_dim()
    fused = jax.device_put(np.random.RandomState(0).randn(B, T, fdim).astype(np.float32), dev)

    def blstm(x):
        if cfg.lstm_impl == "pallas" and not train_mode:
            from ip_avsr_tpu.ops.pallas import lstm_kernel
            return (lstm_kernel.lstm_forward_pallas(agg["fwd"], x, mask_d, matmul_dtype=mm)
                    + lstm_kernel.lstm_forward_pallas(agg["bwd"], x, mask_d,
                                                      backwards=True, matmul_dtype=mm))
        return (lstm_ops.lstm_forward(agg["fwd"], x, mask_d, matmul_dtype=mm)
                + lstm_ops.lstm_forward(agg["bwd"], x, mask_d, backwards=True,
                                        matmul_dtype=mm))

    timed(blstm, (fused,), label=f"BLSTM agg (D={fdim},H={agg['fwd']['w_hid'].shape[0]})")

    def full(r, d1, d2, m):
        return adenet.adenet_forward(params, cfg, [r, d1, d2], m, train=False)

    timed(full, (raw, dct, diff, mask_d), label="FULL forward")


if __name__ == "__main__":
    main()
