"""Ablation timing of the flagship TRAIN step: which component owns the time.

Times fwd+bwd (value_and_grad, gradients consumed in the chained scalar so
XLA cannot dead-code the backward) of each piece of the trimodal model at
the bench's train shape, plus the full train step, with the airtight
chained-iteration discipline.  Diagnostic tool, not part of the bench
contract.

Usage: python scripts/profile_train_parts.py [B] [f32|bf16]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build, _make_train_step
from ip_avsr_tpu.models import adenet, encoder as encoder_mod
from ip_avsr_tpu.ops import lstm as lstm_ops
from ip_avsr_tpu.ops.delta import delta_layer


def timed(fn, args, iters=10, label=""):
    """fn(x0, *rest) -> scalar; chained with the input perturbed per
    iteration (bench.py discipline)."""
    @jax.jit
    def chained(n, *args):
        def body(_, carry):
            acc, x0 = carry
            s = jnp.sum(fn(x0, *args[1:])).astype(jnp.float32)
            return acc + s, x0 + 0.0 * s
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), args[0]))
        return acc

    v = float(chained(1, *args))
    assert np.isfinite(v), label
    t0 = time.perf_counter()
    _ = float(chained(1, *args))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(1 + iters, *args))
    dt = (time.perf_counter() - t0 - t_short) / iters
    print(f"{label:34s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def grad_of(fn):
    """Scalarize fn and return x0 -> loss + <consumed grads> so the backward
    survives DCE."""
    def loss(x0, *rest):
        out = fn(x0, *rest)
        return jnp.sum(out * out) * 1e-6

    def run(x0, *rest):
        v, g = jax.value_and_grad(loss)(x0, *rest)
        return v + jax.tree_util.tree_reduce(
            lambda a, le: a + jnp.sum(le) * 1e-6, g, jnp.float32(0.0))
    return run


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    # dtype arg: "bf16" (default — what the bench's train metric runs) or "f32"
    f32 = len(sys.argv) > 2 and sys.argv[2] == "f32"
    md = None if f32 else "bfloat16"
    mm_label = "f32" if f32 else "bf16"
    cfg, params, inputs, mask = build(B, md)
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "lstm_impl": "xla"})
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    raw, dct, diff = [jax.device_put(x, dev) for x in inputs]
    mask_d = jax.device_put(mask.astype(np.float32), dev)
    T = raw.shape[1]
    print(f"B={B} T={T} matmul={mm_label}", flush=True)

    spec0 = cfg.streams[0]
    enc_p = params["streams"][spec0.name]["encoder"]

    def enc_fn(x):
        flat = x.reshape(B * T, spec0.input_dim)
        return encoder_mod.encoder_forward(enc_p, flat,
                                           spec0.encoder_nonlinearities,
                                           matmul_dtype=md)

    timed(enc_fn, (raw,), label="encoder fwd (1144->50)")
    timed(grad_of(enc_fn), (raw,), label="encoder fwd+bwd")

    enc50 = jax.device_put(
        np.random.RandomState(0).randn(B, T, 50).astype(np.float32), dev)
    timed(grad_of(lambda x: delta_layer(x, cfg.window)), (enc50,),
          label="delta fwd+bwd (50-dim, w=9)")

    sl = params["streams"][spec0.name]["lstm"]
    H = sl["w_hid"].shape[0]
    feat = jax.device_put(
        np.random.RandomState(0).randn(B, T, sl["w_in"].shape[0])
        .astype(np.float32), dev)

    def stream_lstm(x):
        return lstm_ops.lstm_forward(sl, x, mask_d, matmul_dtype=md)

    timed(stream_lstm, (feat,), label=f"stream LSTM fwd (D=150,H={H})")
    timed(grad_of(stream_lstm), (feat,), label="stream LSTM fwd+bwd")

    agg = params["aggregator"][0]
    fdim = cfg.fused_dim()
    fused = jax.device_put(
        np.random.RandomState(0).randn(B, T, fdim).astype(np.float32), dev)

    def blstm(x):
        return (lstm_ops.lstm_forward(agg["fwd"], x, mask_d, matmul_dtype=md)
                + lstm_ops.lstm_forward(agg["bwd"], x, mask_d, backwards=True,
                                        matmul_dtype=md))

    timed(grad_of(blstm), (fused,),
          label=f"BLSTM agg fwd+bwd (D={fdim},H={agg['fwd']['w_hid'].shape[0]})")

    def full_fwd(r, d1, d2, m):
        return adenet.adenet_forward(params, cfg, [r, d1, d2], m, train=False)

    timed(full_fwd, (raw, dct, diff, mask_d), label="FULL fwd (inference)")

    optimizer, train_step = _make_train_step(cfg)
    opt_state = jax.device_put(optimizer.init(params), dev)
    y = jax.device_put(
        np.random.RandomState(1).randint(0, 10, B).astype(np.int32), dev)

    def step_scalar(r, d1, d2):
        p2, o2, loss = train_step(params, opt_state, [r, d1, d2], y, mask_d,
                                  jax.random.PRNGKey(0))
        return loss + jax.tree_util.tree_reduce(
            lambda a, le: a + jnp.sum(le).astype(jnp.float32) * 1e-6,
            p2, jnp.float32(0.0))

    timed(step_scalar, (raw, dct, diff), label="FULL train step")


if __name__ == "__main__":
    main()
