"""Is the int8 MXU path worth an encoder quantization feature on this chip?

Times the encoder-shaped matmul chain in bf16 vs int8 (dynamic per-tensor
activation scales, per-column weight scales) with chained iterations.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [(59392, 1144, 2000), (59392, 2000, 1000), (59392, 1000, 500),
          (59392, 500, 50)]


def timed(fn, args, iters=30, label=""):
    @jax.jit
    def chained(n, x, *rest):
        def body(_, carry):
            acc, x0 = carry
            out = fn(x0, *rest)
            s = jnp.sum(out).astype(jnp.float32)
            return acc + s, x0 + 0.0 * s
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), x))
        return acc

    _ = float(chained(1, *args))
    t0 = time.perf_counter()
    _ = float(chained(iters, *args))
    dt = (time.perf_counter() - t0) / iters
    flops = sum(2 * m * k * n for m, k, n in SHAPES)
    print(f"{label:24s} {dt*1e3:8.3f} ms   {flops/dt/1e12:7.1f} TF/s")
    return dt


def main():
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    x0 = jax.device_put(rng.randn(SHAPES[0][0], SHAPES[0][1]).astype(np.float32), dev)
    ws = [jax.device_put(rng.randn(k, n).astype(np.float32) * 0.05, dev)
          for _, k, n in SHAPES]

    def chain_bf16(x, *ws):
        h = x
        for w in ws:
            h = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            h = jax.nn.sigmoid(h)
        return h

    def chain_int8(x, *ws):
        h = x
        for w in ws:
            # dynamic per-tensor activation scale, per-column weight scale
            a_s = jnp.max(jnp.abs(h)) / 127.0 + 1e-12
            hq = jnp.clip(jnp.round(h / a_s), -127, 127).astype(jnp.int8)
            w_s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0 + 1e-12
            wq = jnp.clip(jnp.round(w / w_s), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            h = jax.nn.sigmoid(acc.astype(jnp.float32) * (a_s * w_s))
        return h

    def chain_int8_prequant(x, *wq_and_scales):
        # weights quantized ahead of time (serving mode): only activations
        # quantize dynamically
        n = len(wq_and_scales) // 2
        wqs, wss = wq_and_scales[:n], wq_and_scales[n:]
        h = x
        for wq, w_s in zip(wqs, wss):
            a_s = jnp.max(jnp.abs(h)) / 127.0 + 1e-12
            hq = jnp.clip(jnp.round(h / a_s), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            h = jax.nn.sigmoid(acc.astype(jnp.float32) * (a_s * w_s))
        return h

    timed(chain_bf16, (x0, *ws), label="bf16 chain")
    timed(chain_int8, (x0, *ws), label="int8 dynamic chain")
    wqs = [jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0)),
                    -127, 127).astype(jnp.int8) for w in ws]
    wss = [jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0 for w in ws]
    timed(chain_int8_prequant, (x0, *wqs, *wss), label="int8 prequant chain")


if __name__ == "__main__":
    main()
