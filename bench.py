"""Benchmark: flagship trimodal AdeNet-v3 forward throughput (ROI -> logits).

Prints ONE JSON line:
  {"metric": "trimodal_fwd_utt_per_sec_per_chip", "value": N,
   "unit": "utterances/sec/chip", "vs_baseline": N / cpu_reference}

The baseline denominator is the measured throughput of a reference-equivalent
CPU implementation (pure NumPy: BLAS matmuls + per-timestep recurrence —
what Theano compiled for the reference; the repo itself publishes no numbers,
see BASELINE.md).  The denominator is cached in .bench_baseline.json after
first measurement.

Model/problem size: OuluVS trimodal (oulu/trimodal_with_val.py:378-382) —
1144-dim ROI, 90-dim DCT, 1144-dim diff images, 2000/1000/500/50 encoders,
LSTM 250 (streams 500), BLSTM 500 aggregator, delta window 9, T=29 frames.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")

T_FRAMES = 29


def build(batch, matmul_dtype=None, tiny=False):
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.models import adenet, zoo
    from ip_avsr_tpu.utils import compilation_cache

    compilation_cache.enable()

    if tiny:
        cfg = zoo.adenet_v3(64, 16, 64, lstm_size=16, window=4, output_classes=10)
        enc = (("sigmoid", "sigmoid", "sigmoid", "linear"), (32, 24, 16, 8))
        streams = []
        for s in cfg.streams:
            if s.encoder_shapes:
                streams.append(adenet.StreamSpec(**{**s.__dict__, "encoder_shapes": enc[1],
                                                    "encoder_nonlinearities": enc[0]}))
            else:
                streams.append(s)
        cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})
    else:
        cfg = zoo.adenet_v3(1144, 90, 1144, lstm_size=250, window=9, output_classes=10)
    if matmul_dtype:
        cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "matmul_dtype": matmul_dtype})
    if jax.default_backend() == "tpu":
        # Pallas LSTM recurrence for inference: bit-exact vs the XLA scan,
        # ~14% higher full-model throughput (weights VMEM-resident)
        cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "lstm_impl": "pallas"})

    # initialize on the host CPU backend: init is dozens of tiny ops that are
    # pathological to dispatch one-by-one through the remote TPU tunnel
    with jax.default_device(jax.devices("cpu")[0]):
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    inputs = [rng.randn(batch, T_FRAMES, s.input_dim).astype(np.float32)
              for s in cfg.streams]
    lens = rng.randint(T_FRAMES // 2, T_FRAMES + 1, batch)
    mask = (np.arange(T_FRAMES)[None, :] < lens[:, None]).astype(np.float32)
    return cfg, params, inputs, mask


def measure_tpu(batch, iters, matmul_dtype="bfloat16", tiny=False, bf16_params=True):
    """Forward throughput with airtight timing.

    ``iters`` forwards are chained inside ONE jitted program with a data
    dependency between iterations (iteration i+1's input is perturbed by a
    zero-scaled function of iteration i's output), and the result is fetched
    to the host.  This defeats async dispatch / lazy-sync runtimes: the
    wall-clock between call and host value necessarily covers all ``iters``
    sequential executions.
    """
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.models import adenet

    cfg, params, inputs, mask = build(batch, matmul_dtype, tiny)
    device = jax.devices()[0]
    if bf16_params:
        # inference weights in bf16: halves weight HBM traffic; predictions
        # verified stable vs f32 (tests/test_models.py::test_bfloat16_...)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    params = jax.device_put(params, device)

    def forward(params, raw, dct, diff, mask):
        return adenet.adenet_forward(params, cfg, [raw, dct, diff], mask, train=False)

    @jax.jit
    def chained(params, raw, dct, diff, mask, n):
        def body(_, carry):
            acc, raw_i = carry
            out = forward(params, raw_i, dct, diff, mask)
            s = jnp.sum(out).astype(jnp.float32)
            # dependency: next input differs by 0.0 * f(out) — the compiler
            # cannot drop or reorder iterations without changing semantics
            return acc + s, raw_i + 0.0 * s
        acc, _ = jax.lax.fori_loop(0, n, body, (0.0, raw))
        return acc

    dev_inputs = [jax.device_put(x, device) for x in inputs]
    dev_mask = jax.device_put(mask, device)
    _ = float(chained(params, *dev_inputs, dev_mask, 1))  # compile + warmup
    t0 = time.perf_counter()
    acc = float(chained(params, *dev_inputs, dev_mask, iters))  # host fetch = sync
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    return batch * iters / dt


def measure_cpu_reference(batch=16, iters=2, tiny=False):
    from ip_avsr_tpu.reference_impl import adenet_forward_np

    cfg, params, inputs, mask = build(batch, None, tiny)
    host_params = _to_numpy(params)
    adenet_forward_np(host_params, cfg, inputs, mask)  # warmup / one-time numpy alloc
    t0 = time.perf_counter()
    for _ in range(iters):
        adenet_forward_np(host_params, cfg, inputs, mask)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes / few iters")
    ap.add_argument("--batch", type=int, default=0, help="override batch size")
    ap.add_argument("--refresh-baseline", action="store_true")
    args = ap.parse_args()

    tiny = False
    if args.quick:
        batches = [args.batch or 512]
        iters = 10
        cpu_iters = 1
    else:
        batches = [args.batch] if args.batch else [512, 1024, 2048]
        iters = 20
        cpu_iters = 3

    # denominator: reference-equivalent CPU throughput (cached)
    cache_key = "tiny" if tiny else "full"
    baseline = None
    if os.path.exists(_CACHE) and not args.refresh_baseline:
        try:
            baseline = json.load(open(_CACHE)).get(cache_key)
        except Exception:
            baseline = None
    if baseline is None:
        cpu_tput = measure_cpu_reference(batch=16, iters=cpu_iters, tiny=tiny)
        baseline = {"utt_per_sec": cpu_tput, "batch": 16}
        cache = {}
        if os.path.exists(_CACHE):
            try:
                cache = json.load(open(_CACHE))
            except Exception:
                cache = {}
        cache[cache_key] = baseline
        json.dump(cache, open(_CACHE, "w"))

    best = 0.0
    for b in batches:
        tput = measure_tpu(b, iters, tiny=tiny)
        best = max(best, tput)

    print(json.dumps({
        "metric": "trimodal_fwd_utt_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(best / baseline["utt_per_sec"], 2),
    }))


if __name__ == "__main__":
    main()
