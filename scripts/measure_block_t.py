"""A/B multi-timestep (block_t / K) Pallas LSTM kernel blocking on the chip.

NEGATIVE RESULT (r4, measured on v5e; kernels reverted to K=1-only).  The
hypothesis was that the sequential grid pays a fixed per-step cost that K
timesteps per grid invocation would amortize.  Measured with the airtight
chained-iteration timing (input perturbed by 0.0*prev so the loop body
cannot be hoisted), T=29 H=250 block_b=128:

    B=256  K=1: train-fwd   9.7 us   fwd+bwd   67.2 us
    B=256  K=2: train-fwd   7.0 us   fwd+bwd  198.6 us
    B=256  K=4: train-fwd   7.9 us   fwd+bwd  458.3 us
    B=1024 K=1: train-fwd 774.3 us   fwd+bwd 1164.7 us
    B=1024 K=2: train-fwd 1291.8 us  fwd+bwd 2232.6 us
    B=1024 K=4: train-fwd 1321.9 us  fwd+bwd 2413.8 us

K>1 LOSES 1.7-2x (fwd, large batch) to 3-7x (bwd): the K-wide blocks grow
the double-buffered VMEM windows K-fold, which stalls the pallas pipeline's
DMA/compute overlap, and the unrolled in-kernel loop serializes K output
writes per grid step.  At B=256 the forward is already at the ~8 us
latency floor — nothing left to amortize.  The 1-step-per-grid-invocation
kernels with block_b=128 stand as the optimum of everything tried
(block_b 256: wash, r3; bf16 residuals: 0.9-0.95x, r4; K blocking: this).

This script reproduces the table against a checkout that adds `block_t=`
kwargs to the kernels (see git history); on HEAD only K=1 runs.

Usage: python scripts/measure_block_t.py [B ...]
"""

import inspect
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ip_avsr_tpu.ops.pallas import lstm_kernel as lk


def time_chain(fn, *args, iters=30):
    """fn(x, *rest) -> scalar; chained via lax.fori_loop with the FIRST arg
    perturbed by 0.0 * (previous scalar) each iteration, so the body is not
    loop-invariant and cannot be hoisted (same pattern as bench.py)."""
    def loop(n, a):
        def body(_, carry):
            acc, x = carry
            s = fn(x, *a[1:])
            return acc + s, x + 0.0 * s
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), a[0]))
        return acc

    jitted = jax.jit(loop)
    _ = float(jitted(1, args))
    t0 = time.perf_counter()
    s = float(jitted(1, args))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2 = float(jitted(1 + iters, args))
    t_long = time.perf_counter() - t0
    assert np.isfinite(s) and np.isfinite(s2)
    return max(t_long - t_short, 1e-9) / iters


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 1024]
    T, H, D = 29, 250, 250
    rng = np.random.RandomState(0)
    for B in batches:
        x_proj_t = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32))
        w_hid = jnp.asarray((rng.randn(H, 4 * H) * 0.05).astype(np.float32))
        lens = rng.randint(T // 2, T + 1, B)
        mask_t = jnp.asarray(
            (np.arange(T)[:, None] < lens[None, :]).astype(np.float32))[..., None]
        cell0 = jnp.zeros((B, H), jnp.float32)
        hid0 = jnp.zeros((B, H), jnp.float32)
        g_out = jnp.asarray(rng.randn(T, B, H).astype(np.float32))

        has_block_t = "block_t" in inspect.signature(
            lk.lstm_pallas_train).parameters
        for K in (1, 2, 4) if has_block_t else (1,):
            kw = {"block_t": K} if has_block_t else {}

            def fwd(x_proj_t, w_hid, mask_t, cell0, hid0, kw=kw):
                h, c, g = lk.lstm_pallas_train(x_proj_t, w_hid, mask_t, cell0,
                                               hid0, **kw)
                return jnp.sum(h[-1]) + jnp.sum(c[-1]) + jnp.sum(g[-1])

            def fwdbwd(x_proj_t, w_hid, mask_t, cell0, hid0, g_out, kw=kw):
                h, c, g = lk.lstm_pallas_train(x_proj_t, w_hid, mask_t, cell0,
                                               hid0, **kw)
                cp = jnp.concatenate([cell0[None], c[:-1]], axis=0)
                dg, dc0, dh0 = lk.lstm_pallas_bwd_chain(
                    g_out, g, c, cp, mask_t, w_hid, 5.0, **kw)
                return jnp.sum(dg[0]) + jnp.sum(dc0) + jnp.sum(dh0)

            try:
                t_f = time_chain(fwd, x_proj_t, w_hid, mask_t, cell0, hid0)
                t_fb = time_chain(fwdbwd, x_proj_t, w_hid, mask_t, cell0, hid0,
                                  g_out)
                print(f"B={B:5d} K={K}: train-fwd {t_f*1e6:8.1f} us   "
                      f"fwd+bwd {t_fb*1e6:8.1f} us")
            except Exception as e:  # noqa: BLE001 — VMEM OOM at big K is data
                print(f"B={B:5d} K={K}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
