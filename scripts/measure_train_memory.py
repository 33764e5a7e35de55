"""Compiler-accounted peak TEMP memory of the flagship train step.

``memory_analysis()`` on the compiled step — the compiler's own
accounting of the transient (non-parameter, non-I/O) buffers, the number
that determines whether a shape fits the chip — across the two shipped
residual levers (lstm_remat, lstm_residual_dtype=bfloat16).  Run on the
TPU-default process; results recorded in docs/DESIGN.md.

Usage: python scripts/measure_train_memory.py [B T [B T ...]]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from ip_avsr_tpu.models import adenet  # noqa: E402


def temp_gib(batch, T, remat, resd):
    cfg, params, _, _ = bench.build(batch)
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "lstm_impl": "xla",
                                 "lstm_remat": remat,
                                 "lstm_residual_dtype": resd})
    optimizer, train_step = bench._make_train_step(cfg)
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randn(batch, T, s.input_dim).astype(np.float32))
              for s in cfg.streams]
    mask = jnp.ones((batch, T), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, batch).astype(np.int32))
    opt_state = optimizer.init(params)
    f = jax.jit(lambda p, o, s, yy, m: train_step(p, o, list(s), yy, m,
                                                  jax.random.PRNGKey(0)))
    ma = (f.lower(params, opt_state, tuple(inputs), y, mask)
          .compile().memory_analysis())
    return ma.temp_size_in_bytes / 2 ** 30


def main(argv=None):
    args = [int(a) for a in (argv or sys.argv[1:])]
    shapes = list(zip(args[::2], args[1::2])) or [(1024, 29), (64, 512),
                                                  (64, 2048)]
    for B, T in shapes:
        for remat, resd in ((False, None), (True, None),
                            (False, "bfloat16"), (True, "bfloat16")):
            g = temp_gib(B, T, remat, resd)
            print(f"B={B} T={T} remat={int(remat)} "
                  f"resd={resd or 'f32'}: temp {g:.2f} GiB")


if __name__ == "__main__":
    main()
