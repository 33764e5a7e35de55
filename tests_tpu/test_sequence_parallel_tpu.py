"""Sequence-parallel forward on the real chip.

tests/test_sequence_parallel.py proves multi-shard correctness on the
virtual CPU mesh; this suite proves the TPU lowering of the same program —
shard_map + ppermute halo exchange + all-to-all reshard — compiles and
matches the plain forward on actual hardware (a single chip, so a
degenerate 1x1 mesh; the collective code paths still trace and lower).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.parallel import sequence as seq_lib


def test_adenet_forward_sp_single_chip_matches_plain():
    cfg = zoo.adenet_v3(40, 10, 40, lstm_size=8, window=3, output_classes=5)
    enc = {"encoder_shapes": (24, 16, 8),
           "encoder_nonlinearities": ("sigmoid", "sigmoid", "linear")}
    streams = [adenet.StreamSpec(**{**s.__dict__, **enc}) if s.encoder_shapes else s
               for s in cfg.streams]
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 4, 8
    inputs = [jnp.asarray(rng.randn(B, T, s.input_dim).astype(np.float32))
              for s in cfg.streams]
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))

    plain = np.asarray(jax.jit(
        lambda p, a, b, c, m: adenet.adenet_forward(p, cfg, [a, b, c], m)
    )(params, *inputs, mask))

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "seq"))
    with mesh:
        got = np.asarray(jax.jit(
            lambda p, a, b, c, m: seq_lib.adenet_forward_sp(
                p, cfg, [a, b, c], m, mesh)
        )(params, *inputs, mask))
    np.testing.assert_allclose(got, plain, rtol=2e-2, atol=1e-4)  # bf16 matmuls
