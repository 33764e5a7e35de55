"""Cross-implementation check: JAX forward == independent NumPy forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu import reference_impl as ref
from ip_avsr_tpu.models import adenet, zoo

ENC = (("sigmoid", "sigmoid", "sigmoid", "linear"), (24, 16, 12, 6))


def _small_v3():
    cfg = zoo.adenet_v3(20, 8, 20, lstm_size=6, window=3, output_classes=7)
    streams = []
    for s in cfg.streams:
        if s.encoder_shapes:
            streams.append(adenet.StreamSpec(**{**s.__dict__, "encoder_shapes": ENC[1],
                                                "encoder_nonlinearities": ENC[0],
                                                "dropout": 0.0}))
        else:
            streams.append(adenet.StreamSpec(**{**s.__dict__, "dropout": 0.0}))
    return adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams, "agg_dropout": 0.0})


@pytest.mark.parametrize("make_cfg", [
    _small_v3,
    lambda: zoo.adenet_v2(20, 8, ENC[1], ENC[0], lstm_size=6, window=3, output_classes=7),
    lambda: zoo.deltanet_majority_vote(20, ENC[1], ENC[0], lstm_size=6, window=3,
                                       output_classes=7),
    lambda: zoo.lstm_classifier_baseline(20, lstm_size=6, output_classes=7),
])
def test_jax_matches_numpy_reference(make_cfg):
    cfg = make_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    B, T = 3, 9
    inputs = [rng.randn(B, T, s.input_dim).astype(np.float32) for s in cfg.streams]
    lens = rng.randint(4, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)

    jax_out = np.asarray(adenet.adenet_forward(
        params, cfg, [jnp.asarray(x) for x in inputs], jnp.asarray(mask), train=False))
    np_out = ref.adenet_forward_np(
        jax.tree_util.tree_map(np.asarray, params), cfg, inputs, mask)
    np.testing.assert_allclose(jax_out, np_out, rtol=2e-4, atol=2e-5)
