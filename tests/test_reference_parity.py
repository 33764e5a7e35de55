"""Cross-implementation check: JAX forward == independent NumPy forward.

Every zoo builder (plus avnet, nstream-with-pretrained-LSTMs, the conv-AE
family, and the batch-norm train/eval paths) is run at test size against
``ip_avsr_tpu.reference_impl`` — a from-scratch NumPy implementation with no
shared code.  Agreement here means a numerics bug would have to exist twice,
independently, in the same way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu import reference_impl as ref
from ip_avsr_tpu.models import adenet, convae, zoo
from tests.zoo_cases import ENC, ENC_NL, ENC_SH, K, ZOO_CASES
from ip_avsr_tpu.ops import lstm as lstm_ops


def _run_case(cfg, pretrained_lstms=None, train=False):
    params = adenet.init_adenet_params(jax.random.PRNGKey(3), cfg,
                                       pretrained_stream_lstms=pretrained_lstms)
    rng = np.random.RandomState(0)
    B, T = 3, 9
    inputs = [rng.randn(B, T, s.input_dim).astype(np.float32) for s in cfg.streams]
    lens = rng.randint(4, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)

    out = adenet.adenet_forward(params, cfg, [jnp.asarray(x) for x in inputs],
                                jnp.asarray(mask), train=train,
                                return_aux=train and any(
                                    s.use_batchnorm for s in cfg.streams))
    if isinstance(out, tuple):
        out = out[0]
    jax_out = np.asarray(out)
    np_out = ref.adenet_forward_np(
        jax.tree_util.tree_map(np.asarray, params), cfg, inputs, mask,
        train=train)
    np.testing.assert_allclose(jax_out, np_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("name", sorted(ZOO_CASES))
def test_jax_matches_numpy_reference(name):
    # train=False everywhere: dropout off, BN running statistics
    _run_case(ZOO_CASES[name]())


def test_batchnorm_train_statistics_match():
    """adenet_v1 (dropout-free, BN on the encoder stream) in TRAIN mode:
    minibatch statistics, checked against the independent NumPy BN."""
    _run_case(ZOO_CASES["adenet_v1"](), train=True)


def test_nstream_with_pretrained_stream_lstms_matches():
    """adenet_nstream with externally supplied (pretrained) stream LSTM
    parameter bundles (modelzoo/adenet_3stream.py:12-116 create_pretrained_model)."""
    cfg = zoo.adenet_nstream([20, 8], [ENC, None], use_peepholes=True, **K)
    pre = []
    for i, s in enumerate(cfg.streams):
        pre.append(lstm_ops.init_lstm_params(
            jax.random.PRNGKey(100 + i), s.feature_dim(),
            cfg.stream_lstm_size(s), use_peepholes=True))
    _run_case(cfg, pretrained_lstms=pre)


@pytest.mark.parametrize("bn,drop", [(False, False), (True, False),
                                     (False, True), (True, True)])
def test_convae_forward_matches_numpy(bn, drop):
    """Tied-weight conv-AE (all four reference variants) vs the independent
    NumPy conv/deconv implementation (inference: dropout inactive)."""
    cfg = convae.ConvAEConfig(bottleneck=10, dense=20, use_batchnorm=bn,
                              use_dropout=drop)
    params = convae.init_convae_params(jax.random.PRNGKey(5), cfg)
    x = np.random.RandomState(0).randn(2, 30 * 40).astype(np.float32)
    got = np.asarray(convae.convae_forward(params, cfg, jnp.asarray(x),
                                           train=False))
    want = ref.convae_forward_np(
        jax.tree_util.tree_map(np.asarray, params), cfg, x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
