"""Model zoo: init/forward shape contracts and behavioral checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu.models import adenet, avnet, convae, zoo
from ip_avsr_tpu.io import matio

B, T = 3, 12
KEY = jax.random.PRNGKey(0)


def _run(cfg, dims, train=False):
    params = adenet.init_adenet_params(KEY, cfg)
    inputs = [jnp.asarray(np.random.RandomState(i).randn(B, T, d).astype(np.float32))
              for i, d in enumerate(dims)]
    mask = np.ones((B, T), np.uint8)
    mask[1, 7:] = 0
    out = adenet.adenet_forward(params, cfg, inputs, jnp.asarray(mask), train=train,
                                dropout_rng=jax.random.PRNGKey(1))
    return params, out


# small encoder to keep tests fast
ENC = (["sigmoid", "sigmoid", "sigmoid", "linear"], [32, 24, 16, 8])


def test_deltanet_majority_vote_shapes():
    cfg = zoo.deltanet_majority_vote(40, ENC[1], ENC[0], lstm_size=16, window=4,
                                     output_classes=26)
    _, out = _run(cfg, [40])
    assert out.shape == (B, T, 26)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_deltanet_last_step():
    cfg = zoo.deltanet(40, ENC[1], ENC[0], lstm_size=16, window=4, output_classes=26)
    _, out = _run(cfg, [40])
    assert out.shape == (B, 26)


def test_deltanet_v1_no_encoder():
    cfg = zoo.deltanet_v1(20, lstm_size=16, window=4, output_classes=10)
    params, out = _run(cfg, [20])
    assert out.shape == (B, T, 10)
    assert "encoder" not in params["streams"]["s1"]
    # single aggregator LSTM over 3x input dim (delta)
    assert params["aggregator"][0]["fwd"]["w_in"].shape == (60, 64)


def test_lstm_classifiers():
    cfg = zoo.lstm_classifier_baseline(20, lstm_size=16, output_classes=26)
    _, out = _run(cfg, [20])
    assert out.shape == (B, 26)
    cfg = zoo.lstm_classifier_majority_vote(20, lstm_size=16, output_classes=26,
                                            use_blstm=False)
    params, out = _run(cfg, [20])
    assert out.shape == (B, T, 26)
    assert "bwd" not in params["aggregator"][0]


def test_baseline_end2end_no_delta():
    cfg = zoo.baseline_end2end(40, ENC[1], ENC[0], lstm_size=16, output_classes=26)
    params, out = _run(cfg, [40])
    assert out.shape == (B, 26)
    # no delta -> stream feature dim is the bottleneck dim
    assert cfg.streams[0].feature_dim() == 8


@pytest.mark.parametrize("fusiontype", ["sum", "adasum", "concat"])
def test_adenet_v2_fusion_modes(fusiontype):
    cfg = zoo.adenet_v2(40, 10, ENC[1], ENC[0], lstm_size=16, window=4,
                        output_classes=26, fusiontype=fusiontype)
    params, out = _run(cfg, [40, 10])
    assert out.shape == (B, T, 26)
    if fusiontype == "adasum":
        assert set(params["adasum"].keys()) == {"adacoeff0", "adacoeff1"}


def test_adenet_v3_trimodal():
    cfg = zoo.adenet_v3(40, 10, 40, lstm_size=8, window=4, output_classes=10)
    # replace hard-coded big encoders with small test encoders
    streams = [
        adenet.StreamSpec(**{**cfg.streams[0].__dict__,
                             "encoder_shapes": tuple(ENC[1]),
                             "encoder_nonlinearities": tuple(ENC[0])}),
        cfg.streams[1],
        adenet.StreamSpec(**{**cfg.streams[2].__dict__,
                             "encoder_shapes": tuple(ENC[1]),
                             "encoder_nonlinearities": tuple(ENC[0])}),
    ]
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})
    params, out = _run(cfg, [40, 10, 40], train=True)
    assert out.shape == (B, 10)
    # stream LSTMs are sized lstm/(1-0.5) = 2x (modelzoo/adenet_v3.py:114)
    assert params["streams"]["raw"]["lstm"]["w_hid"].shape[0] == 16
    # aggregator is 2x lstm_size
    assert params["aggregator"][0]["fwd"]["w_hid"].shape[0] == 16


def test_adenet_v1_batchnorm_and_stacked_agg():
    cfg = zoo.adenet_v1(40, 10, lstm_size=8, window=4, output_classes=26)
    streams = [
        adenet.StreamSpec(**{**cfg.streams[0].__dict__,
                             "encoder_shapes": tuple(ENC[1]),
                             "encoder_nonlinearities": tuple(ENC[0])}),
        cfg.streams[1],
    ]
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})
    params = adenet.init_adenet_params(KEY, cfg)
    assert len(params["aggregator"]) == 2
    assert params["aggregator"][0]["fwd"]["w_hid"].shape[0] == 8
    assert params["aggregator"][1]["fwd"]["w_hid"].shape[0] == 16
    assert "bn" in params["streams"]["raw"]
    inputs = [jnp.asarray(np.random.RandomState(i).randn(B, T, d).astype(np.float32))
              for i, d in enumerate([40, 10])]
    mask = jnp.ones((B, T), jnp.uint8)
    out, aux = adenet.adenet_forward(params, cfg, inputs, mask, train=True,
                                     dropout_rng=jax.random.PRNGKey(1), return_aux=True)
    assert out.shape == (B, 26)
    assert "raw" in aux["bn_state"]


def test_nstream_builder():
    cfg = zoo.adenet_nstream([40, 40, 10, 10], [ENC, ENC, None, None], lstm_size=8,
                             window=4, output_classes=26)
    _, out = _run(cfg, [40, 40, 10, 10])
    assert out.shape == (B, T, 26)


def test_avnet_config():
    cfg = avnet.avnet_config([40, 13], ["visual", "audio"],
                             encoder_shapes=ENC[1], encoder_nonlinearities=ENC[0],
                             lstm_size=8, window=4, output_classes=10,
                             no_encoder_for=["audio"])
    params, out = _run(cfg, [40, 13])
    assert out.shape == (B, T, 10)
    assert "encoder" not in params["streams"]["audio"]
    assert "encoder" in params["streams"]["visual"]
    # peepholes enabled (modelzoo/avnet.py:71)
    assert "w_cell_to_ingate" in params["streams"]["visual"]["lstm"]


def test_dropout_only_at_train():
    cfg = zoo.adenet_v2(40, 10, ENC[1], ENC[0], lstm_size=8, window=4, output_classes=5)
    streams = [adenet.StreamSpec(**{**s.__dict__, "dropout": 0.5}) for s in cfg.streams]
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})
    params = adenet.init_adenet_params(KEY, cfg)
    inputs = [jnp.asarray(np.random.RandomState(i).randn(B, T, d).astype(np.float32))
              for i, d in enumerate([40, 10])]
    mask = jnp.ones((B, T), jnp.uint8)
    eval1 = adenet.adenet_forward(params, cfg, inputs, mask, train=False,
                                  dropout_rng=jax.random.PRNGKey(1))
    eval2 = adenet.adenet_forward(params, cfg, inputs, mask, train=False,
                                  dropout_rng=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(eval1), np.asarray(eval2))  # rng-independent
    tr1 = adenet.adenet_forward(params, cfg, inputs, mask, train=True,
                                dropout_rng=jax.random.PRNGKey(1))
    assert np.abs(np.asarray(tr1) - np.asarray(eval1)).max() > 1e-6


def test_pretrained_encoder_loading_and_lstm_bundle_roundtrip(tmp_path):
    # encoder .mat ABI -> model params
    rng = np.random.RandomState(0)
    weights = [rng.randn(40, 32).astype(np.float32), rng.randn(32, 24).astype(np.float32),
               rng.randn(24, 16).astype(np.float32), rng.randn(16, 8).astype(np.float32)]
    biases = [rng.randn(s).astype(np.float32) for s in [32, 24, 16, 8]]
    matio.save_dbn_mat(weights, biases, tmp_path / "enc.mat")
    w2, b2 = matio.load_dbn_mat(str(tmp_path / "enc.mat"), n_layers=4)
    cfg = zoo.adenet_v2(40, 10, ENC[1], ENC[0], lstm_size=8, window=4, output_classes=5)
    params = adenet.init_adenet_params(KEY, cfg, pretrained_encoders=[(w2, b2), None])
    np.testing.assert_allclose(np.asarray(params["streams"]["raw"]["encoder"]["fc1"]["w"]),
                               weights[0])

    # LSTM 12-key bundle round trip through a .mat file
    lstm_params = params["streams"]["raw"]["lstm"]
    d = matio.lstm_params_to_mat_dict(lstm_params, "lstm_raw")
    assert len(d) == 12
    matio.save_mat(d, tmp_path / "lstm.mat")
    loaded = matio.load_mat_file(str(tmp_path / "lstm.mat"))
    back = matio.lstm_params_from_mat_dict(loaded, "lstm_raw")
    np.testing.assert_allclose(np.asarray(lstm_params["w_in"]), back["w_in"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(lstm_params["w_hid"]), back["w_hid"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(lstm_params["b"]), back["b"], atol=1e-6)

    # feeding the bundle back as a pretrained stream LSTM
    params2 = adenet.init_adenet_params(KEY, cfg,
                                        pretrained_stream_lstms=[back, None])
    np.testing.assert_allclose(np.asarray(params2["streams"]["raw"]["lstm"]["w_in"]),
                               back["w_in"])


# ---------------------------------------------------------------------------
# conv autoencoder
# ---------------------------------------------------------------------------

def test_convae_shapes_and_tied_weights():
    cfg = convae.ConvAEConfig(bottleneck=12, dense=32)
    params = convae.init_convae_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1200).astype(np.float32))
    code = convae.convae_encode(params, cfg, x)
    assert code.shape == (2, 12)
    recon = convae.convae_forward(params, cfg, x)
    assert recon.shape == (2, 1200)
    assert cfg.conv_out_shape() == (3, 5)


def test_convae_dropout_variant_widens():
    cfg = convae.ConvAEConfig(bottleneck=10, dense=20, use_dropout=True)
    assert cfg.filters == (125, 300, 400)
    assert cfg.encode_size == 20
    params = convae.init_convae_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1200).astype(np.float32))
    recon = convae.convae_forward(params, cfg, x, train=True, rng=jax.random.PRNGKey(1))
    assert recon.shape == (2, 1200)


def test_convae_bn_variant():
    cfg = convae.ConvAEConfig(bottleneck=10, dense=20, use_batchnorm=True)
    params = convae.init_convae_params(jax.random.PRNGKey(0), cfg)
    assert "bn_conv1" in params
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1200).astype(np.float32))
    recon = convae.convae_forward(params, cfg, x, train=True)
    assert recon.shape == (2, 1200)


def test_convae_gradients():
    cfg = convae.ConvAEConfig(bottleneck=8, dense=16)
    params = convae.init_convae_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1200).astype(np.float32))

    def loss(p):
        return jnp.mean((convae.convae_forward(p, cfg, x) - x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert np.abs(np.asarray(g["conv1"]["w"])).sum() > 0


def test_bfloat16_matmul_accuracy():
    """bf16 matmul operands (f32 accumulation) keep predictions stable."""
    cfg32 = zoo.adenet_v2(40, 10, ENC[1], ENC[0], lstm_size=16, window=4,
                          output_classes=5)
    cfg16 = adenet.AdeNetConfig(**{**cfg32.__dict__, "matmul_dtype": "bfloat16"})
    params = adenet.init_adenet_params(KEY, cfg32)
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randn(4, 10, d).astype(np.float32)) for d in (40, 10)]
    mask = jnp.ones((4, 10), jnp.float32)
    p32 = np.asarray(adenet.adenet_forward(params, cfg32, inputs, mask))
    p16 = np.asarray(adenet.adenet_forward(params, cfg16, inputs, mask))
    assert np.abs(p32 - p16).max() < 0.05
    np.testing.assert_array_equal(p32.argmax(-1), p16.argmax(-1))
