"""On-device input pipeline vs host preprocessing; end-to-end serving."""

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.data import preprocessing as pp
from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.ops import pipeline
from ip_avsr_tpu import serve


def test_samplewise_normalize_matches_host():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 12).astype(np.float32) * 3 + 1
    dev = np.asarray(pipeline.samplewise_normalize(jnp.asarray(x)))
    host = pp.normalize_input(x.reshape(10, 12).copy()).reshape(2, 5, 12)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)


def test_diff_images_matches_host():
    rng = np.random.RandomState(1)
    x = rng.randn(12, 6).astype(np.float32)
    lens = [7, 5]
    host = pp.compute_diff_images(x, lens)
    # device version works on padded per-sequence rows
    dev0 = np.asarray(pipeline.diff_images(jnp.asarray(x[:7][None])))[0]
    dev1 = np.asarray(pipeline.diff_images(jnp.asarray(x[7:][None])))[0]
    np.testing.assert_allclose(dev0, host[:7], atol=1e-6)
    np.testing.assert_allclose(dev1, host[7:], atol=1e-6)


def test_sequencewise_mean_subtract_matches_host():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 5).astype(np.float32)
    mask = np.ones((1, 8), np.float32)
    mask[0, 6:] = 0
    dev = np.asarray(pipeline.sequencewise_mean_subtract(jnp.asarray(x), jnp.asarray(mask)))
    host = pp.sequencewise_mean_image_subtraction(x[0, :6], [6])
    np.testing.assert_allclose(dev[0, :6], host, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dev[0, 6:], 0)


def test_dct_device_matches_host():
    rng = np.random.RandomState(3)
    x = rng.randn(6, 24).astype(np.float32)
    from ip_avsr_tpu.ops.dct import compute_dct_features_device

    dev = np.asarray(compute_dct_features_device(jnp.asarray(x), (4, 6), 5))
    host = pp.compute_dct_features(x.astype(np.float64), (4, 6), no_coeff=5)
    np.testing.assert_allclose(dev, host, rtol=1e-3, atol=1e-4)


def test_trimodal_server_end_to_end():
    ENC = (("sigmoid", "sigmoid", "linear"), (16, 12, 6))
    cfg = zoo.adenet_v3(24, 8, 24, lstm_size=6, window=3, output_classes=5)
    streams = []
    for s in cfg.streams:
        kw = {**s.__dict__, "dropout": 0.0}
        if s.encoder_shapes:
            kw.update(encoder_shapes=ENC[1], encoder_nonlinearities=ENC[0])
        streams.append(adenet.StreamSpec(**kw))
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams,
                                 "agg_dropout": 0.0})
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)

    server = serve.make_trimodal_server(params, cfg, image_shape=(4, 6), dct_coeffs=8)
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(3, 7, 24).astype(np.float32))
    mask = jnp.asarray(np.ones((3, 7), np.float32))
    scores = np.asarray(server(raw, mask))
    assert scores.shape == (3, 5)
    np.testing.assert_allclose(scores.sum(-1), 1.0, atol=1e-5)


def test_generic_server_votes():
    cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=6, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    server = serve.make_server(params, cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 10).astype(np.float32))
    mask = jnp.asarray(np.ones((2, 6), np.float32))
    scores = np.asarray(server([x], mask))
    assert scores.shape == (2, 4)
