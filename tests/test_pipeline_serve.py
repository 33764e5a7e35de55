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


def test_bucketed_server_static_shapes_and_chunking():
    """Bucketed serving: any request size maps to one of a fixed set of
    compiled shapes; padding never changes the valid rows' scores."""
    import jax.numpy as jnp

    from ip_avsr_tpu import serve as serve_lib
    from ip_avsr_tpu.models import adenet, zoo

    from ip_avsr_tpu.ops.voting import majority_voting_layer_masked

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=4, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    server = serve_lib.make_bucketed_server(params, cfg, batch_buckets=(2, 4),
                                            time_buckets=(5, 8))
    probs_fn = serve_lib.make_server(params, cfg, vote=False)

    def want_scores(x, lengths):
        mask = jnp.asarray((np.arange(x.shape[1])[None, :]
                            < np.asarray(lengths)[:, None]).astype(np.float32))
        probs = probs_fn([jnp.asarray(x)], mask)
        return np.asarray(majority_voting_layer_masked(probs, mask, 3))

    rng = np.random.RandomState(0)
    # odd batch (3 -> bucket 4), odd T (6 -> bucket 8)
    x = rng.randn(3, 6, 6).astype(np.float32)
    lengths = np.array([6, 4, 2])
    scores = np.asarray(server([x], lengths))
    assert scores.shape == (3, 3)
    np.testing.assert_allclose(scores, want_scores(x, lengths),
                               rtol=1e-5, atol=1e-6)

    # padding invariance: a different bucketing of the same request gives
    # the same scores
    server_b = serve_lib.make_bucketed_server(params, cfg, batch_buckets=(8,),
                                              time_buckets=(11,))
    np.testing.assert_allclose(scores, np.asarray(server_b([x], lengths)),
                               rtol=1e-5, atol=1e-6)

    # oversized request chunks by the largest batch bucket
    x9 = rng.randn(9, 5, 6).astype(np.float32)
    lengths9 = rng.randint(1, 6, 9)
    scores9 = np.asarray(server([x9], lengths9))
    assert scores9.shape == (9, 3)
    np.testing.assert_allclose(scores9, want_scores(x9, lengths9),
                               rtol=1e-5, atol=1e-6)


def test_bucketed_server_rejects_overlong_requests():
    """Time cannot be chunked (the recurrence carries state), so an
    over-long request must raise rather than silently classify a prefix —
    unless lossy truncation is explicitly opted into."""
    import pytest

    from ip_avsr_tpu import serve as serve_lib
    from ip_avsr_tpu.models import adenet, zoo

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=4, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    server = serve_lib.make_bucketed_server(params, cfg, batch_buckets=(4,),
                                            time_buckets=(5,))
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 6).astype(np.float32)  # T=9 > largest bucket 5
    with pytest.raises(ValueError, match="time bucket"):
        server([x], np.array([9, 7]))

    lossy = serve_lib.make_bucketed_server(params, cfg, batch_buckets=(4,),
                                           time_buckets=(5,),
                                           allow_time_truncation=True)
    scores = np.asarray(lossy([x], np.array([9, 7])))
    assert scores.shape == (2, 3)
    # equals serving the 5-frame prefix explicitly
    exact = serve_lib.make_bucketed_server(params, cfg, batch_buckets=(4,),
                                           time_buckets=(5,))
    np.testing.assert_allclose(
        scores, np.asarray(exact([x[:, :5]], np.array([5, 5]))),
        rtol=1e-5, atol=1e-6)


def test_pipelined_server_matches_sync_and_preserves_order():
    """PipelinedServer yields the same scores as the synchronous server, in
    submission order, for any pipeline depth (including depth > n_requests)."""
    from ip_avsr_tpu import serve as serve_lib

    cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=8, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    sync = serve_lib.make_server(params, cfg)
    rng = np.random.RandomState(0)
    reqs = []
    for i in range(7):
        x = rng.randn(1, 6, 10).astype(np.float32)
        mask = np.ones((1, 6), np.float32)
        mask[0, 4 + (i % 2):] = 0.0
        reqs.append(([x], mask))
    want = [np.asarray(sync([jnp.asarray(s) for s in st], jnp.asarray(m)))
            for st, m in reqs]

    for depth in (1, 3, 16):
        pipe = serve_lib.PipelinedServer(params, cfg, depth=depth)
        got = list(pipe.map(iter(reqs)))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7)


def test_server_vote_ignores_padding():
    """make_server/make_trimodal_server votes are MASKED (review r3): a
    padded request must score identically to the exact-length request —
    previously the constant pad-tail argmax could outvote the real frames."""
    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=4, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    server = serve.make_server(params, cfg)
    rng = np.random.RandomState(0)
    T = 5
    x = rng.randn(1, T, 6).astype(np.float32)
    exact = np.asarray(server([jnp.asarray(x)], jnp.ones((1, T), jnp.float32)))

    x_pad = np.pad(x, ((0, 0), (0, 20), (0, 0)))
    mask = np.zeros((1, T + 20), np.float32)
    mask[0, :T] = 1.0
    padded = np.asarray(server([jnp.asarray(x_pad)], jnp.asarray(mask)))
    assert np.argmax(padded) == np.argmax(exact)
    # vote counts are over valid frames only -> identical score vectors
    np.testing.assert_allclose(padded, exact, rtol=1e-5, atol=1e-6)


def test_trimodal_streams_zero_padded_positions():
    """trimodal_streams: every masked position is exactly zero in all three
    streams (the diff stream's first-pad 'ghost' frame previously leaked
    into the delta windows of the last valid frames)."""
    rng = np.random.RandomState(1)
    B, T, D = 2, 8, 24
    raw = jnp.asarray(rng.rand(B, T, D).astype(np.float32) * 255)
    mask = np.zeros((B, T), np.float32)
    mask[0, :5] = 1.0
    mask[1, :] = 1.0
    streams = pipeline.trimodal_streams(raw, jnp.asarray(mask), (4, 6), 8)
    for s in streams:
        s = np.asarray(s)
        assert np.all(s[0, 5:] == 0.0), "pad positions must be exactly zero"
        assert np.abs(s[0, :5]).max() > 0


def test_bucketed_server_novote_slices_time_padding():
    """vote=False per-step scores come back at the REQUEST's T, not the
    time bucket's (review r4: pad-frame softmax artifacts leaked)."""
    from ip_avsr_tpu import serve as serve_lib

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=4, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    server = serve_lib.make_bucketed_server(params, cfg, batch_buckets=(4,),
                                            time_buckets=(8,), vote=False)
    x = np.random.RandomState(0).randn(2, 5, 6).astype(np.float32)
    lengths = np.array([5, 3])
    scores = np.asarray(server([x], lengths))
    assert scores.shape == (2, 5, 3)
    # and the VALUES are the request's leading frames, matching the plain
    # server on the padded batch (not e.g. the trailing bucket frames)
    plain = serve_lib.make_server(params, cfg, vote=False)
    mask = (np.arange(5)[None, :] < lengths[:, None]).astype(np.float32)
    want = np.asarray(plain([jnp.asarray(x)], jnp.asarray(mask)))
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)


def test_pipelined_server_flushes_on_shape_change():
    """Per-step (vote=False) servers return (B, T, C): requests with
    different T must not crash the block concat — the server flushes the
    block on a trailing-shape change and still yields results in order
    (review r6)."""
    import jax

    from ip_avsr_tpu.models import adenet, zoo
    from ip_avsr_tpu import serve as serve_mod

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=6, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    fn = serve_mod.make_server(params, cfg, vote=False)

    reqs = []
    for i, T in enumerate([7, 7, 9, 7, 9, 9, 5]):
        x = rng.randn(1, T, 6).astype(np.float32)
        m = np.ones((1, T), np.float32)
        reqs.append(([x], m))
    pipe = serve_mod.PipelinedServer(serve_fn=fn, depth=3)
    got = list(pipe.map(iter(reqs)))
    assert len(got) == len(reqs)
    for (streams, m), out in zip(reqs, got):
        ref = np.asarray(fn(streams, m))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_trimodal_server_validates_dct_norm_args():
    import jax
    import pytest

    from ip_avsr_tpu.models import adenet, zoo
    from ip_avsr_tpu import serve as serve_mod

    cfg = zoo.adenet_v3(24, 8, 24, lstm_size=6, window=3, output_classes=5)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="together"):
        serve_mod.make_trimodal_server(params, cfg, (4, 6), dct_coeffs=8,
                                       dct_mean=np.zeros(8, np.float32))


def test_pipelined_server_microbatch_matches_per_request():
    """``batch`` > 1 stacks same-shaped requests into one dispatch; scores
    must equal per-request serving, split back per request, in order —
    including multi-row requests (row-count bookkeeping) and batch sizes
    that don't divide the request count."""
    cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=8, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    sync = serve.make_server(params, cfg)
    rng = np.random.RandomState(1)
    reqs = []
    for i in range(11):
        rows = 2 if i in (3, 4) else 1  # a couple of multi-row requests
        x = rng.randn(rows, 6, 10).astype(np.float32)
        mask = np.ones((rows, 6), np.float32)
        mask[:, 4 + (i % 2):] = 0.0
        reqs.append(([x], mask))
    want = [np.asarray(sync([jnp.asarray(s) for s in st], jnp.asarray(m)))
            for st, m in reqs]

    for batch, depth in ((2, 3), (4, 1), (8, 16), (16, 2)):
        pipe = serve.PipelinedServer(params, cfg, depth=depth, batch=batch)
        got = list(pipe.map(iter(reqs)))
        assert [g.shape for g in got] == [w.shape for w in want]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_pipelined_server_microbatch_mixed_shapes():
    """A shape change mid-stream flushes the pending stack (only
    identically-shaped requests may share a stacked dispatch) and the
    per-step vote=False block flush still composes with micro-batching."""
    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=6, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    fn = serve.make_server(params, cfg, vote=False)
    rng = np.random.RandomState(2)
    reqs = []
    for T in [7, 7, 9, 7, 9, 9, 5, 5, 5, 5]:
        x = rng.randn(1, T, 6).astype(np.float32)
        m = np.ones((1, T), np.float32)
        m[0, T - 1:] = 0.0
        reqs.append(([x], m))
    pipe = serve.PipelinedServer(serve_fn=fn, depth=2, batch=3)
    got = list(pipe.map(iter(reqs)))
    assert len(got) == len(reqs)
    for (streams, m), out in zip(reqs, got):
        ref = np.asarray(fn(streams, m))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


def test_mesh_sharded_server_matches_single_device():
    """make_server(mesh=...) shards the request batch over the virtual
    8-device mesh; scores equal the single-device server (every serve-path
    layer is per-row) and the output really lands batch-sharded."""
    import pytest

    from ip_avsr_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual) platform")
    cfg = zoo.deltanet_majority_vote(12, [10, 6], ["sigmoid", "linear"],
                                     lstm_size=8, window=3, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 9
    x = rng.randn(B, T, 12).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)

    single = serve.make_server(params, cfg)
    m = mesh_lib.make_mesh()
    sharded = serve.make_server(params, cfg, mesh=m)
    got = sharded([x], mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(single([x], mask)),
                               rtol=1e-5, atol=1e-6)
    # really partitioned: the device-local shard is B / n_dev rows
    shard_rows = {s.data.shape[0] for s in got.addressable_shards}
    assert shard_rows == {B // m.devices.size}

    with pytest.raises(ValueError, match="divisible"):
        sharded([x[:5]], mask[:5])


def test_pipelined_server_property_random_streams():
    """Hypothesis net over the pipelined surface: random request sequences
    (row counts, T values, vote on/off) x random (depth, batch) must equal
    per-request serving, in order, regardless of how the stage/block
    boundaries fall."""
    from hypothesis import given, settings, strategies as st

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=6, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    servers = {v: serve.make_server(params, cfg, vote=v)
               for v in (True, False)}

    @settings(max_examples=12, deadline=None)
    @given(spec=st.lists(st.tuples(st.integers(1, 3),        # rows
                                   st.sampled_from([5, 8])),  # T
                         min_size=1, max_size=12),
           depth=st.integers(1, 6),
           batch=st.integers(1, 6),
           vote=st.booleans())
    def run(spec, depth, batch, vote):
        rng = np.random.RandomState(len(spec) * 7 + depth)
        reqs = []
        for rows, T in spec:
            x = rng.randn(rows, T, 6).astype(np.float32)
            m = (np.arange(T)[None] < rng.randint(2, T + 1, (rows, 1))
                 ).astype(np.float32)
            reqs.append(([x], m))
        sync = servers[vote]
        want = [np.asarray(sync([jnp.asarray(s) for s in stx],
                                jnp.asarray(m))) for stx, m in reqs]
        pipe = serve.PipelinedServer(serve_fn=sync, depth=depth, batch=batch)
        got = list(pipe.map(iter(reqs)))
        assert [g.shape for g in got] == [w.shape for w in want]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    run()


def test_bucketed_server_property_random_sizes():
    """Hypothesis net: random bucket ladders x ragged request sizes must
    equal the unbucketed server row-for-row (bucket padding invisible)."""
    from hypothesis import given, settings, strategies as st

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=6, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    plain = serve.make_server(params, cfg)

    @settings(max_examples=10, deadline=None)
    @given(bbs=st.lists(st.integers(1, 6), min_size=1, max_size=3),
           tbs=st.lists(st.integers(6, 12), min_size=1, max_size=2),
           B=st.integers(1, 9), T=st.integers(2, 12), seed=st.integers(0, 99))
    def run(bbs, tbs, B, T, seed):
        if T > max(tbs):
            T = max(tbs)
        srv = serve.make_bucketed_server(params, cfg, batch_buckets=bbs,
                                         time_buckets=tbs)
        rng = np.random.RandomState(seed)
        x = rng.randn(B, T, 6).astype(np.float32)
        lens = rng.randint(1, T + 1, B)
        mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)
        want = np.asarray(plain([jnp.asarray(x)], jnp.asarray(mask)))
        got = np.asarray(srv([x], lens))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    run()


def test_bucketed_serve_fn_without_config_validation():
    """serve_fn-only bucketed servers: vote=False needs no class count;
    vote=True without one raises clearly (review: was an AttributeError)."""
    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=6, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    inner = serve.make_server(params, cfg, vote=False)

    srv = serve.make_bucketed_server(serve_fn=inner, vote=False,
                                     batch_buckets=(2,), time_buckets=(8,))
    out = srv([np.random.RandomState(0).randn(1, 5, 6).astype(np.float32)],
              np.array([5]))
    assert out.shape == (1, 5, 3)  # per-step scores, padding sliced off

    import pytest as _pytest
    with _pytest.raises(ValueError, match="output_classes"):
        serve.make_bucketed_server(serve_fn=inner, vote=True,
                                   batch_buckets=(2,), time_buckets=(8,))
