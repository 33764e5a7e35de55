"""Streaming inference (serve.StreamingSession): exact one-shot parity.

The contract: every score a session emits equals the one-shot batch
forward's score for that frame (the delta lookahead and edge-padding
bookkeeping must be invisible), for any way the caller splits the
utterance into chunks.  Cited reference behavior: the reference can only
classify complete utterances (oulu/demo.py val_fn) — streaming is a new
TPU-framework capability, so the parity anchor is our own batch server.
"""

import dataclasses

import numpy as np
import pytest

import jax

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.ops import delta as delta_ops
from ip_avsr_tpu.ops.voting import masked_majority_vote
from ip_avsr_tpu.serve import StreamingSession, _np_delta_fir, make_server


def _streamable_cfg(**kw):
    cfg = zoo.deltanet_majority_vote(12, [10, 6], ["sigmoid", "linear"],
                                     lstm_size=8, window=3, output_classes=4)
    return dataclasses.replace(cfg, agg_bidirectional=False, **kw)


def _run_session(params, cfg, streams, splits, batch=1):
    sess = StreamingSession(params, cfg, batch=batch)
    got = []
    s = 0
    for n in splits:
        got += list(sess.feed([x[:, s:s + n] for x in streams]))
        s += n
    tail, pred = sess.finalize()
    emitted = (np.concatenate([np.stack(got, axis=1), tail], axis=1)
               if got else tail)
    return emitted, pred


@pytest.mark.parametrize("splits", [
    [21],                       # one shot through the streaming path
    [1] * 21,                   # frame by frame
    [1, 3, 2, 7, 4, 4],         # ragged
])
def test_streaming_matches_one_shot(splits):
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    live = make_server(params, cfg, vote=False)
    rng = np.random.RandomState(0)
    T = sum(splits)
    x = rng.randn(1, T, 12).astype(np.float32)
    mask = np.ones((1, T), np.float32)
    ref = np.asarray(live([x], mask))

    emitted, pred = _run_session(params, cfg, [x], splits)
    assert emitted.shape == ref.shape
    np.testing.assert_allclose(emitted, ref, atol=1e-6)
    np.testing.assert_array_equal(pred, masked_majority_vote(ref, mask))


def test_streaming_multistream_peepholes_batch():
    """Two streams (encoder+delta and plain), peephole LSTMs, batch=2."""
    cfg = zoo.adenet_v2(12, 8, encoder_shapes=[10, 6],
                        encoder_nonlinearities=["sigmoid", "linear"],
                        lstm_size=8, window=3, output_classes=4,
                        use_peepholes=True)
    cfg = dataclasses.replace(cfg, agg_bidirectional=False)
    params = adenet.init_adenet_params(jax.random.PRNGKey(1), cfg)
    live = make_server(params, cfg, vote=False)
    rng = np.random.RandomState(1)
    T = 17
    xs = [rng.randn(2, T, 12).astype(np.float32),
          rng.randn(2, T, 8).astype(np.float32)]
    mask = np.ones((2, T), np.float32)
    ref = np.asarray(live(xs, mask))

    emitted, pred = _run_session(params, cfg, xs, [5, 1, 8, 3], batch=2)
    np.testing.assert_allclose(emitted, ref, atol=1e-6)
    np.testing.assert_array_equal(pred, masked_majority_vote(ref, mask))


def test_streaming_last_step_head():
    cfg = dataclasses.replace(
        zoo.lstm_classifier_baseline(12, lstm_size=8, output_classes=4),
        agg_bidirectional=False)
    assert cfg.output_mode == "last_step"
    params = adenet.init_adenet_params(jax.random.PRNGKey(2), cfg)
    live = make_server(params, cfg)
    rng = np.random.RandomState(2)
    T = 13
    x = rng.randn(1, T, 12).astype(np.float32)
    ref = np.asarray(live([x], np.ones((1, T), np.float32)))  # (1, C)

    sess = StreamingSession(params, cfg)
    for t in range(T):
        list(sess.feed([x[:, t:t + 1]]))
    _, last = sess.finalize()
    np.testing.assert_allclose(last, ref, atol=1e-6)


def test_streaming_no_delta_zero_lookahead():
    """Without delta streams every frame is final immediately."""
    cfg = _streamable_cfg()
    cfg = dataclasses.replace(
        cfg, streams=[dataclasses.replace(s, use_delta=False)
                      for s in cfg.streams])
    params = adenet.init_adenet_params(jax.random.PRNGKey(3), cfg)
    live = make_server(params, cfg, vote=False)
    rng = np.random.RandomState(3)
    x = rng.randn(1, 9, 12).astype(np.float32)
    ref = np.asarray(live([x], np.ones((1, 9), np.float32)))

    sess = StreamingSession(params, cfg)
    out = list(sess.feed([x[:, :4]]))
    assert len(out) == 4  # no lookahead latency
    out += list(sess.feed([x[:, 4:]]))
    tail, _ = sess.finalize()
    assert tail.shape[1] == 0
    np.testing.assert_allclose(np.stack(out, axis=1), ref, atol=1e-6)


def test_streaming_short_utterance_tail_only():
    """T < 2*window: nothing can be emitted before finalize."""
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(4), cfg)
    live = make_server(params, cfg, vote=False)
    x = np.random.RandomState(4).randn(1, 4, 12).astype(np.float32)
    ref = np.asarray(live([x], np.ones((1, 4), np.float32)))

    sess = StreamingSession(params, cfg)
    assert list(sess.feed([x])) == []
    tail, pred = sess.finalize()
    np.testing.assert_allclose(tail, ref, atol=1e-6)


def test_streaming_requires_forward_only_head():
    cfg = zoo.deltanet_majority_vote(12, [10, 6], ["sigmoid", "linear"],
                                     lstm_size=8, window=3, output_classes=4)
    assert cfg.agg_bidirectional
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="forward-only"):
        StreamingSession(params, cfg)


def test_streaming_api_misuse():
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    sess = StreamingSession(params, cfg)
    with pytest.raises(RuntimeError, match="no frames"):
        sess.finalize()
    with pytest.raises(RuntimeError, match="lookahead"):
        sess.predict()
    x = np.zeros((1, 8, 12), np.float32)
    list(sess.feed([x]))
    sess.predict()
    sess.finalize()
    with pytest.raises(RuntimeError, match="finalized"):
        list(sess.feed([x]))
    with pytest.raises(RuntimeError, match="finalized"):
        sess.finalize()
    # batch mismatch
    sess2 = StreamingSession(params, cfg)
    with pytest.raises(ValueError, match="batch"):
        list(sess2.feed([np.zeros((2, 8, 12), np.float32)]))
    # wrong stream count
    with pytest.raises(ValueError, match="streams"):
        sess2.feed([x, x])


def test_streaming_zero_length_chunks_finalize_raises():
    """r5 review: a session fed ONLY zero-length chunks must raise at
    finalize — previously _enc was truthy-but-empty and np.argmax(None)
    silently returned scalar class 0."""
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    sess = StreamingSession(params, cfg)
    assert list(sess.feed([np.zeros((1, 0, 12), np.float32)])) == []
    with pytest.raises(RuntimeError, match="no frames"):
        sess.finalize()


def test_streaming_buffer_is_bounded():
    """Long-running sessions must not accumulate the whole utterance: the
    encoded buffer retains at most the 2W delta context plus the pending
    lookahead (review finding: O(T^2) host copying / unbounded memory)."""
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    live = make_server(params, cfg, vote=False)
    T = 200
    x = np.random.RandomState(9).randn(1, T, 12).astype(np.float32)
    ref = np.asarray(live([x], np.ones((1, T), np.float32)))

    sess = StreamingSession(params, cfg)
    got = []
    for t in range(T):
        got += sess.feed([x[:, t:t + 1]])
        W = cfg.window
        assert sess._enc[0].shape[1] <= 4 * W + 2, sess._enc[0].shape
    tail, _ = sess.finalize()
    emitted = np.concatenate([np.stack(got, axis=1), tail], axis=1)
    np.testing.assert_allclose(emitted, ref, atol=1e-6)


def test_feed_is_eager():
    """feed() must buffer its frames even when the caller ignores the
    returned scores (a lazy generator would silently drop the input)."""
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    live = make_server(params, cfg, vote=False)
    x = np.random.RandomState(7).randn(1, 15, 12).astype(np.float32)
    ref = np.asarray(live([x], np.ones((1, 15), np.float32)))

    sess = StreamingSession(params, cfg)
    sess.feed([x[:, :10]])   # return value ignored on purpose
    out = sess.feed([x[:, 10:]])
    tail, _ = sess.finalize()
    # 10 frames ignored + the rest must still line up frame-for-frame
    got = np.concatenate([np.stack(out, axis=1), tail], axis=1)
    np.testing.assert_allclose(got, ref[:, 15 - got.shape[1]:], atol=1e-6)


def test_np_delta_fir_mirrors_the_op():
    """The session's NumPy FIR mirror must match ops.delta exactly (same
    theta loop/coefficients)."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 15, 6).astype(np.float32)
    for W in (1, 3, 4):
        padded = np.pad(x, ((0, 0), (W, W), (0, 0)), mode="edge")
        got = _np_delta_fir(padded, W)
        want = np.asarray(delta_ops.delta_coeff(x, W))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_demo_streaming_cli_matches_sync(tmp_path, capsys):
    """demo --streaming (frame-by-frame sessions) reproduces the sync
    demo's per-utterance predictions on a forward-only-head config."""
    from ip_avsr_tpu.cli import demo, nstream

    base = open("configs/synthetic_1stream.ini").read()
    cfg_path = tmp_path / "stream.ini"
    cfg_path.write_text(base.replace("[training]",
                                     "use_blstm = false\n\n[training]"))
    best = tmp_path / "best.pkl"
    nstream.main(["--config", str(cfg_path), "--synthetic", "24",
                  "--num_epoch", "1", "--save_best", str(best)])
    capsys.readouterr()

    def preds(text):
        return [l.split("predicted")[1] for l in text.splitlines()
                if "predicted" in l]

    demo.main(["--config", str(cfg_path), "--model", str(best),
               "--synthetic", "5"])
    sync = preds(capsys.readouterr().out)
    assert sync

    demo.main(["--config", str(cfg_path), "--model", str(best),
               "--synthetic", "5", "--streaming"])
    assert preds(capsys.readouterr().out) == sync

    # streaming ARTIFACT chain: export_model --streaming --check, then the
    # demo serves streaming sessions revived from the artifact
    from ip_avsr_tpu.cli import export_model

    art = tmp_path / "stream.ipax"
    export_model.main(["--config", str(cfg_path), "--model", str(best),
                       "--out", str(art), "--streaming", "--check"])
    assert "check OK" in capsys.readouterr().out
    demo.main(["--config", str(cfg_path), "--synthetic", "5",
               "--streaming", "--artifact", str(art)])
    assert preds(capsys.readouterr().out) == sync


def test_streaming_config_family_property():
    """Hypothesis over STREAMABLE config space: delta on/off per stream,
    encoders, peepholes, non-LSTM passthrough streams, fusion modes,
    0/1/2 forward agg layers, both heads, windows 1..4, random chunk
    splits — every drawn case must match the one-shot server.  This is the
    correctness net for the hand-derived delta-lookahead bookkeeping."""
    from hypothesis import given, settings, strategies as st

    from ip_avsr_tpu.models.adenet import AdeNetConfig, StreamSpec

    @settings(max_examples=12, deadline=None)
    @given(data=st.data())
    def run(data):
        n_streams = data.draw(st.integers(1, 2), label="n_streams")
        window = data.draw(st.integers(1, 4), label="window")
        streams = []
        any_lstm = False
        for i in range(n_streams):
            use_lstm = data.draw(st.booleans(), label=f"lstm{i}")
            any_lstm |= use_lstm
            enc = data.draw(st.booleans(), label=f"enc{i}")
            streams.append(StreamSpec(
                input_dim=6 + 2 * i, name=f"s{i}",
                encoder_shapes=(8, 5) if enc else None,
                encoder_nonlinearities=("sigmoid", "linear") if enc else None,
                use_delta=data.draw(st.booleans(), label=f"delta{i}"),
                use_lstm=use_lstm))
        agg_layers = data.draw(st.integers(0, 2), label="agg_layers")
        if not any_lstm and agg_layers == 0:
            agg_layers = 1  # need some recurrence for a classifier dim
        # non-LSTM streams pass their feature dim through: sum-fusion needs
        # equal dims, so mixed lstm/non-lstm always uses concat
        dims = [(5 if s.encoder_shapes else s.input_dim)
                * (3 if s.use_delta else 1) if not s.use_lstm else 7
                for s in streams]
        fusiontype = ("concat" if len(set(dims)) > 1 else
                      data.draw(st.sampled_from(["sum", "concat"]),
                                label="fusion"))
        cfg = AdeNetConfig(
            streams=streams, output_classes=4, lstm_size=7, window=window,
            fusiontype=fusiontype, agg_layers=agg_layers,
            agg_bidirectional=False,
            output_mode=data.draw(st.sampled_from(["per_step", "last_step"]),
                                  label="head"),
            use_peepholes=data.draw(st.booleans(), label="peep"),
            w_init="glorot")
        params = adenet.init_adenet_params(jax.random.PRNGKey(7), cfg)
        live = make_server(params, cfg, vote=False)

        T = data.draw(st.integers(max(2 * window, 3), 14), label="T")
        rng = np.random.RandomState(T)
        xs = [rng.randn(1, T, s.input_dim).astype(np.float32)
              for s in streams]
        ref = np.asarray(live(xs, np.ones((1, T), np.float32)))

        splits, left = [], T
        while left > 0:
            n = min(data.draw(st.integers(1, 5)), left)
            splits.append(n)
            left -= n
        emitted, _ = _run_session(params, cfg, xs, splits)
        if cfg.output_mode == "per_step":
            np.testing.assert_allclose(emitted, ref, atol=2e-6)
        else:
            np.testing.assert_allclose(emitted[:, -1], ref, atol=2e-6)

    run()


def test_streaming_chunking_property():
    """Hypothesis: ANY chunk split yields the same scores as one shot."""
    from hypothesis import given, settings, strategies as st

    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(5), cfg)
    live = make_server(params, cfg, vote=False)
    rng = np.random.RandomState(5)
    T = 18
    x = rng.randn(1, T, 12).astype(np.float32)
    ref = np.asarray(live([x], np.ones((1, T), np.float32)))

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.integers(1, 6), min_size=1, max_size=18))
    def run(sizes):
        total, splits = 0, []
        for n in sizes:
            if total + n > T:
                break
            splits.append(n)
            total += n
        if total < T:
            splits.append(T - total)
        emitted, _ = _run_session(params, cfg, [x], splits)
        np.testing.assert_allclose(emitted, ref, atol=1e-6)

    run()


def test_fresh_sessions_share_programs_and_match():
    """fresh() revives per-utterance sessions from one compiled program set
    (review: the live demo path used to re-jit per utterance); scores must
    equal a newly constructed session's."""
    cfg = _streamable_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    template = StreamingSession(params, cfg)
    rng = np.random.RandomState(3)
    for utt in range(2):
        x = rng.randn(1, 11, 12).astype(np.float32)
        a, b = template.fresh(), StreamingSession(params, cfg)
        out_a = list(a.feed([x])) + [a.finalize()[0]]
        out_b = list(b.feed([x])) + [b.finalize()[0]]
        for u, v in zip(out_a, out_b):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-6)
        assert a._prep[0] is template._prep[0]  # shared compiled callables
