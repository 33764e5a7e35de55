"""End-to-end CLI chain + checkpoint/resume tests (CPU)."""

import json
import os

import numpy as np
import pytest

from ip_avsr_tpu.io import matio


def test_nstream_train_save_extract_demo(tmp_path, capsys):
    from ip_avsr_tpu.cli import demo, extract_weights, nstream

    best = tmp_path / "best.pkl"
    results = tmp_path / "results.csv"
    res = nstream.main(["--config", "configs/synthetic_1stream.ini",
                        "--synthetic", "40", "--num_epoch", "2",
                        "--save_best", str(best), "--write_results", str(results)])
    assert best.exists()
    assert len(results.read_text().strip().split(",")) == 3

    # weight surgery: encoder + LSTM bundles out of the saved model
    out_mat = tmp_path / "weights.mat"
    extract_weights.main(["--model", str(best), "--encoder-stream", "s1",
                          "--lstm", "aggregator/0/fwd:lstm_agg_f",
                          "--out", str(out_mat)])
    mat = matio.load_mat_file(str(out_mat))
    assert "w1" in mat and "lstm_agg_f_w_in_to_ingate" in mat
    w, b = matio.load_dbn_mat(str(out_mat), n_layers=3)
    assert w[0].shape == (24, 32)

    # demo inference with the trained model
    demo.main(["--config", "configs/synthetic_1stream.ini", "--model", str(best),
               "--synthetic", "6"])
    out = capsys.readouterr().out
    assert "accuracy:" in out

    # pipelined serving mode gives the SAME per-utterance predictions
    demo.main(["--config", "configs/synthetic_1stream.ini", "--model", str(best),
               "--synthetic", "6", "--pipelined", "--depth", "2"])
    out_pipe = capsys.readouterr().out
    def preds(text):
        return [l.split("predicted")[1] for l in text.splitlines()
                if "predicted" in l]
    assert preds(out_pipe) == preds(out)

    # micro-batched uploads (--batch) must not change the predictions either
    demo.main(["--config", "configs/synthetic_1stream.ini", "--model", str(best),
               "--synthetic", "6", "--pipelined", "--depth", "2",
               "--batch", "3"])
    assert preds(capsys.readouterr().out) == preds(out)


def test_nstream_num_epoch_zero_is_eval_only():
    """r5 review: an explicit --num_epoch 0 must be honored (eval-only smoke
    run), not dropped by a falsy-`or` fallback onto the config's schedule —
    the bug chained through parity_check AND nstream."""
    from ip_avsr_tpu.cli import nstream

    res = nstream.main(["--config", "configs/synthetic_1stream.ini",
                        "--synthetic", "24", "--num_epoch", "0"])
    assert res.epochs_run == 0
    assert len(res.cost_train) == 0


def test_pretrained_encoder_feeds_nstream(tmp_path):
    from ip_avsr_tpu.cli import pretrain_dbn

    ae_path = tmp_path / "ae.mat"
    pretrain_dbn.main(["--synthetic", "100", "--input-dim", "24", "--hidden", "32,16,8",
                       "--activations", "sigm,sigm,linear", "--epochs", "1",
                       "--batchsize", "25", "--out", str(ae_path)])
    w, b = matio.load_dbn_mat(str(ae_path), n_layers=6)
    assert [x.shape for x in w[:3]] == [(24, 32), (32, 16), (16, 8)]
    # decoder mirrors
    np.testing.assert_allclose(w[3], w[2].T)


def test_checkpoint_save_restore(tmp_path):
    import jax

    from ip_avsr_tpu.models import adenet, zoo
    from ip_avsr_tpu.train import checkpoints, optimizers

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=4, output_classes=3)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    opt = optimizers.adam(1e-3)
    opt_state = opt.init(params)

    ckdir = str(tmp_path / "ck")
    checkpoints.save_train_state(ckdir, 3, params, opt_state, extra={"best_val": 1.5})
    checkpoints.save_train_state(ckdir, 7, params, opt_state, extra={"best_val": 1.2})
    assert checkpoints.latest_step(ckdir) == 7

    restored = checkpoints.restore_train_state(ckdir)
    assert int(restored["step"]) == 7
    assert float(restored["extra"]["best_val"]) == 1.2
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert checkpoints.restore_train_state(str(tmp_path / "nope")) is None


def test_ffprobe_parser():
    from ip_avsr_tpu.utils.ffmpeg import parse_ffprobe_output

    text = """[FRAME]
media_type=video
stream_index=0
key_frame=1
pkt_pts=0
pkt_pts_time=0.000000
pkt_duration=N/A
pkt_duration_time=N/A
width=720
height=480
pict_type=I
[/FRAME]
[FRAME]
media_type=audio
stream_index=1
key_frame=1
pkt_pts=1152
pkt_pts_time=0.026122
sample_fmt=s16p
nb_samples=1152
channels=2
channel_layout=stereo
[/FRAME]
[FRAME]
media_type=video
stream_index=0
key_frame=0
pkt_pts=3003
pkt_pts_time=0.033367
width=720
height=480
[SIDE_DATA]
side_data_type=GOP timecode
timecode=00:00:00:00
[/SIDE_DATA]
[/FRAME]
"""
    audio, video = parse_ffprobe_output(text)
    assert len(video) == 2 and len(audio) == 1
    assert video[0].width == 720 and video[0].pkt_duration == -1
    assert np.isnan(video[0].pkt_duration_time)
    assert audio[0].nb_samples == 1152 and audio[0].channels == 2
    assert video[1].pkt_pts_time == 0.033367


def test_trimodal_cli_synthetic():
    from ip_avsr_tpu.cli import trimodal

    res = trimodal.main(["--synthetic", "30", "--num_epoch", "1"])
    assert np.isfinite(res.best_val)
    assert res.test_conf.sum() > 0


def test_audio_visual_cli_synthetic(tmp_path):
    from ip_avsr_tpu.cli import audio_visual

    results = tmp_path / "r.csv"
    res = audio_visual.main(["--synthetic", "24", "--write_results", str(results)])
    assert np.isfinite(res.best_val)
    lines = results.read_text().strip().splitlines()
    assert lines[1].startswith("train_costs,") and lines[2].startswith("val_costs,")


def test_convae_and_ae_finetuner_cli(tmp_path):
    from ip_avsr_tpu.cli import ae_finetuner, convae

    convae.main(["--synthetic", "16", "--model", "plain", "--epochs", "1",
                 "--batchsize", "8", "--bottleneck", "8", "--dense", "16",
                 "--out", str(tmp_path / "cae.pkl")])
    assert (tmp_path / "cae.pkl").exists()
    ae_finetuner.main(["--synthetic", "32", "--epochs", "1", "--batchsize", "16",
                       "--out", str(tmp_path / "ae_ft.mat")])
    w, b = matio.load_dbn_mat(str(tmp_path / "ae_ft.mat"), n_layers=4)
    assert w[0].shape == (24, 16)


def test_prepare_data_cli(tmp_path):
    from ip_avsr_tpu.cli import prepare_data

    rng = np.random.RandomState(0)
    lens = np.array([6, 8])
    matio.save_mat({"dataMatrix": rng.randn(14, 12).astype(np.float32),
                    "targetsVec": np.repeat([1, 2], lens).reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1)},
                   str(tmp_path / "raw.mat"))
    prepare_data.main(["--input", str(tmp_path / "raw.mat"),
                       "--output", str(tmp_path / "prep.mat"),
                       "--samplewise", "--diff", "--deltas", "5"])
    out = matio.load_mat_file(str(tmp_path / "prep.mat"))
    assert out["dataMatrix"].shape == (14, 36)


def test_nstream_itervec_split(tmp_path):
    """AVLetters-style iterVec split (iterations 1,2 train / 3 test)."""
    from ip_avsr_tpu.cli import nstream

    rng = np.random.RandomState(0)
    n = 30
    lens = rng.randint(6, 12, n)
    y = rng.randint(1, 5, n)
    iters = np.tile([1, 2, 3], 10)
    frames = []
    for l, c in zip(lens, y):
        base = np.zeros(16, np.float32)
        base[c - 1] = 2.0
        frames.append(base + 0.4 * rng.randn(l, 16).astype(np.float32))
    matio.save_mat({"dataMatrix": np.concatenate(frames),
                    "targetsVec": np.repeat(y, lens).reshape(-1, 1),
                    "subjectsVec": rng.randint(1, 5, n).reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1),
                    "iterVec": iters.reshape(-1, 1)}, str(tmp_path / "av.mat"))
    cfg = (open("configs/synthetic_1stream.ini").read()
           .replace("data = synthetic", f"data = {tmp_path / 'av.mat'}")
           .replace("input_dimensions = 24", "input_dimensions = 16")
           .replace("output_classes = 5", "output_classes = 4")
           .replace("output_classnames = c0,c1,c2,c3,c4", "output_classnames = a,b,c,d")
           .replace("matlab_target_offset = false", "matlab_target_offset = true")
           .replace("num_epoch = 4", "num_epoch = 1"))
    (tmp_path / "iv.ini").write_text(cfg)
    res = nstream.main(["--config", str(tmp_path / "iv.ini"), "--split", "itervec"])
    # 10 test videos (iteration 3)
    assert res.test_conf.sum() == 10


def test_evaluate_delta_features_cli(capsys):
    from ip_avsr_tpu.cli import evaluate_delta_features

    with_d, without_d = evaluate_delta_features.main(
        ["--config", "configs/synthetic_1stream.ini", "--synthetic", "30",
         "--num_epoch", "1"])
    out = capsys.readouterr().out
    assert "delta-feature ablation" in out
    assert np.isfinite(with_d.best_val) and np.isfinite(without_d.best_val)


def test_leave_one_out_split_and_run(tmp_path):
    """LOO runner: the held-out subject never appears in training, its
    utterances form the whole test set, and the CR lands in the results file."""
    from ip_avsr_tpu.cli import leave_one_out
    from ip_avsr_tpu.cli.nstream import synthesize_dataset
    from ip_avsr_tpu.data import preprocessing as pp

    # split-level guarantee, checked directly
    ds = synthesize_dataset(40, 8, 3)
    subjects = ds["subjectsVec"].reshape(-1)
    targets = ds["targetsVec"].reshape(-1) - 1
    vidlens = ds["videoLengthVec"].reshape(-1)
    held_out = int(subjects[0])
    train_ids, test_ids = leave_one_out.loo_split_ids(subjects, held_out)
    assert held_out not in train_ids and test_ids == [held_out]
    split = pp.split_seq_data(ds["dataMatrix"], targets, subjects, vidlens,
                              train_ids, [], test_ids)
    assert held_out not in set(split[3].tolist())  # train subjects
    assert set(split[11].tolist()) == {held_out}   # test subjects
    assert len(split[2]) + len(split[10]) == len(vidlens)

    # end-to-end run on tiny synthetic data
    results = tmp_path / "loo.csv"
    res = leave_one_out.main(["--synthetic", "30", "--test_subj", str(held_out),
                              "--num_epoch", "2", "--results", str(results)])
    assert res.epochs_run >= 1
    line = results.read_text().strip()
    assert line.startswith(f"{held_out},")

    # unknown subject id is an explicit error
    with pytest.raises(ValueError):
        leave_one_out.loo_split_ids(subjects, 9999)


def test_dbn_pretrain_export_import_train_roundtrip(tmp_path):
    """The full MATLAB-ABI loop in one test: tiny DBN pretraining ->
    unfold-to-AE -> extract_nn -> .mat -> the CLI's pretrained-encoder path
    -> training.  The reference spreads this across MATLAB trainDBN/extractNN
    (dbn/extractNN.m:86-105) and Python load_decoder (runners/4stream.py:291-294)."""
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.cli import nstream
    from ip_avsr_tpu.models import encoder as encoder_mod
    from ip_avsr_tpu.pretrain import dbn as dbn_lib, rbm as rbm_lib, unfold
    from ip_avsr_tpu.reference_impl import encoder_forward_np

    rng = np.random.RandomState(0)
    dim, hidden, acts = 16, [12, 8, 4], ["sigm", "sigm", "linear"]

    # dataset .mat (AVLetters-style schema)
    n = 24
    lens = rng.randint(6, 12, n)
    y = rng.randint(1, 4, n)
    frames = []
    for l, c in zip(lens, y):
        base = np.zeros(dim, np.float32)
        base[c - 1] = 2.0
        frames.append(1.0 / (1 + np.exp(-(base + 0.4 * rng.randn(l, dim)))))
    X = np.concatenate(frames).astype(np.float32)
    matio.save_mat({"dataMatrix": X,
                    "targetsVec": np.repeat(y, lens).reshape(-1, 1),
                    "subjectsVec": rng.randint(1, 7, n).reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1),
                    "iterVec": np.tile([1, 2, 3], n // 3).reshape(-1, 1)},
                   str(tmp_path / "ds.mat"))

    # 1. pretrain a tiny DBN and export through the w1..wN/b1..bN ABI
    hyper = rbm_lib.RBMHyperParams(epochs=2, batchsize=20)
    dbn = dbn_lib.train_dbn(jax.random.PRNGKey(0), X, hidden, acts,
                            hyper=hyper, log_fn=lambda s: None)
    nn = unfold.unfold_dbn_to_nn(dbn, 1, hidden, acts, "linear", dim)
    matio.save_mat(unfold.extract_nn(nn), str(tmp_path / "ae.mat"))

    # 2. the CLI loader path reproduces the exact exported encoder forward
    w, b, shapes, nls = matio.load_decoder(str(tmp_path / "ae.mat"), "12,8,4",
                                           "sigmoid,sigmoid,linear")
    assert [wi.shape for wi in w] == [(16, 12), (12, 8), (8, 4)]
    enc_params = encoder_mod.pretrained_encoder_params(w, b)
    probe = rng.randn(5, dim).astype(np.float32)
    got = np.asarray(encoder_mod.encoder_forward(enc_params, jnp.asarray(probe), nls))
    want = encoder_forward_np(enc_params, probe, nls)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # 3. train through the CLI with the pretrained encoder; at lr=0 the
    # best-model encoder must still carry the .mat weights, proving the
    # pretrained path flowed through config -> load_decoder -> init -> fit
    cfg = (open("configs/synthetic_1stream.ini").read()
           .replace("data = synthetic", f"data = {tmp_path / 'ds.mat'}")
           .replace("input_dimensions = 24", "input_dimensions = 16")
           .replace("shape = 32,16,8", "shape = 12,8,4")
           .replace("[stream1]", f"[stream1]\nmodel = {tmp_path / 'ae.mat'}")
           .replace("output_classes = 5", "output_classes = 3")
           .replace("output_classnames = c0,c1,c2,c3,c4", "output_classnames = a,b,c")
           .replace("matlab_target_offset = false", "matlab_target_offset = true")
           .replace("learning_rate = 0.003", "learning_rate = 0.0")
           .replace("num_epoch = 4", "num_epoch = 1")
           .replace("epochsize = 10", "epochsize = 2"))
    (tmp_path / "roundtrip.ini").write_text(cfg)
    res = nstream.main(["--config", str(tmp_path / "roundtrip.ini"),
                        "--split", "itervec"])
    assert np.isfinite(res.best_val)
    (stream_params,) = res.best_params["streams"].values()
    trained_enc = stream_params["encoder"]
    for i, name in enumerate(["fc1", "fc2", "fc3"]):
        np.testing.assert_allclose(np.asarray(trained_enc[name]["w"]),
                                   np.asarray(w[i], np.float32), rtol=1e-6)


def test_nstream_cli_model_and_sequence_parallel(capsys, tmp_path):
    """The --model_parallel / --sequence_parallel flags drive real Trainer
    runs end to end on the virtual 8-device mesh."""
    from ip_avsr_tpu.cli import nstream

    nstream.main(["--config", "configs/synthetic_1stream.ini",
                  "--synthetic", "24", "--num_epoch", "2",
                  "--model_parallel", "2"])
    out = capsys.readouterr().out
    assert "Epoch 2" in out and "CR" in out

    nstream.main(["--config", "configs/synthetic_1stream.ini",
                  "--synthetic", "24", "--num_epoch", "2",
                  "--sequence_parallel", "2"])
    out = capsys.readouterr().out
    assert "Epoch 2" in out and "CR" in out


def test_separate_train_cli_synthetic(capsys):
    from ip_avsr_tpu.cli import separate_train

    separate_train.main(["--synthetic", "24", "--num_epoch", "1"])
    out = capsys.readouterr().out
    assert "Epoch 1" in out or "CR" in out


def test_playvid_cli_headless(tmp_path, capsys):
    """Headless contact-sheet mode over a synthesized mp4."""
    cv2 = pytest.importorskip("cv2")

    from ip_avsr_tpu.cli import playvid

    vid = tmp_path / "s1_v1_u31.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(12):
        w.write((rng.rand(48, 64, 3) * 255).astype(np.uint8))
    w.release()

    sheets = tmp_path / "sheets"
    playvid.main([str(vid), "--sheet-dir", str(sheets)])
    out = capsys.readouterr().out
    assert "12 frames" in out and "total frames: 12" in out
    assert (sheets / "s1_v1_u31.png").exists()
    # missing files are skipped, not fatal
    playvid.main([str(tmp_path / "nope.mp4"), "--sheet-dir", str(sheets)])
    assert "missing, skipped" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# Property test: the INI config -> model surface (runners/4stream.py:159-224
# schema).  Hypothesis generates stream sections (count, encoder on/off,
# delta on/off, dims) and classifier keys (fusion, peepholes, blstm,
# dropout, remat) and asserts (a) the INI-parsed build equals the directly
# constructed one, (b) the built model runs one train step + eval.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_stream_st = st.fixed_dictionaries({
    "use_encoder": st.booleans(),
    "use_delta": st.booleans(),
    "input_dim": st.sampled_from([6, 10, 14]),
})

_clf_st = st.fixed_dictionaries({
    "fusiontype": st.sampled_from(["sum", "adasum", "concat"]),
    "use_peepholes": st.booleans(),
    "use_blstm": st.booleans(),
    "use_dropout": st.booleans(),
    "lstm_remat": st.booleans(),
    "windowsize": st.sampled_from([3, 4]),
})


@settings(max_examples=12, deadline=None)
@given(streams=st.lists(_stream_st, min_size=1, max_size=4), clf=_clf_st,
       data=st.data())
def test_ini_config_to_model_property(tmp_path_factory, streams, clf, data):
    import configparser
    import io as _io

    import jax

    from ip_avsr_tpu.models import adenet
    from ip_avsr_tpu.train import config as config_lib
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    # ---- write the INI text exactly as a user would
    cp = configparser.ConfigParser()
    for i, s in enumerate(streams, start=1):
        sec = f"stream{i}"
        cp.add_section(sec)
        cp.set(sec, "input_dimensions", str(s["input_dim"]))
        cp.set(sec, "use_encoder", str(s["use_encoder"]))
        cp.set(sec, "use_delta", str(s["use_delta"]))
        if s["use_encoder"]:
            cp.set(sec, "shape", "12,8,6")
            cp.set(sec, "nonlinearities", "sigmoid,sigmoid,linear")
    cp.add_section("lstm_classifier")
    for k, v in clf.items():
        cp.set("lstm_classifier", k, str(v))
    cp.set("lstm_classifier", "lstm_size", "5")
    cp.set("lstm_classifier", "output_classes", "4")
    buf = _io.StringIO()
    cp.write(buf)
    cp2 = configparser.ConfigParser()
    cp2.read_string(buf.getvalue())

    # ---- (a) parse path equals the directly constructed path
    parsed_streams = config_lib.parse_streams(cp2)
    parsed_clf = config_lib.parse_classifier(cp2)
    cfg_ini = config_lib.build_model_config(parsed_streams, parsed_clf)

    direct_streams = [config_lib.StreamConfig(
        name=f"stream{i}", input_dimensions=s["input_dim"],
        shape=[12, 8, 6] if s["use_encoder"] else None,
        nonlinearities=(["sigmoid", "sigmoid", "linear"]
                        if s["use_encoder"] else None),
        use_encoder=s["use_encoder"], use_delta=s["use_delta"])
        for i, s in enumerate(streams, start=1)]
    direct_clf = config_lib.ClassifierConfig(
        lstm_size=5, output_classes=4, **clf)
    cfg_direct = config_lib.build_model_config(direct_streams, direct_clf)
    assert cfg_ini == cfg_direct, (cfg_ini, cfg_direct)

    # ---- (b) the built model actually trains and evaluates
    rng = np.random.RandomState(data.draw(st.integers(0, 2**16)))
    B, T = 3, 6
    params = adenet.init_adenet_params(__import__("jax").random.PRNGKey(0),
                                       cfg_ini)
    inputs = [np.asarray(rng.randn(B, T, s.input_dim), np.float32)
              for s in cfg_ini.streams]
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)

    tr = Trainer(cfg_ini, TrainOptions(optimizer="adam", learning_rate=1e-3,
                                       log_fn=lambda *_: None))
    p = jax.tree_util.tree_map(np.asarray, params)
    p = jax.tree_util.tree_map(__import__("jax").numpy.asarray, p)
    state = tr.optimizer.init(p)
    dev = tr._device_batch([__import__("jax").numpy.asarray(x) for x in inputs],
                           y, mask)
    p2, _, loss = tr.train_step(p, state, dev[0], dev[1], dev[2],
                                __import__("jax").random.PRNGKey(1),
                                __import__("jax").numpy.asarray(1e-3))
    assert np.isfinite(float(loss))
    cr, conf = tr.evaluate(p2, dev[0], np.asarray(y), np.asarray(mask))
    assert 0.0 <= cr <= 1.0
    assert conf.sum() == B

    # ---- (c) the INI-built model exports and the artifact matches the
    # live server (the config -> deploy seam, same drawn config)
    from ip_avsr_tpu import export as export_lib
    from ip_avsr_tpu.serve import make_server

    art = tmp_path_factory.mktemp("ini_export") / "m.ipax"
    export_lib.save_artifact(str(art), params, cfg_ini)
    srv = export_lib.load_server(str(art))
    live = make_server(params, cfg_ini)
    np.testing.assert_allclose(np.asarray(srv(inputs, mask)),
                               np.asarray(live(inputs, mask)),
                               rtol=1e-6, atol=1e-7)

    # ---- (d) forward-only draws must also stream with one-shot parity
    # (INI -> build -> StreamingSession, full-valid single row)
    if not clf["use_blstm"]:
        from ip_avsr_tpu.serve import StreamingSession

        T2 = max(2 * cfg_ini.window, 6)
        xs = [np.asarray(rng.randn(1, T2, s.input_dim), np.float32)
              for s in cfg_ini.streams]
        ref = np.asarray(make_server(params, cfg_ini, vote=False)(
            xs, np.ones((1, T2), np.float32)))
        sess = StreamingSession(params, cfg_ini)
        got = list(sess.feed(xs))
        tail, _ = sess.finalize()
        emitted = (np.concatenate([np.stack(got, axis=1), tail], axis=1)
                   if got else tail)
        if cfg_ini.output_mode == "per_step":
            np.testing.assert_allclose(emitted, ref, atol=2e-6)
        else:
            np.testing.assert_allclose(emitted[:, -1], ref, atol=2e-6)


def test_noencoder_delta_ini_builds_deltanet_v1():
    """A 1-stream no-encoder INI with deltas must build deltanet_v1 (the
    reference's 1stream_noencoder runner does —
    runners/1stream_noencoder.py:234); it used to silently build the
    delta-free lstm_classifier."""
    import configparser

    from ip_avsr_tpu.train import config as config_lib

    cp = configparser.ConfigParser()
    cp.add_section("stream1")
    cp.set("stream1", "input_dimensions", "20")
    cp.set("stream1", "use_encoder", "false")
    cp.add_section("lstm_classifier")
    cp.set("lstm_classifier", "lstm_size", "8")
    cp.set("lstm_classifier", "output_classes", "4")
    cp.set("lstm_classifier", "windowsize", "5")
    cfg = config_lib.build_model_config(config_lib.parse_streams(cp),
                                        config_lib.parse_classifier(cp))
    assert cfg.streams[0].use_delta and not cfg.streams[0].use_lstm
    assert cfg.window == 5  # windowsize reaches the delta window
    # the explicit ablation still gets the delta-free classifier
    cp.set("stream1", "use_delta", "false")
    cfg2 = config_lib.build_model_config(config_lib.parse_streams(cp),
                                         config_lib.parse_classifier(cp))
    assert not cfg2.streams[0].use_delta


def test_nstream_lr_map_section(tmp_path, capsys):
    """[lr_map] + optimizer=adam_vlr: the config-driven equivalent of
    runners/1stream_variable_lr.py's hardcoded per-layer map — the run
    completes and the parsed map reaches generate_lr_map semantics."""
    import configparser

    from ip_avsr_tpu.cli import nstream
    from ip_avsr_tpu.train import config as config_lib

    base = open("configs/synthetic_1stream.ini").read()
    cfg_path = tmp_path / "vlr.ini"
    cfg_path.write_text(base.replace("optimizer = adam",
                                     "optimizer = adam_vlr") +
                        "\n[lr_map]\noutput = 0.01\n"
                        "streams/s1/encoder = 0.0005\n")
    cp = configparser.ConfigParser()
    cp.read(str(cfg_path))
    assert config_lib.parse_lr_map(cp) == {"output": 0.01,
                                           "streams/s1/encoder": 0.0005}
    nstream.main(["--config", str(cfg_path), "--synthetic", "24",
                  "--num_epoch", "1"])
    assert "Epoch 1" in capsys.readouterr().out


def test_lr_map_misuse_is_loud():
    """[lr_map] with a non-vlr optimizer raises; unmatched prefixes warn
    (review: both were silent no-ops)."""
    import warnings

    import jax
    import pytest as _pytest

    from ip_avsr_tpu.models import adenet, zoo
    from ip_avsr_tpu.train import optimizers as opt_lib
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    cfg = zoo.lstm_classifier_majority_vote(6, lstm_size=4, output_classes=3)
    with _pytest.raises(ValueError, match="adam_vlr"):
        Trainer(cfg, TrainOptions(optimizer="adam",
                                  lr_map_config={"output": 0.1},
                                  log_fn=lambda *_: None))

    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        opt_lib.generate_lr_map(params, {"no/such/path": 0.1}, 0.01)
    assert any("matches no parameter path" in str(x.message) for x in w)


def test_export_model_streaming_flag_conflicts(tmp_path):
    import pytest as _pytest

    from ip_avsr_tpu.cli import export_model

    with _pytest.raises(SystemExit):
        export_model.main(["--config", "configs/synthetic_1stream.ini",
                           "--out", str(tmp_path / "x.ipax"),
                           "--streaming", "--time", "32"])


def test_parity_check_rehearsal_learns(tmp_path):
    """The one-command parity harness (cli/parity_check.py --rehearse)
    drives the REAL path end to end: fabricate an AVLetters-shaped corpus +
    w1..wN AE checkpoint as .mat files on disk, resolve the stock config
    against them, train through cli/nstream with the reference schedule, and
    emit the report artifact.  The motif corpus must be genuinely learnable
    (chance is 1/26 ~= 0.038) or the rehearsal proves nothing."""
    from ip_avsr_tpu.cli import parity_check

    out = tmp_path / "report.json"
    report = parity_check.run([
        "--rehearse", "--rehearse-scale", "0.1", "--num_epoch", "8",
        "--rehearse-dir", str(tmp_path / "corpus"),
        "--reference-cr", "0.30", "--budget", "0.5",
        "--out", str(out)])
    assert report["rehearsal"] is True
    assert report["rehearsal_corpus"]["n_utterances"] == 156
    # 26-way split by iterVec: iterations 1/2 train, 3 test = 52 test utts
    assert report["test_cr"] > 0.15, report  # ~4x chance after 8 epochs
    assert "delta" in report and "within_budget" in report
    on_disk = json.loads(out.read_text())
    assert on_disk["test_cr"] == report["test_cr"]
    # the corpus it wrote is real .mat files loadable by the standard reader
    corpus = matio.load_mat_file(str(tmp_path / "corpus" / "allData_mouthROIs.mat"))
    assert corpus["dataMatrix"].shape[1] == report["rehearsal_corpus"]["dim"]
