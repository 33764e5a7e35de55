"""The real-corpus CLI path, end to end, without --synthetic.

Every other CLI test drives nstream with --synthetic, which bypasses what a
switching reference user does FIRST: load .mat corpora (runners/4stream.py
:239-258), apply the presplit pipeline flags, split by subject-id files,
force-align multistream data, load pretrained encoders from w1..wN
checkpoints, and write the report artifacts.  This test builds a tiny
corpus in the reference's .mat schema and runs that whole path.
"""

import configparser

import numpy as np

from ip_avsr_tpu.io import matio


def _make_corpus(tmp_path, n=24, dims=(24, 10), classes=4, seed=0):
    """Two frame-aligned streams in the reference schema; stream2's clip
    lengths differ (one frame longer) so force_align has real work to do.
    subjectsVec is PER-FRAME (the AVLetters layout) to exercise the
    _video_subjects reduction."""
    rng = np.random.RandomState(seed)
    lens = rng.randint(6, 12, n)
    y = rng.randint(1, classes + 1, n)  # 1-based, matlab_target_offset=true
    subjects = np.arange(n) % 6 + 1
    paths = []
    for si, d in enumerate(dims):
        lens_s = lens + (1 if si == 1 else 0)
        frames = []
        for l, c in zip(lens_s, y):
            base = np.zeros(d, np.float32)
            base[(c - 1) % d] = 2.5
            frames.append(base + 0.4 * rng.randn(l, d).astype(np.float32))
        p = str(tmp_path / f"stream{si + 1}.mat")
        matio.save_mat({
            "dataMatrix": np.concatenate(frames),
            "targetsVec": np.repeat(y, lens_s).reshape(-1, 1),
            "subjectsVec": np.repeat(subjects, lens_s).reshape(-1, 1),
            "videoLengthVec": lens_s.reshape(-1, 1),
        }, p)
        paths.append(p)
    return paths, lens, y, subjects


def _save_encoder(tmp_path, in_dim, shapes):
    rng = np.random.RandomState(7)
    out = {}
    prev = in_dim
    for i, s in enumerate(shapes, 1):
        out[f"w{i}"] = (0.1 * rng.randn(prev, s)).astype(np.float64)
        out[f"b{i}"] = np.zeros((1, s))
        prev = s
    p = str(tmp_path / "enc.mat")
    matio.save_mat(out, p)
    return p


def test_nstream_real_corpus_full_path(tmp_path):
    from ip_avsr_tpu.cli import nstream

    paths, lens, y, subjects = _make_corpus(tmp_path)
    enc_path = _save_encoder(tmp_path, 24, [16, 8])

    # subject-id split files (utils/io.py read_data_split_file format)
    (tmp_path / "train.txt").write_text("1,2,3,4\n")
    (tmp_path / "val.txt").write_text("5\n")
    (tmp_path / "test.txt").write_text("6\n")

    cp = configparser.ConfigParser()
    cp["stream1"] = {
        "data": paths[0],
        "imagesize": "4,6",  # 4*6 == 24: reorder_data's Fortran-order trap
        "input_dimensions": "24",
        "shape": "16,8",
        "nonlinearities": "sigmoid,linear",
        "model": enc_path,  # pretrained w1..wN checkpoint (load_decoder)
        "reorderdata": "true",
        "meanremove": "true",
        "diffimage": "true",
        "samplewisenormalize": "true",
        "featurewisenormalize": "true",
        "force_align_data": "true",
    }
    cp["stream2"] = {
        "data": paths[1],
        "input_dimensions": "10",
        "use_encoder": "false",
    }
    cp["lstm_classifier"] = {
        "fusiontype": "sum",
        "weight_init": "glorot",
        "use_peepholes": "false",
        "windowsize": "3",
        "output_classes": "4",
        "output_classnames": "a,b,c,d",
        "lstm_size": "12",
        "matlab_target_offset": "true",
    }
    cp["training"] = {
        "validation_window": "50",
        "num_epoch": "1",
        "learning_rate": "0.01",
        "epochsize": "6",
        "batchsize": "6",
        "optimizer": "adam",
        "train_subjects_file": str(tmp_path / "train.txt"),
        "val_subjects_file": str(tmp_path / "val.txt"),
        "test_subjects_file": str(tmp_path / "test.txt"),
    }
    cfg_path = tmp_path / "real.ini"
    with open(cfg_path, "w") as f:
        cp.write(f)

    res = nstream.main([
        "--config", str(cfg_path),
        "--save_plot", str(tmp_path / "report"),
        "--write_results", str(tmp_path / "results.csv"),
        "--save_best", str(tmp_path / "best.mat"),
    ])

    # the subject split put exactly the subject-6 videos in the test set
    n_test = int((subjects == 6).sum())
    assert res.test_conf.sum() == n_test
    assert np.isfinite(res.best_val)

    # report artifacts
    assert (tmp_path / "report.validloss.png").exists()
    confmat = (tmp_path / "report.confmat.txt").read_text()
    assert "|a|" in confmat.replace(" ", "")
    line = (tmp_path / "results.csv").read_text().strip().split(",")
    assert float(line[0]) == res.test_cr

    # the saved best model round-trips
    best = matio.load_model_params(str(tmp_path / "best.mat"))
    flat_saved = sorted(_flatten_keys(best))
    flat_run = sorted(_flatten_keys(res.best_params))
    assert flat_saved == flat_run

    # the pretrained encoder actually reached stream1's params: its first
    # layer must equal the checkpoint (training ran 1 epoch, so compare
    # against the INITIAL params captured by the trainer's reused init)
    w1 = matio.load_mat_files([enc_path])[0]["w1"]
    assert w1.shape == (24, 16)


def _flatten_keys(tree, prefix=""):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten_keys(v, f"{prefix}/{k}"))
    else:
        out.append(prefix)
    return out


def test_nstream_pretrained_encoder_loads_on_real_path(tmp_path):
    """load_decoder's values must reach the initial parameters (the
    --synthetic variant of this test skips the sc.model branch)."""
    from ip_avsr_tpu.cli import nstream
    from ip_avsr_tpu.train import trainer as trainer_mod

    paths, lens, y, subjects = _make_corpus(tmp_path, dims=(24,))
    enc_path = _save_encoder(tmp_path, 24, [16, 8])
    (tmp_path / "train.txt").write_text("1,2,3,4\n")
    (tmp_path / "val.txt").write_text("5\n")
    (tmp_path / "test.txt").write_text("6\n")

    cp = configparser.ConfigParser()
    cp["stream1"] = {"data": paths[0], "input_dimensions": "24",
                     "shape": "16,8", "nonlinearities": "sigmoid,linear",
                     "model": enc_path}
    cp["lstm_classifier"] = {"windowsize": "3", "output_classes": "4",
                             "lstm_size": "10", "matlab_target_offset": "true"}
    cp["training"] = {"num_epoch": "1", "epochsize": "4", "batchsize": "6",
                      "validation_window": "50",
                      "train_subjects_file": str(tmp_path / "train.txt"),
                      "val_subjects_file": str(tmp_path / "val.txt"),
                      "test_subjects_file": str(tmp_path / "test.txt")}
    cfg_path = tmp_path / "pre.ini"
    with open(cfg_path, "w") as f:
        cp.write(f)

    captured = {}
    orig_init = trainer_mod.Trainer.init_params

    def spy(self, key, **kw):
        params = orig_init(self, key, **kw)
        captured.setdefault("params", params)
        captured.setdefault("kw", kw)
        return params

    trainer_mod.Trainer.init_params = spy
    try:
        nstream.main(["--config", str(cfg_path)])
    finally:
        trainer_mod.Trainer.init_params = orig_init

    pre = captured["kw"].get("pretrained_encoders")
    assert pre is not None and pre[0] is not None
    w1 = matio.load_mat_files([enc_path])[0]["w1"]
    stream0 = next(iter(captured["params"]["streams"].values()))
    got = np.asarray(stream0["encoder"]["fc1"]["w"])
    np.testing.assert_allclose(got, w1, rtol=1e-6)


def test_audio_visual_per_frame_subjects_with_force_align(tmp_path):
    """audio_visual reduced a per-frame subjectsVec AFTER force_align padded
    the videos, indexing the original frame vector with post-alignment
    offsets (regression for the round-4 fix; same class as nstream's)."""
    from ip_avsr_tpu.cli import audio_visual

    rng = np.random.RandomState(0)
    n = 18
    lens = rng.randint(5, 9, n)
    y = rng.randint(1, 4, n)
    subjects = np.arange(n) % 6 + 1

    def frames(d, lens_s, seed):
        r = np.random.RandomState(seed)
        out = []
        for l, c in zip(lens_s, y):
            base = np.zeros(d, np.float32)
            base[(c - 1) % d] = 2.0
            out.append(base + 0.3 * r.randn(l, d).astype(np.float32))
        return np.concatenate(out)

    vis_p = str(tmp_path / "vis.mat")
    aud_p = str(tmp_path / "aud.mat")
    matio.save_mat({"dataMatrix": frames(24, lens, 1),
                    "targetsVec": np.repeat(y, lens).reshape(-1, 1),
                    # per-frame layout + audio lens mismatch = the crash
                    "subjectsVec": np.repeat(subjects, lens).reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1)}, vis_p)
    aud_lens = lens + 1
    matio.save_mat({"dataMatrix": frames(13, aud_lens, 2),
                    "targetsVec": np.repeat(y, aud_lens).reshape(-1, 1),
                    "subjectsVec": np.repeat(subjects, aud_lens).reshape(-1, 1),
                    "videoLengthVec": aud_lens.reshape(-1, 1)}, aud_p)
    (tmp_path / "train.txt").write_text("1,2,3,4\n")
    (tmp_path / "val.txt").write_text("5\n")
    (tmp_path / "test.txt").write_text("6\n")

    res = audio_visual.main([
        "--visual", vis_p, "--audio", aud_p,
        "--output-classes", "3", "--lstm_size", "6", "--windowsize", "3",
        "--num_epoch", "1", "--epochsize", "4", "--batchsize", "6",
        "--train_subjects_file", str(tmp_path / "train.txt"),
        "--val_subjects_file", str(tmp_path / "val.txt"),
        "--test_subjects_file", str(tmp_path / "test.txt")])
    assert res.test_conf.sum() == int((subjects == 6).sum())
    assert np.isfinite(res.best_val)


def test_leave_one_out_per_frame_subjects(tmp_path):
    """leave_one_out consumed subjectsVec raw; a per-frame layout made
    split_seq_data repeat frame-level ids by video lengths (shape blowup /
    garbage splits).  Now reduced to per-video first."""
    from ip_avsr_tpu.cli import leave_one_out

    rng = np.random.RandomState(0)
    n = 15
    lens = rng.randint(5, 8, n)
    y = rng.randint(1, 4, n)
    subjects = np.arange(n) % 5 + 1

    def frames(d, seed):
        r = np.random.RandomState(seed)
        out = []
        for l, c in zip(lens, y):
            base = np.zeros(d, np.float32)
            base[(c - 1) % d] = 2.0
            out.append(base + 0.3 * r.randn(l, d).astype(np.float32))
        return np.concatenate(out)

    matio.save_mat({"dataMatrix": frames(24, 1),
                    "targetsVec": np.repeat(y, lens).reshape(-1, 1),
                    "subjectsVec": np.repeat(subjects, lens).reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1)},
                   str(tmp_path / "images.mat"))
    matio.save_mat({"dataMatrix": frames(12, 2)}, str(tmp_path / "dct.mat"))

    import configparser

    cp = configparser.ConfigParser()
    cp["data"] = {"images": str(tmp_path / "images.mat"),
                  "dct": str(tmp_path / "dct.mat"), "imagesize": "4,6"}
    cp["models"] = {"lstm_size": "6", "output_classes": "3"}
    cp["training"] = {"windowsize": "3", "num_epoch": "1", "epochsize": "4",
                      "batchsize": "6", "learning_rate": "0.5",
                      "validation_window": "10"}
    with open(tmp_path / "loo.ini", "w") as f:
        cp.write(f)

    res = leave_one_out.main(["--config", str(tmp_path / "loo.ini"),
                              "--test_subj", "2"])
    assert res.test_conf.sum() == int((subjects == 2).sum())
    assert np.isfinite(res.best_val)


def test_prepare_data_real_chain_roundtrip(tmp_path):
    """prepare_data: every preprocessing flag on a real .mat, output schema
    intact (the offline chain the reference spreads over oulu/prepare_data
    and ad-hoc scripts)."""
    from ip_avsr_tpu.cli import prepare_data
    from ip_avsr_tpu.data import preprocessing as pp

    rng = np.random.RandomState(0)
    lens = np.array([6, 9, 6])
    total = int(lens.sum())
    X = rng.rand(total, 24).astype(np.float32)
    y = np.repeat([1, 2, 3], lens)
    matio.save_mat({"dataMatrix": X,
                    "targetsVec": y.reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1)},
                   str(tmp_path / "in.mat"))

    out_p = str(tmp_path / "out.mat")
    prepare_data.main(["--input", str(tmp_path / "in.mat"),
                       "--output", out_p,
                       "--imagesize", "4,6",
                       "--reorder", "--meanremove", "--diff", "--samplewise",
                       "--deltas", "3"])
    out = matio.load_mat_files([out_p])[0]
    # deltas triple the feature dim; frame count is unchanged
    assert out["dataMatrix"].shape == (total, 72)
    np.testing.assert_array_equal(out["videoLengthVec"].reshape(-1), lens)

    # independent recomputation of the same chain
    want = pp.reorder_data(X, (4, 6))
    want = pp.sequencewise_mean_image_subtraction(want, lens)
    want = pp.compute_diff_images(want, lens)
    want = pp.normalize_input(want)
    want = pp.concat_first_second_deltas(want, lens, w=3)
    np.testing.assert_allclose(out["dataMatrix"], want, rtol=1e-5, atol=1e-6)


def test_prepare_data_embed_changes_structure(tmp_path):
    """--embed factorizes + temporally embeds: targets/vidlens change too."""
    from ip_avsr_tpu.cli import prepare_data

    rng = np.random.RandomState(0)
    lens = np.array([6, 6])
    X = rng.rand(int(lens.sum()), 8).astype(np.float32)
    y = np.repeat([1, 2], lens)
    matio.save_mat({"dataMatrix": X, "targetsVec": y.reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1)},
                   str(tmp_path / "in.mat"))
    out_p = str(tmp_path / "emb.mat")
    prepare_data.main(["--input", str(tmp_path / "in.mat"),
                       "--output", out_p, "--embed", "3,3"])
    out = matio.load_mat_files([out_p])[0]
    # matches the direct preprocessing calls (lengths already multiples of
    # step, so factorize is the identity and the result is deterministic)
    from ip_avsr_tpu.data import preprocessing as pp

    want_X, want_y, want_l = pp.embed_temporal_info(X, y, lens, 3, 3)
    np.testing.assert_allclose(out["dataMatrix"], want_X, rtol=1e-6)
    np.testing.assert_array_equal(out["targetsVec"].reshape(-1), want_y)
    np.testing.assert_array_equal(out["videoLengthVec"].reshape(-1), want_l)
    assert out["videoLengthVec"].reshape(-1).sum() == out["dataMatrix"].shape[0]


def test_convae_real_data_itervec_and_resize(tmp_path):
    """convae's real branch: iterVec split selects iterations 1-2 and the
    60x80 input is resized to 30x40 before training."""
    from ip_avsr_tpu.cli import convae

    rng = np.random.RandomState(0)
    n_vids = 6
    lens = np.full(n_vids, 3)
    iters = np.array([1, 2, 3, 1, 2, 3])
    X = rng.rand(int(lens.sum()), 4800).astype(np.float32)  # 60x80
    matio.save_mat({"dataMatrix": X,
                    "videoLengthVec": lens.reshape(-1, 1),
                    "iterVec": iters.reshape(-1, 1)},
                   str(tmp_path / "rois.mat"))
    out_p = str(tmp_path / "enc.pkl")
    convae.main(["--data", str(tmp_path / "rois.mat"), "--model", "batchnorm",
                 "--epochs", "1", "--batchsize", "4", "--bottleneck", "8",
                 "--dense", "16", "--out", out_p])
    saved = matio.load_model(out_p)
    assert saved["config"]["use_batchnorm"] is True
    assert np.isfinite(saved["history"][-1])


def test_train_then_demo_and_confusion_visualizer_with_model(tmp_path):
    """The user workflow after training: --save_best -> demo --model ->
    confusion_visualizer --model (real params file, real stream .mat)."""
    from ip_avsr_tpu.cli import confusion_visualizer, demo, nstream

    paths, lens, y, subjects = _make_corpus(tmp_path, dims=(24,))
    (tmp_path / "train.txt").write_text("1,2,3,4\n")
    (tmp_path / "val.txt").write_text("5\n")
    (tmp_path / "test.txt").write_text("6\n")

    cp = configparser.ConfigParser()
    cp["stream1"] = {"data": paths[0], "imagesize": "4,6",
                     "input_dimensions": "24", "shape": "16,8",
                     "nonlinearities": "sigmoid,linear"}
    cp["lstm_classifier"] = {"windowsize": "3", "output_classes": "4",
                             "output_classnames": "a,b,c,d",
                             "lstm_size": "10", "matlab_target_offset": "true"}
    cp["training"] = {"num_epoch": "1", "epochsize": "4", "batchsize": "6",
                      "validation_window": "50",
                      "train_subjects_file": str(tmp_path / "train.txt"),
                      "val_subjects_file": str(tmp_path / "val.txt"),
                      "test_subjects_file": str(tmp_path / "test.txt")}
    cfg_path = tmp_path / "wf.ini"
    with open(cfg_path, "w") as f:
        cp.write(f)

    best_p = str(tmp_path / "best.mat")
    nstream.main(["--config", str(cfg_path), "--save_best", best_p])

    # demo loads the saved params (not the random-init smoke path)
    demo.main(["--config", str(cfg_path), "--model", best_p,
               "--synthetic", "3"])

    outdir = str(tmp_path / "viz")
    confusion_visualizer.main(["--config", str(cfg_path), "--model", best_p,
                               "--outdir", outdir, "--max_renders", "1"])
    import os

    assert os.path.isdir(outdir) and os.listdir(outdir)


def test_separate_train_and_ae_finetuner_real_data(tmp_path):
    """separate_train's real branch (offline encode with a w1..wN encoder +
    subject-file split) and ae_finetuner's real branch (iterVec split)."""
    from ip_avsr_tpu.cli import ae_finetuner, separate_train

    paths, lens, y, subjects = _make_corpus(tmp_path, dims=(24,))
    enc_path = _save_encoder(tmp_path, 24, [16, 8])
    (tmp_path / "train.txt").write_text("1,2,3,4\n")
    (tmp_path / "val.txt").write_text("5\n")
    (tmp_path / "test.txt").write_text("6\n")

    res = separate_train.main([
        "--data", paths[0], "--encoder", enc_path, "--shape", "16,8",
        "--nonlinearities", "sigmoid,linear", "--lstm_units", "8",
        "--output-classes", "4", "--num_epoch", "1", "--epochsize", "4",
        "--batchsize", "6",
        "--train_subjects_file", str(tmp_path / "train.txt"),
        "--val_subjects_file", str(tmp_path / "val.txt"),
        "--test_subjects_file", str(tmp_path / "test.txt")])
    assert res.test_conf.sum() == int((subjects == 6).sum())

    # ae_finetuner real branch needs iterVec in the .mat
    rng = np.random.RandomState(0)
    n = 9
    l2 = np.full(n, 4)
    matio.save_mat({"dataMatrix": rng.rand(int(l2.sum()), 24).astype(np.float32),
                    "videoLengthVec": l2.reshape(-1, 1),
                    "iterVec": np.tile([1, 2, 3], 3).reshape(-1, 1)},
                   str(tmp_path / "ft.mat"))
    # the finetuner needs an UNFOLDED autoencoder (reconstructs the input
    # dim), not the encoder half: 24 -> 16 -> 8 -> 16 -> 24
    ae_rng = np.random.RandomState(11)
    ae_d, prev = {}, 24
    for i, s in enumerate([16, 8, 16, 24], 1):
        ae_d[f"w{i}"] = (0.1 * ae_rng.randn(prev, s)).astype(np.float64)
        ae_d[f"b{i}"] = np.zeros((1, s))
        prev = s
    ae_path = str(tmp_path / "ae_unfolded.mat")
    matio.save_mat(ae_d, ae_path)

    out_p = str(tmp_path / "ft_out.mat")
    ae_finetuner.main(["--ae", ae_path, "--layers", "4",
                       "--activations", "sigmoid,linear,sigmoid,linear",
                       "--data", str(tmp_path / "ft.mat"),
                       "--out", out_p, "--epochs", "1", "--batchsize", "4"])
    w, b = matio.load_dbn_mat(out_p, n_layers=4)
    assert [x.shape for x in w] == [(24, 16), (16, 8), (8, 16), (16, 24)]
    # the finetune step actually changed the weights
    assert not np.allclose(w[0], ae_d["w1"])


def test_pretrain_dbn_real_data_classifier(tmp_path):
    """pretrain_dbn's --data branch (real .mat field load) with dbn_type=2
    (classifier unfold): the exported w1..wN includes the softmax layer."""
    from ip_avsr_tpu.cli import pretrain_dbn

    rng = np.random.RandomState(0)
    data = np.clip(rng.rand(60, 24), 0, 1).astype(np.float32)
    matio.save_mat({"dataMatrix": data}, str(tmp_path / "d.mat"))
    out_p = str(tmp_path / "clf.mat")
    pretrain_dbn.main(["--data", str(tmp_path / "d.mat"),
                       "--hidden", "12,6", "--activations", "sigm,sigm",
                       "--dbn-type", "2", "--output-classes", "4",
                       "--epochs", "1", "--batchsize", "16", "--out", out_p])
    w, b = matio.load_dbn_mat(out_p, n_layers=3)
    assert [x.shape for x in w] == [(24, 12), (12, 6), (6, 4)]
