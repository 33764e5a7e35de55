"""The trimodal dataset CLI's real-corpus path (legacy INI schema).

The suite drove cli/trimodal only with --synthetic, which skips what the
reference's oulu/trimodal_with_val.py:274-339 does with real data: load the
images + dct .mat pair, apply the Fortran-order reorder quirk, read the
legacy [data]/[models]/[training] schema, load the two 4-layer pretrained
autoencoders (ae_pretrained / ae_diff_pretrained), split by subject files
or hold one subject out (--test_subj), and write the report artifacts.
"""

import configparser

import numpy as np
import pytest

from ip_avsr_tpu.io import matio

DIM, DCT_DIM, CLASSES = 48, 12, 3
ENC_SHAPES = (2000, 1000, 500, 50)  # hardcoded for real data, as in the
# reference's oulu mains (the OuluVS AEs are this architecture)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("trimodal")
    rng = np.random.RandomState(0)
    n = 18
    lens = rng.randint(5, 9, n)
    y = rng.randint(1, CLASSES + 1, n)  # 1-based (the CLI subtracts 1)
    subjects = np.arange(n) % 6 + 1
    total = int(lens.sum())

    def frames(d, seed):
        r = np.random.RandomState(seed)
        out = []
        for l, c in zip(lens, y):
            base = np.zeros(d, np.float32)
            base[(c - 1) % d] = 2.0
            out.append(base + 0.3 * r.randn(l, d).astype(np.float32))
        return np.concatenate(out)

    matio.save_mat({"dataMatrix": frames(DIM, 1),
                    "targetsVec": np.repeat(y, lens).reshape(-1, 1),
                    "subjectsVec": subjects.reshape(-1, 1),
                    "videoLengthVec": lens.reshape(-1, 1)},
                   str(tmp_path / "images.mat"))
    # the dct file carries the reference's own key name
    matio.save_mat({"dctFeatures": frames(DCT_DIM, 2)},
                   str(tmp_path / "dct.mat"))

    # two pretrained 4-layer AEs in the w1..w4/b1..b4 ABI
    for name in ("ae.mat", "ae_diff.mat"):
        r = np.random.RandomState(hash(name) % 1000)
        d = {}
        prev = DIM
        for i, s in enumerate(ENC_SHAPES, 1):
            d[f"w{i}"] = (0.01 * r.randn(prev, s)).astype(np.float32)
            d[f"b{i}"] = np.zeros((1, s), np.float32)
            prev = s
        matio.save_mat(d, str(tmp_path / name))

    (tmp_path / "train.txt").write_text("1,2,3,4\n")
    (tmp_path / "val.txt").write_text("5\n")
    (tmp_path / "test.txt").write_text("6\n")

    cp = configparser.ConfigParser()
    cp["data"] = {"images": str(tmp_path / "images.mat"),
                  "dct": str(tmp_path / "dct.mat"),
                  "imagesize": "6,8"}
    cp["models"] = {"fusiontype": "sum", "lstm_size": "6",
                    "output_classes": str(CLASSES),
                    "ae_pretrained": str(tmp_path / "ae.mat"),
                    "ae_diff_pretrained": str(tmp_path / "ae_diff.mat")}
    cp["training"] = {"windowsize": "3", "num_epoch": "1", "epochsize": "4",
                      "batchsize": "6", "learning_rate": "0.5",
                      "validation_window": "10",
                      "train_subjects_file": str(tmp_path / "train.txt"),
                      "val_subjects_file": str(tmp_path / "val.txt"),
                      "test_subjects_file": str(tmp_path / "test.txt")}
    cfg = tmp_path / "trimodal.ini"
    with open(cfg, "w") as f:
        cp.write(f)
    return tmp_path, subjects


def test_trimodal_real_corpus_with_pretrained_aes(corpus):
    from ip_avsr_tpu.cli import trimodal
    from ip_avsr_tpu.train import trainer as trainer_mod

    tmp_path, subjects = corpus
    captured = {}
    orig_init = trainer_mod.Trainer.init_params

    def spy(self, key, **kw):
        params = orig_init(self, key, **kw)
        captured.setdefault("params", params)
        return params

    trainer_mod.Trainer.init_params = spy
    try:
        res = trimodal.main(["--config", str(tmp_path / "trimodal.ini"),
                             "--write_results", str(tmp_path / "res.csv"),
                             "--save_best", str(tmp_path / "best.mat")])
    finally:
        trainer_mod.Trainer.init_params = orig_init

    # subject 6's videos form the test set
    assert res.test_conf.sum() == int((subjects == 6).sum())
    assert np.isfinite(res.best_val)
    assert (tmp_path / "res.csv").exists()
    assert (tmp_path / "best.mat").exists()

    # both pretrained AEs reached the raw/diff encoders (dct has none)
    ae = matio.load_mat_files([str(tmp_path / "ae.mat")])[0]
    raw_enc = captured["params"]["streams"]["raw"]["encoder"]
    np.testing.assert_allclose(np.asarray(raw_enc["fc1"]["w"]), ae["w1"],
                               rtol=1e-6)
    ae_diff = matio.load_mat_files([str(tmp_path / "ae_diff.mat")])[0]
    diff_enc = captured["params"]["streams"]["diff"]["encoder"]
    np.testing.assert_allclose(np.asarray(diff_enc["fc1"]["w"]),
                               ae_diff["w1"], rtol=1e-6)


def test_trimodal_leave_one_out_flag(corpus):
    from ip_avsr_tpu.cli import trimodal

    tmp_path, subjects = corpus
    res = trimodal.main(["--config", str(tmp_path / "trimodal.ini"),
                         "--test_subj", "3"])
    # the held-out subject's videos are exactly the test set
    assert res.test_conf.sum() == int((subjects == 3).sum())
    assert np.isfinite(res.best_val)


def test_trimodal_accepts_reference_model_key_names(corpus, capsys):
    """A reference user's INI uses [models] finetuned / finetuned_diff
    (oulu/trimodal_with_val.py:276-278) — those names must load the AEs
    too (they used to be silently ignored, training from scratch)."""
    import configparser

    from ip_avsr_tpu.cli import trimodal

    tmp_path, _ = corpus
    cp = configparser.ConfigParser()
    cp.read(str(tmp_path / "trimodal.ini"))
    # swap to the reference key names + exercise the do_finetune note
    del cp["models"]["ae_pretrained"], cp["models"]["ae_diff_pretrained"]
    cp["models"]["finetuned"] = str(tmp_path / "ae.mat")
    cp["models"]["finetuned_diff"] = str(tmp_path / "ae_diff.mat")
    cp["training"]["do_finetune"] = "True"
    ref_ini = tmp_path / "trimodal_refkeys.ini"
    with open(ref_ini, "w") as f:
        cp.write(f)

    from ip_avsr_tpu.train import trainer as trainer_mod

    captured = {}
    orig_init = trainer_mod.Trainer.init_params

    def spy(self, key, **kw):
        captured["pretrained"] = kw.get("pretrained_encoders")
        return orig_init(self, key, **kw)

    trainer_mod.Trainer.init_params = spy
    try:
        trimodal.main(["--config", str(ref_ini), "--num_epoch", "1"])
    finally:
        trainer_mod.Trainer.init_params = orig_init
    assert captured["pretrained"] is not None  # AEs actually reached init
    assert "ae_finetuner" in capsys.readouterr().out  # do_finetune note
