"""Tests for auxiliary components: pooling, LCN, MATLAB DCT, segmentation,
SDE pretraining, net drawing, plotting."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.data import dct_matlab, segmentation
from ip_avsr_tpu.ops import lcn, pooling
from ip_avsr_tpu.pretrain import sde
from ip_avsr_tpu.utils import draw_net, plotting


def test_masked_mean_pool():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    out = np.asarray(pooling.masked_mean_pool(x, mask))
    np.testing.assert_allclose(out[0], np.arange(24).reshape(2, 4, 3)[0, :2].mean(0))
    np.testing.assert_allclose(out[1], np.arange(24).reshape(2, 4, 3)[1].mean(0))


def test_gaussian_filter_normalized():
    g = lcn.gaussian_filter(9)
    assert g.shape == (9, 9)
    np.testing.assert_allclose(g.sum(), 1.0, rtol=1e-6)
    assert g[4, 4] == g.max()


def test_lecun_lcn_shapes_and_contrast():
    rng = np.random.RandomState(0)
    # large dynamic range on purpose: subtractive-only output would keep
    # std ~30, so the divisive (contrast) stage is actually asserted
    x = jnp.asarray(rng.rand(2, 1, 16, 16).astype(np.float32) * 100 + 50)
    out = np.asarray(lcn.lecun_lcn(x, kernel_shape=5))
    assert out.shape == (2, 1, 16, 16)
    # local mean removal: output roughly zero-centered
    assert abs(out.mean()) < 0.5
    # divisive normalization: contrast pulled to O(1) regardless of the
    # input's scale (review r5: previously unasserted)
    assert 0.2 < out.std() < 3.0, out.std()
    centered = np.asarray(x) - np.asarray(x).mean()
    assert out.std() < 0.2 * centered.std()


def test_dct2_orthonormal_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randn(6, 8)
    coeffs = dct_matlab.dct2(img)
    # inverse via transposed orthonormal DCT
    import scipy.fftpack as fft

    back = fft.idct(fft.idct(coeffs, norm="ortho", axis=1), norm="ortho", axis=0)
    np.testing.assert_allclose(back, img, atol=1e-10)
    # Parseval: energy preserved
    np.testing.assert_allclose((coeffs ** 2).sum(), (img ** 2).sum(), rtol=1e-10)


def test_compute_dct_feat_and_deltas_shape():
    rng = np.random.RandomState(0)
    X = rng.randn(10, 24)  # 4x6 images
    feats = dct_matlab.compute_dct_feat(X, (4, 6), no_coeff=5)
    assert feats.shape == (10, 5)
    both = dct_matlab.compute_dct_feat_and_deltas(X, (4, 6), [6, 4], no_coeff=5)
    assert both.shape == (10, 15)
    np.testing.assert_allclose(both[:, :5], feats)


def test_htk_segmentation(tmp_path):
    label_file = tmp_path / "labels.txt"
    label_file.write_text(
        "#Normal in 100ns\n"
        "1000000 3000000 zero\n"
        "5000000 8000000 three\n"
        "#Moving\n"
        "9000000 9500000 nine\n"
    )
    labels = segmentation.parse_htk_labels(str(label_file))
    assert labels == [(1000000, 3000000, "zero"), (5000000, 8000000, "three")]
    # frames at 0.05s intervals: 100ns times 0, 500000, 1000000, ...
    pts = [i * 0.05 for i in range(20)]
    idxs, frame_labels, seq_lens = segmentation.segment_frames(pts, labels)
    # window (1000000, 3000000]: times 1500000, 2000000, 2500000, 3000000 -> 4 frames
    assert seq_lens == [4, 6]
    assert frame_labels[:4] == [0] * 4
    assert frame_labels[4:] == [3] * 6
    assert segmentation.digit_to_int("seven") == 7


def test_sde_pretraining_reduces_reconstruction_error():
    rng = np.random.RandomState(0)
    protos = rng.rand(4, 16)
    data = (protos[rng.randint(0, 4, 128)] + 0.02 * rng.randn(128, 16)).astype(np.float32)
    weights, biases = sde.train_sde(jax.random.PRNGKey(0), data, [8, 4],
                                    epochs=10, batchsize=32, log_fn=lambda s: None)
    assert [w.shape for w in weights] == [(16, 8), (8, 4)]

    # the name means it: tied-weight layer-1 reconstruction error must be
    # clearly below an UNTRAINED same-shape init's (review r5: the previous
    # assertion only checked finiteness, which random weights satisfy)
    def tied_recon_err(w, b_enc):
        code = 1 / (1 + np.exp(-(data @ w + b_enc)))
        recon = code @ np.asarray(w).T
        return float(np.mean((recon - data) ** 2))

    from ip_avsr_tpu.ops import initializers as inits

    w_raw = np.asarray(inits.glorot_uniform(jax.random.PRNGKey(123), (16, 8)))
    err_untrained = tied_recon_err(w_raw, np.zeros(8))
    err_trained = tied_recon_err(np.asarray(weights[0]), np.asarray(biases[0]))
    assert err_trained < 0.5 * err_untrained, (err_trained, err_untrained)


def test_draw_net_dot(tmp_path):
    from ip_avsr_tpu.models import zoo

    cfg = zoo.adenet_v2(40, 10, [32, 16, 8], ["sigmoid", "sigmoid", "linear"],
                        lstm_size=8, window=4, output_classes=5)
    dot = draw_net.config_to_dot(cfg)
    assert "digraph" in dot and "fusion|sum" in dot and "encoder raw" in dot
    out = draw_net.draw_to_file(cfg, str(tmp_path / "net.dot"))
    assert out.endswith(".dot")


def test_plotting_tile_and_loss(tmp_path):
    rng = np.random.RandomState(0)
    tiled = plotting.tile_raster_images(rng.rand(4, 16), (4, 4), (2, 2),
                                        tile_spacing=(1, 1))
    assert tiled.shape == (9, 9)
    plotting.plot_validation_cost([3, 2, 1], [3.2, 2.5, 1.8], [0.3, 0.5, 0.7],
                                  savefilename=str(tmp_path / "loss.png"))
    assert (tmp_path / "loss.png").exists()
    n = plotting.print_network({"a": {"w": np.zeros((3, 4))}}, log_fn=lambda s: None)
    assert n == 12


def test_tile_raster_images_reference_semantics():
    """utils/plotting_utils.py:12-129 parity: uint8 output_pixel_vals path,
    eps-regularized per-row scaling, scaling toggle, RGBA tuple branch."""
    rng = np.random.RandomState(1)
    X = rng.rand(4, 12).astype(np.float64) * 3.0 + 1.0

    # default: scale rows to [0,1], multiply by 255, store into uint8
    out = plotting.tile_raster_images(X, (3, 4), (2, 2))
    assert out.dtype == np.uint8 and out.shape == (6, 8)
    # reference arithmetic for tile (0, 0), including the +eps divisor
    img = X[0].reshape(3, 4).copy()
    img -= img.min()
    img *= 1.0 / (img.max() + 1e-8)
    expect = np.zeros((3, 4), np.uint8)
    expect[:] = img * 255  # C-cast on store, as in the reference
    np.testing.assert_array_equal(out[:3, :4], expect)

    # no scaling, float output: raw values pass through with X's dtype
    raw = plotting.tile_raster_images(X, (3, 4), (2, 2),
                                      scale_rows_to_unit_interval=False,
                                      output_pixel_vals=False)
    assert raw.dtype == X.dtype
    np.testing.assert_array_equal(raw[:3, :4], X[0].reshape(3, 4))

    # spacing + short X: gap rows/cols and missing tiles stay zero
    sp = plotting.tile_raster_images(X[:3], (3, 4), (2, 2), tile_spacing=(1, 2))
    assert sp.shape == (7, 10)
    assert not sp[3, :].any() and not sp[:, 4:6].any()  # spacing bands
    assert not sp[4:, 6:].any()  # 4th tile absent

    # RGBA tuple branch: None channels fill with defaults (alpha=255)
    rgba = plotting.tile_raster_images((X, None, None, None), (3, 4), (2, 2))
    assert rgba.shape == (6, 8, 4) and rgba.dtype == np.uint8
    np.testing.assert_array_equal(rgba[:, :, 0], out)
    assert not rgba[:, :, 1].any() and not rgba[:, :, 2].any()
    assert (rgba[:, :, 3] == 255).all()
    # float tuple variant: alpha defaults to 1.0
    rgba_f = plotting.tile_raster_images((X, X, None, None), (3, 4), (2, 2),
                                         output_pixel_vals=False)
    assert rgba_f.dtype == X.dtype and (rgba_f[:, :, 3] == 1.0).all()


def test_confusion_matrix_image(tmp_path):
    cm = np.array([[5, 1], [2, 7]])
    plotting.plot_confusion_matrix_image(cm, ["a", "b"],
                                         savefilename=str(tmp_path / "cm.png"))
    assert (tmp_path / "cm.png").exists()


def test_draw_to_notebook(tmp_path):
    """utils/draw_net.py:147-157 parity: inline notebook rendering returns an
    IPython Image backed by real PNG bytes (matplotlib fallback renderer
    here — pydot/graphviz are absent in this environment)."""
    from ip_avsr_tpu.models import zoo

    cfg = zoo.adenet_v3(12, 6, 12, lstm_size=4, window=3, output_classes=5)
    img = draw_net.draw_to_notebook(cfg)
    from IPython.display import Image

    assert isinstance(img, Image)
    assert bytes(img.data[:8]) == b"\x89PNG\r\n\x1a\n"

    # raw renderer + the draw_to_file .png path (no pydot installed)
    png = draw_net.render_png_bytes(cfg)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    out = draw_net.draw_to_file(cfg, str(tmp_path / "net.png"))
    assert out.endswith(".png")
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_draw_to_file_no_zero_byte_png_on_renderer_failure(tmp_path, monkeypatch):
    """r5 review: when the PNG renderer raises, draw_to_file must fall back
    to .dot WITHOUT leaving a truncated/0-byte .png behind (the old code
    opened the file before rendering)."""
    from ip_avsr_tpu.models import zoo

    cfg = zoo.adenet_v3(12, 6, 12, lstm_size=4, window=3, output_classes=5)

    def boom(*_a, **_k):
        raise ImportError("no matplotlib")

    monkeypatch.setattr(draw_net, "render_png_bytes", boom)
    target = tmp_path / "net.png"
    out = draw_net.draw_to_file(cfg, str(target))
    assert out.endswith(".dot") and os.path.exists(out)
    assert not target.exists(), "renderer failure must not create net.png"


def test_plotting_visualize_family(tmp_path):
    """visualize_images/sequence/layer/activations + show_image
    (utils/plotting_utils.py:163-275), headless to PNG."""
    rng = np.random.RandomState(0)
    imgs = rng.rand(9, 24)
    vis = plotting.visualize_images(imgs, (4, 6), tmp_path / "imgs")
    assert vis.ndim == 2 and (tmp_path / "imgs.png").exists()
    seq = plotting.visualize_sequence(imgs[:5], (4, 6), tmp_path / "seq")
    assert seq.ndim == 2 and (tmp_path / "seq.png").exists()
    filt = plotting.visualize_layer(rng.rand(24, 6), 4, 6, 2, 3,
                                    tmp_path / "filters")
    assert filt.ndim == 2 and (tmp_path / "filters.png").exists()
    plotting.visualize_activations(rng.rand(24, 4), imgs[:4], (4, 6), [0, 2],
                                   str(tmp_path / "act"))
    assert (tmp_path / "act_w0.png").exists()
    img = plotting.show_image(imgs[0], (4, 6), order="f",
                              savefilename=str(tmp_path / "one.png"))
    assert img.shape == (4, 6) and (tmp_path / "one.png").exists()


def test_last_valid_step_gathered_matches_carry_forward_lstm():
    """For a mask-carrying forward LSTM the true last-valid gather equals the
    reference's t = T-1 slice (ops/lstm.py last_valid_step contract)."""
    import jax

    from ip_avsr_tpu.ops import lstm as lstm_ops

    rng = np.random.RandomState(0)
    B, T, D, H = 4, 9, 5, 7
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = rng.randn(B, T, D).astype(np.float32)
    lens = np.array([9, 4, 1, 6])
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    out = lstm_ops.lstm_forward(params, x, mask)
    a = np.asarray(lstm_ops.last_valid_step(out, mask))
    b = np.asarray(lstm_ops.last_valid_step_gathered(out, mask))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    # and gathered is robust to zeroed (non-carrying) padded steps
    zeroed = np.asarray(out) * mask[:, :, None]
    c = np.asarray(lstm_ops.last_valid_step_gathered(zeroed, mask))
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-6)


def test_confusion_visualizer_cli(tmp_path, capsys):
    from ip_avsr_tpu.cli import confusion_visualizer

    confusions, conf_mat = confusion_visualizer.main(
        ["--config", "configs/synthetic_1stream.ini", "--synthetic", "12",
         "--outdir", str(tmp_path / "cv"), "--max_renders", "1"])
    out = capsys.readouterr().out
    assert "misclassified" in out
    assert conf_mat.sum() == 12
    assert (tmp_path / "cv" / "confusion_matrix.png").exists()
    if confusions:
        truth_pngs = list((tmp_path / "cv").glob("utt*_truth_*.png"))
        assert truth_pngs


def test_landmark_cli(tmp_path, monkeypatch):
    """Video discovery + glob filter + CSV outputs through the landmark CLI
    (landmarker.py / oulu/landmarking.py drivers), with frames stubbed since
    OpenCV is an offline-only dependency."""
    from ip_avsr_tpu.cli import landmark
    from ip_avsr_tpu.data import landmarking

    vids = tmp_path / "vids"
    (vids / "sub").mkdir(parents=True)
    for name in ("s1_v1_u1.mp4", "s1_v2_u1.mp4", "sub/s2_v1_u3.mp4", "notes.txt"):
        (vids / name).write_bytes(b"\x00")

    tasks = landmark.collect_tasks(str(vids), str(tmp_path / "lm"), "s*_v1_u*.mp4")
    assert [os.path.basename(v) for v, _ in tasks] == ["s1_v1_u1.mp4", "s2_v1_u3.mp4"]

    monkeypatch.setattr(landmarking, "iter_video_frames",
                        lambda path: iter(np.zeros((3, 8, 8), np.uint8)))
    n = landmark.main(["--input", str(vids), "--output", str(tmp_path / "lm"),
                       "--pattern", "s*_v1_u*.mp4", "--fake-landmarker"])
    assert n == 2
    csvs = sorted(p.name for p in (tmp_path / "lm").glob("*.csv"))
    assert csvs == ["s1_v1_u1.csv", "s2_v1_u3.csv"]
    rows = (tmp_path / "lm" / "s1_v1_u1.csv").read_text().strip().splitlines()
    assert len(rows) == 3 and len(rows[0].split(",")) == 136


def test_ffprobe_parses_ffmpeg5_field_names():
    """ffmpeg >= 5 renamed pkt_pts(_time) -> pts(_time); the parser must
    expose the reference-era attribute names either way, and default typed
    fields that a probe omits (review r3 finding)."""
    from ip_avsr_tpu.utils import ffmpeg as ff

    text = "\n".join([
        "[FRAME]", "media_type=video", "pts=1001", "pts_time=0.033367",
        "width=640", "height=480", "[/FRAME]",
        "[FRAME]", "media_type=audio", "pts=N/A", "pts_time=N/A", "[/FRAME]",
    ])
    audio, video = ff.parse_ffprobe_output(text)
    assert len(video) == 1 and len(audio) == 1
    assert video[0].pkt_pts == 1001
    assert abs(video[0].pkt_pts_time - 0.033367) < 1e-9
    assert audio[0].pkt_pts == -1
    import math
    assert math.isnan(audio[0].pkt_pts_time)
    # omitted typed fields default instead of AttributeError-ing consumers
    assert video[0].pkt_dts == -1
    assert math.isnan(video[0].pkt_duration_time)


def test_segment_frames_skips_non_digit_labels():
    from ip_avsr_tpu.data import segmentation as seg

    pts = [0.1 * i for i in range(10)]  # 0.0 .. 0.9 s
    htk = [(0, 3_000_000, "zero"),          # frames at 0.1-0.3s
           (3_000_000, 5_000_000, "sil"),   # skipped
           (5_000_000, 9_000_000, "one")]   # frames at 0.6-0.9s
    idxs, labels, seq_lens = seg.segment_frames(pts, htk)
    assert all(isinstance(l, int) for l in labels)
    assert set(labels) == {0, 1}
    assert len(seq_lens) == 2  # no spurious segment for the silence window


def test_normalise_data_sigm_reuses_train_max():
    from ip_avsr_tpu.pretrain import rbm

    train = np.array([[0.0, 4.0], [2.0, 1.0]])
    test = np.array([[8.0, 1.0]])
    tr_out, ps = rbm.normalise_data("sigm", train)
    np.testing.assert_allclose(tr_out, train / 4.0)
    te_out, _ = rbm.normalise_data("sigm", test, ps)
    np.testing.assert_allclose(te_out, test / 4.0)  # TRAIN max, not its own


def test_finetune_trains_even_when_corpus_smaller_than_batch():
    """n < batchsize must still train (review r3: the batch loop silently
    ran zero iterations and returned the untouched init)."""
    import jax

    from ip_avsr_tpu.pretrain import finetune
    from ip_avsr_tpu.pretrain.dbn import train_dbn
    from ip_avsr_tpu.pretrain.rbm import RBMHyperParams
    from ip_avsr_tpu.pretrain.unfold import unfold_dbn_to_ae

    rng = np.random.RandomState(0)
    X = rng.rand(20, 12).astype(np.float32)
    hyper = RBMHyperParams(epochs=1, batchsize=10)
    dbn = train_dbn(jax.random.PRNGKey(0), X, [6, 4], ["sigm", "sigm"],
                    hyper=hyper, log_fn=lambda *_: None)
    w, b, acts, _layers = unfold_dbn_to_ae(dbn, [6, 4], ["sigm", "sigm"],
                                          "sigm", 12)
    w0 = [np.asarray(m).copy() for m in w]
    logs = []
    w2, b2 = finetune.finetune_autoencoder(
        w, b, acts, X, epochs=1, batchsize=128,  # > n = 20
        log_fn=logs.append)
    moved = any(np.abs(np.asarray(a) - np.asarray(o)).max() > 0
                for a, o in zip(w2, w0))
    assert moved, "finetuning with n < batchsize must update parameters"


def test_landmark_pool_aborts_on_worker_crash():
    """A worker that dies without task_done must abort the pool with an
    error instead of deadlocking queue.join() (review r3)."""
    import pytest

    from ip_avsr_tpu.data import landmarking

    def crashing_factory(_arg):
        import os

        os._exit(3)  # simulate a native crash before any task_done

    with pytest.raises(RuntimeError, match="crashed|pending"):
        landmarking.run_landmark_pool([("v.mp4", "out.csv")],
                                      crashing_factory, None, workers=2)


def test_walkthrough_notebook_has_committed_outputs():
    """The committed examples notebook must carry executed outputs (the
    reference ships its notebook with 11 cells of committed history —
    avletters/avletters_training.ipynb).  Catches the artifact silently
    rotting back to an unexecuted state."""
    import nbformat

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "training_walkthrough.ipynb")
    nb = nbformat.read(path, as_version=4)
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    with_out = [c for c in code_cells if c.get("outputs")]
    assert len(with_out) >= 4, (
        f"only {len(with_out)}/{len(code_cells)} code cells have outputs — "
        "regenerate with: python scripts/run_notebook.py")
    # and none of the committed outputs is an error
    for c in code_cells:
        for out in c.get("outputs", []):
            assert out.get("output_type") != "error", c.source[:120]


def test_walkthrough_notebook_executes(tmp_path):
    """Headless re-execution of the walkthrough notebook (a fresh kernel,
    CPU-pinned backend, artifacts in a temp dir): every cell must run
    clean end to end."""
    import shutil

    import nbformat
    from nbclient import NotebookClient

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(repo, "examples", "training_walkthrough.ipynb")
    dst = tmp_path / "walkthrough.ipynb"
    shutil.copy(src, dst)
    nb = nbformat.read(str(dst), as_version=4)
    env = dict(os.environ)
    env["IP_AVSR_NB_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    old_env = dict(os.environ)
    os.environ.update(env)
    try:
        client = NotebookClient(
            nb, timeout=600, kernel_name="python3",
            resources={"metadata": {"path": str(tmp_path)}})
        client.execute()
    finally:
        os.environ.clear()
        os.environ.update(old_env)
    executed = [c for c in nb.cells if c.cell_type == "code" and c.get("outputs")]
    assert len(executed) >= 4
    assert (tmp_path / "walkthrough_curves.png").exists()
