"""On-chip END-TO-END pins (VERDICT r3 weak-2): the claims the CPU suite
cannot check.

* The committed golden fixtures (tests/goldens/goldens.npz, pinned on CPU)
  re-evaluated on the XLA:TPU backend — so TPU numeric drift (matmul
  precision, transcendental approximations, Pallas kernel dispatch in the
  training path) fails a test instead of passing unnoticed.
* The PARITY §5 trainer-convergence claim ("reaches CR 1.0 on separable
  synthetic data on real TPU, adam and adadelta"), previously demonstrated
  by hand, now an automated assertion.
"""

import numpy as np
import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_goldens():
    from tests.goldens_lib import GOLDEN_PATH

    return dict(np.load(GOLDEN_PATH))


def test_zoo_goldens_on_tpu_backend():
    """Every committed zoo/conv-AE forward golden, recomputed on the TPU
    backend at highest matmul precision, must match the CPU-pinned value.
    Tolerance: f32 accumulation everywhere (preferred_element_type), so
    only transcendental approximation differences remain (~1e-5 on
    sigmoid/tanh chains over T timesteps)."""
    import jax

    from tests.goldens_lib import compute_zoo_goldens

    committed = _load_goldens()
    with jax.default_matmul_precision("highest"):
        got = compute_zoo_goldens()
    checked = 0
    for key, val in got.items():
        assert key in committed, f"missing committed golden for {key}"
        np.testing.assert_allclose(
            val, committed[key], rtol=1e-3, atol=2e-5,
            err_msg=f"TPU-backend drift in {key}")
        checked += 1
    assert checked >= 30  # 26 zoo cases + 4 conv-AE variants


def test_gradient_goldens_on_tpu_backend():
    """The committed TRAINING gradients (custom-VJP cores -> on TPU these
    dispatch the Pallas train/backward kernels where shapes fit VMEM)
    recomputed on-chip vs the CPU-pinned vectors.  Compared on the scale of
    each case's gradient so tiny-magnitude leaves don't dominate."""
    import jax

    from tests.goldens_lib import compute_gradient_goldens

    committed = _load_goldens()
    with jax.default_matmul_precision("highest"):
        got = compute_gradient_goldens()
    assert len(got) >= 4
    for key, val in got.items():
        want = committed[key]
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(
            val / scale, want / scale, atol=2e-4,
            err_msg=f"TPU-backend training-gradient drift in {key}")


def _separable_corpus(n_videos, dim=24, classes=4, seed=1):
    rng = np.random.RandomState(seed)
    lens = rng.randint(5, 10, n_videos)
    y_video = rng.randint(0, classes, n_videos)
    frames, y_frames = [], []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    return (np.concatenate(frames).astype(np.float32),
            np.concatenate(y_frames), lens)


@pytest.mark.parametrize("optimizer", ["adam", "adadelta"])
def test_trainer_reaches_cr1_on_chip(optimizer):
    """docs/PARITY.md §5: a Trainer.fit on the real chip reaches CR 1.0 on
    linearly separable synthetic data with both reference optimizers
    (adam — runners/4stream.py:336-337; adadelta —
    oulu/trimodal_with_val.py:390)."""
    from ip_avsr_tpu.models import zoo
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    X, y, lens = _separable_corpus(48)
    Xv, yv, lensv = _separable_corpus(16, seed=2)
    cfg = zoo.deltanet_majority_vote(24, [32, 16, 8],
                                     ["sigmoid", "sigmoid", "linear"],
                                     lstm_size=8, window=4, output_classes=4)
    lr = 1.0 if optimizer == "adadelta" else 0.01
    epochs = 16 if optimizer == "adadelta" else 10  # adadelta's effective
    # step is tiny until the accumulators warm up (lasagne defaults)
    opts = TrainOptions(num_epoch=epochs, epochsize=10, batchsize=16,
                        learning_rate=lr, optimizer=optimizer,
                        prefetch_batches=False, log_fn=lambda *_: None)
    res = Trainer(cfg, opts).fit(([X], y, lens), ([Xv], yv, lensv),
                                 ([Xv], yv, lensv))
    assert res.test_cr == 1.0, (optimizer, res.test_cr, res.class_rate)
    assert np.isfinite(res.cost_val).all()


def test_trainer_learns_temporal_order_on_tpu():
    """Recurrence-required convergence on the real chip: the temporal-ORDER
    task (equal class mean features; see tests/test_trainer.make_order_task)
    reaches CR >= 0.95 — pins that the compiled TPU training path learns
    temporal structure, not just frame statistics."""
    from ip_avsr_tpu.models import zoo
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions
    from tests.test_trainer import make_order_task

    X, y, lens = make_order_task(64)
    data = (([X], y, lens),) * 3
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=16,
                                            output_classes=2)
    opts = TrainOptions(num_epoch=40, epochsize=8, batchsize=16,
                        learning_rate=0.01, validation_window=100, seed=0,
                        log_fn=lambda s: None)
    res = Trainer(cfg, opts).fit(*data)
    assert res.test_cr >= 0.95, res.test_cr
