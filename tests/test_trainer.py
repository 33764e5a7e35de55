"""Trainer: end-to-end training on tiny synthetic data (CPU)."""

import jax
import numpy as np
import pytest

from ip_avsr_tpu.models import zoo
from ip_avsr_tpu.train.trainer import Trainer, TrainOptions


def make_synthetic(n_videos=24, classes=4, dim=12, seed=0):
    """Sequences whose mean feature vector encodes the class (learnable fast)."""
    rng = np.random.RandomState(seed)
    lens = rng.randint(5, 11, n_videos)
    y_video = rng.randint(0, classes, n_videos)
    frames = []
    y_frames = []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    return np.concatenate(frames).astype(np.float32), np.concatenate(y_frames), lens


@pytest.mark.parametrize("output_mode", ["per_step", "last_step"])
def test_trainer_learns_synthetic(output_mode):
    X, y, lens = make_synthetic(40)
    Xv, yv, lensv = make_synthetic(12, seed=1)
    Xt, yt, lenst = make_synthetic(12, seed=2)

    if output_mode == "per_step":
        cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=12, output_classes=4)
    else:
        cfg = zoo.lstm_classifier_baseline(12, lstm_size=12, output_classes=4)
    options = TrainOptions(num_epoch=6, epochsize=8, batchsize=8, learning_rate=0.01,
                           validation_window=50, seed=0, log_fn=lambda s: None)
    trainer = Trainer(cfg, options)
    result = trainer.fit(([X], y, lens), ([Xv], yv, lensv), ([Xt], yt, lenst))

    assert result.epochs_run >= 1
    assert len(result.cost_train) == result.epochs_run
    # this problem is trivially separable; training must reach high accuracy
    assert result.best_cr > 0.6, result.class_rate
    assert result.test_conf.shape == (4, 4)
    assert result.test_conf.sum() == 12


def test_trainer_early_stop_and_decay():
    """Both named features must be OBSERVED, not just survive (review r5:
    'epochs_run <= num_epoch' was tautological and decay was unchecked)."""
    X, y, lens = make_synthetic(20)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    options = TrainOptions(num_epoch=40, epochsize=2, batchsize=8, learning_rate=0.05,
                           validation_window=3, decay_start=1, decay_rate=0.5,
                           seed=0, log_fn=lambda s: None)
    trainer = Trainer(cfg, options)
    result = trainer.fit(([X], y, lens), ([X], y, lens), ([X], y, lens))
    assert result.epochs_run <= 40
    assert len(result.cost_val) == result.epochs_run
    # decay actually applied: the first validation_window epochs cannot
    # early-stop, so at least 3 halvings happened before any break
    assert result.final_lr <= 0.05 * 0.5 ** 3 + 1e-12, result.final_lr

    # early stopping actually fires: a diverging run (huge adam lr) pushes
    # val cost above the early best and early_stop2 ends it well before 40
    bad = TrainOptions(num_epoch=40, epochsize=2, batchsize=8,
                       learning_rate=3.0, validation_window=3,
                       seed=0, log_fn=lambda s: None)
    diverged = Trainer(cfg, bad).fit(([X], y, lens), ([X], y, lens),
                                     ([X], y, lens))
    assert diverged.epochs_run < 40, diverged.cost_val


def test_trainer_mesh_data_parallel_matches_shapes():
    """Data-parallel path on the virtual 8-device CPU mesh."""
    X, y, lens = make_synthetic(20)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    options = TrainOptions(num_epoch=2, epochsize=3, batchsize=6, learning_rate=0.01,
                           validation_window=50, seed=0, log_fn=lambda s: None,
                           use_mesh=True)
    trainer = Trainer(cfg, options)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    result = trainer.fit(([X], y, lens), ([X], y, lens), ([X], y, lens))
    assert result.epochs_run == 2
    assert np.isfinite(result.cost_val).all()


def test_trainer_checkpoint_and_resume(tmp_path):
    from ip_avsr_tpu.models import zoo as zoo_mod

    X, y, lens = make_synthetic(20)
    cfg = zoo_mod.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    ckdir = str(tmp_path / "ck")
    opts = TrainOptions(num_epoch=3, epochsize=3, batchsize=8, learning_rate=0.01,
                        validation_window=50, seed=0, log_fn=lambda s: None,
                        checkpoint_dir=ckdir, checkpoint_every=1)
    trainer = Trainer(cfg, opts)
    r1 = trainer.fit(([X], y, lens), ([X], y, lens), ([X], y, lens))
    from ip_avsr_tpu.train import checkpoints
    assert checkpoints.latest_step(ckdir) == 3

    # resume continues from epoch 3 to 5 with restored history/best tracking
    opts2 = TrainOptions(num_epoch=5, epochsize=3, batchsize=8, learning_rate=0.01,
                         validation_window=50, seed=0, log_fn=lambda s: None,
                         checkpoint_dir=ckdir, resume=True)
    trainer2 = Trainer(cfg, opts2)
    r2 = trainer2.fit(([X], y, lens), ([X], y, lens), ([X], y, lens))
    assert len(r2.cost_val) == 5  # 3 restored + 2 new
    assert checkpoints.latest_step(ckdir) == 5


def test_trainer_adam_vlr():
    """Variable per-layer learning rates (runners/1stream_variable_lr.py)."""
    X, y, lens = make_synthetic(20)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    opts = TrainOptions(num_epoch=2, epochsize=4, batchsize=8, learning_rate=0.01,
                        optimizer="adam_vlr",
                        lr_map_config={"output": 0.05, "aggregator": 0.001},
                        validation_window=50, seed=0, log_fn=lambda s: None)
    trainer = Trainer(cfg, opts)
    result = trainer.fit(([X], y, lens), ([X], y, lens), ([X], y, lens))
    assert np.isfinite(result.cost_val).all()
    assert result.epochs_run == 2


def test_trainer_chunked_evaluation():
    """Large splits evaluate in fixed-size chunks with identical results."""
    X, y, lens = make_synthetic(40)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    opts = TrainOptions(num_epoch=1, epochsize=2, batchsize=8, learning_rate=0.01,
                        validation_window=50, seed=0, log_fn=lambda s: None)
    trainer = Trainer(cfg, opts)
    params = trainer.init_params(__import__("jax").random.PRNGKey(0))
    from ip_avsr_tpu.data.datagen import PaddedDataset
    ds = PaddedDataset([X], y, lens)
    streams, yy, mask = ds.gather(np.arange(ds.n))
    cr_whole, conf_whole = trainer.evaluate(params, streams, yy, mask,
                                            eval_batchsize=512)
    cr_chunk, conf_chunk = trainer.evaluate(params, streams, yy, mask,
                                            eval_batchsize=8)
    assert cr_whole == cr_chunk
    np.testing.assert_array_equal(conf_whole, conf_chunk)


def test_trainer_chunked_eval_with_mesh_padding():
    """Chunk size not divisible by the mesh keeps rows aligned (regression:
    device-multiple padding used to leak garbage rows into the concat)."""
    X, y, lens = make_synthetic(30)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    opts = TrainOptions(num_epoch=1, epochsize=1, batchsize=8, learning_rate=0.01,
                        validation_window=50, seed=0, log_fn=lambda s: None,
                        use_mesh=True)
    trainer = Trainer(cfg, opts)
    params = trainer.init_params(__import__("jax").random.PRNGKey(0))
    from ip_avsr_tpu.data.datagen import PaddedDataset
    ds = PaddedDataset([X], y, lens)
    streams, yy, mask = ds.gather(np.arange(ds.n))
    # eval_batchsize 7: not a multiple of the 8-device mesh, chunks pad to 8
    cr_a, conf_a = trainer.evaluate(params, streams, yy, mask, eval_batchsize=7)
    cr_b, conf_b = trainer.evaluate(params, streams, yy, mask, eval_batchsize=512)
    assert cr_a == cr_b
    np.testing.assert_array_equal(conf_a, conf_b)


def make_long_tail_synthetic(n_videos=40, classes=4, dim=12, seed=0):
    """Mostly-short sequences with a few long outliers (bucketing payoff case)."""
    rng = np.random.RandomState(seed)
    lens = rng.randint(4, 9, n_videos)
    lens[:: n_videos // 4] = rng.randint(24, 33, len(lens[:: n_videos // 4]))
    y_video = rng.randint(0, classes, n_videos)
    frames, y_frames = [], []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    return np.concatenate(frames).astype(np.float32), np.concatenate(y_frames), lens


def test_trainer_bucketed_batches():
    """Opt-in length bucketing: fewer padded frames than global-max padding,
    the waste is reported in the log, and training still learns the task."""
    X, y, lens = make_long_tail_synthetic(40)
    Xv, yv, lensv = make_long_tail_synthetic(12, seed=1)
    Xt, yt, lenst = make_long_tail_synthetic(12, seed=2)
    logs = []
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=12, output_classes=4)
    opts = TrainOptions(num_epoch=6, epochsize=8, batchsize=8, learning_rate=0.01,
                        validation_window=50, seed=0, log_fn=logs.append,
                        bucket_boundaries="auto")
    trainer = Trainer(cfg, opts)
    result = trainer.fit(([X], y, lens), ([Xv], yv, lensv), ([Xt], yt, lenst))

    from ip_avsr_tpu.data.datagen import BucketedDataset
    ds = BucketedDataset([X], y, lens)
    global_waste = 1.0 - lens.sum() / (len(lens) * lens.max())
    assert ds.padded_frame_fraction() < global_waste * 0.6
    assert any("bucketed batches" in line for line in logs)
    assert result.best_cr > 0.6, result.class_rate


def test_trainer_bucketed_matches_unbucketed_quality():
    """Single boundary at the global max T degenerates to the unbucketed
    padding scheme; final quality must match the plain path's."""
    X, y, lens = make_synthetic(40)
    Xv, yv, lensv = make_synthetic(12, seed=1)
    Xt, yt, lenst = make_synthetic(12, seed=2)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=12, output_classes=4)
    results = []
    for boundaries in (None, [int(lens.max())]):
        opts = TrainOptions(num_epoch=6, epochsize=8, batchsize=8,
                            learning_rate=0.01, validation_window=50, seed=0,
                            log_fn=lambda s: None, bucket_boundaries=boundaries)
        results.append(Trainer(cfg, opts).fit(
            ([X], y, lens), ([Xv], yv, lensv), ([Xt], yt, lenst)))
    # BOTH runs must learn (review r5: a one-sided 0.35 band let a
    # chance-level bucketed path pass); identical padding scheme -> close CR
    assert results[0].best_cr > 0.6, results[0].class_rate
    assert results[1].best_cr > 0.6, results[1].class_rate
    assert abs(results[0].best_cr - results[1].best_cr) < 0.2


def test_trainer_multihost_single_process_path():
    """multihost=True routes batches through the multi-host assembly API;
    on one process the result must equal the plain sharded path exactly."""
    import jax

    X, y, lens = make_synthetic(24)
    Xv, yv, lensv = make_synthetic(8, seed=1)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    results = []
    for mh in (False, True):
        opts = TrainOptions(num_epoch=2, epochsize=3, batchsize=6,
                            learning_rate=0.01, validation_window=50, seed=0,
                            log_fn=lambda s: None, use_mesh=True, multihost=mh)
        trainer = Trainer(cfg, opts)
        results.append(trainer.fit(([X], y, lens), ([Xv], yv, lensv),
                                   ([Xv], yv, lensv)))
    # identical data order, RNG, and (on one process) identical device batches
    np.testing.assert_allclose(results[0].cost_train, results[1].cost_train,
                               rtol=1e-6)
    np.testing.assert_allclose(results[0].cost_val, results[1].cost_val,
                               rtol=1e-6)
    leaves0 = jax.tree_util.tree_leaves(results[0].best_params)
    leaves1 = jax.tree_util.tree_leaves(results[1].best_params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_trainer_recovers_from_nan():
    """recover_on_nan: a divergent run (absurd momentum lr) restores the
    best params, halves the lr, and finishes all epochs with finite results."""
    X, y, lens = make_synthetic(24)
    Xv, yv, lensv = make_synthetic(8, seed=1)
    logs = []
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    opts = TrainOptions(num_epoch=4, epochsize=3, batchsize=8,
                        learning_rate=1e25, optimizer="momentum",
                        validation_window=50, seed=0, log_fn=logs.append,
                        recover_on_nan=True)
    trainer = Trainer(cfg, opts)
    result = trainer.fit(([X], y, lens), ([Xv], yv, lensv), ([Xv], yv, lensv))
    assert any("non-finite" in line for line in logs), logs
    assert np.isfinite(result.best_val) or result.best_val == float("inf")
    # the NaN epochs never poison the recorded histories
    assert all(np.isfinite(c) for c in result.cost_train)
    assert all(np.isfinite(c) for c in result.cost_val)
    # the documented recovery actions actually happened (review r5):
    # the lr was halved at least once ...
    assert result.final_lr < opts.learning_rate, result.final_lr
    # ... and the restored/returned parameters are finite, not the
    # exploded ones the divergent steps produced
    import jax

    for leaf in jax.tree_util.tree_leaves(result.best_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_trainer_device_data_matches_host_path():
    """device_data=True (HBM-resident dataset, on-device batch gather) must
    reproduce the host-assembled path exactly: same shuffle order, same
    costs, same final parameters."""
    import jax

    X, y, lens = make_synthetic(26)  # 26 % 8 != 0: exercises padded idx rows
    Xv, yv, lensv = make_synthetic(8, seed=1)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    results = []
    for dd in (False, True):
        opts = TrainOptions(num_epoch=3, epochsize=4, batchsize=8,
                            learning_rate=0.01, validation_window=50, seed=0,
                            log_fn=lambda s: None, device_data=dd)
        results.append(Trainer(cfg, opts).fit(([X], y, lens), ([Xv], yv, lensv),
                                              ([Xv], yv, lensv)))
    np.testing.assert_allclose(results[0].cost_train, results[1].cost_train,
                               rtol=1e-5)
    np.testing.assert_allclose(results[0].cost_val, results[1].cost_val,
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results[0].best_params),
                    jax.tree_util.tree_leaves(results[1].best_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_accum_matches_full_batch_step():
    """grad_accum_steps=K must reproduce the full-batch update: the losses'
    (numerator, frame-count) parts make the accumulated gradient the exact
    full-batch quotient, so one train_step from identical params must land
    on the same parameters and loss (float tolerance: only the summation
    order differs).  The step uses a momentum optimizer — linear in the
    gradient — because adam's eps divides near-zero entries, amplifying
    ~1e-8 f32 reorder noise into visible parameter differences (measured:
    grads agree to 1.1e-8 abs; adam params then differ ~3e-6)."""
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.models import adenet, zoo

    for output_mode_cfg in (
            zoo.lstm_classifier_majority_vote(12, lstm_size=12, output_classes=4),
            zoo.lstm_classifier_baseline(12, lstm_size=12, output_classes=4)):
        cfg = output_mode_cfg
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        B, T = 8, 9
        x = rng.randn(B, T, 12).astype(np.float32)
        lens = rng.randint(3, T + 1, B)
        mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
        y = rng.randint(0, 4, B).astype(np.int32)

        opts = lambda **kw: TrainOptions(  # noqa: E731
            batchsize=B, learning_rate=1e-2, optimizer="momentum",
            log_fn=lambda *_: None, **kw)
        plain = Trainer(cfg, opts())
        accum = Trainer(cfg, opts(grad_accum_steps=4))

        fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731
        args = plain._device_batch([x], y, mask)
        p0 = fresh()
        p1, _, l1 = plain.train_step(p0, plain.optimizer.init(p0), *args,
                                     jax.random.PRNGKey(3),
                                     jnp.asarray(1e-2, jnp.float32))
        p0b = fresh()
        p2, _, l2 = accum.train_step(p0b, accum.optimizer.init(p0b), *args,
                                     jax.random.PRNGKey(3),
                                     jnp.asarray(1e-2, jnp.float32))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7), p1, p2)


def test_grad_accum_fit_learns_and_validates_options():
    X, y, lens = make_synthetic(40)
    Xv, yv, lensv = make_synthetic(12, seed=1)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=12, output_classes=4)
    options = TrainOptions(num_epoch=6, epochsize=8, batchsize=8,
                           learning_rate=0.01, validation_window=50, seed=0,
                           grad_accum_steps=2, log_fn=lambda s: None)
    result = Trainer(cfg, options).fit(([X], y, lens), ([Xv], yv, lensv),
                                       ([Xv], yv, lensv))
    assert result.best_cr > 0.6, result.class_rate

    # K must divide batchsize
    with pytest.raises(ValueError, match="must divide"):
        Trainer(cfg, TrainOptions(batchsize=8, grad_accum_steps=3,
                                  log_fn=lambda s: None))
    # batch-norm streams are excluded (per-microbatch statistics)
    bn_cfg = zoo.adenet_v1(12, 6, lstm_size=6, window=3, output_classes=4)
    assert any(s.use_batchnorm for s in bn_cfg.streams)
    with pytest.raises(ValueError, match="batch-norm"):
        Trainer(bn_cfg, TrainOptions(batchsize=8, grad_accum_steps=2,
                                     log_fn=lambda s: None))
    # shard_map owns its own step
    with pytest.raises(ValueError, match="gspmd"):
        Trainer(cfg, TrainOptions(batchsize=8, grad_accum_steps=2,
                                  mesh_mode="shard_map", use_mesh=True,
                                  log_fn=lambda s: None))


def test_grad_accum_composes_with_data_parallel_mesh():
    """Accumulation under the gspmd dp mesh: the (K, B/K, ...) reshape
    re-partitions cleanly, and the accumulated step matches the plain mesh
    step (momentum optimizer, same eps rationale as the single-device
    equality test)."""
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.models import adenet, zoo

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual) platform")
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=12, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 9
    x = rng.randn(B, T, 12).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)

    opts = lambda **kw: TrainOptions(  # noqa: E731
        batchsize=B, learning_rate=1e-2, optimizer="momentum", use_mesh=True,
        log_fn=lambda *_: None, **kw)
    plain = Trainer(cfg, opts())
    accum = Trainer(cfg, opts(grad_accum_steps=4))

    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731
    args = plain._device_batch([x], y, mask)
    p0 = fresh()
    p1, _, l1 = plain.train_step(p0, plain.optimizer.init(p0), *args,
                                 jax.random.PRNGKey(3),
                                 jnp.asarray(1e-2, jnp.float32))
    args2 = accum._device_batch([x], y, mask)
    p0b = fresh()
    p2, _, l2 = accum.train_step(p0b, accum.optimizer.init(p0b), *args2,
                                 jax.random.PRNGKey(3),
                                 jnp.asarray(1e-2, jnp.float32))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7), p1, p2)


def test_resume_continues_lr_decay_schedule(tmp_path):
    """A resumed decay run must continue the lr schedule where the
    uninterrupted run would be (review r6: resume used to reset lr to the
    base value, training with up to (1-decay_rate)^-epochs too-large
    steps)."""
    X, y, lens = make_synthetic(20)
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    kw = dict(epochsize=2, batchsize=8, learning_rate=0.04,
              validation_window=50, decay_start=1, decay_rate=0.5, seed=0,
              log_fn=lambda s: None)
    data = (([X], y, lens),) * 3

    straight = Trainer(cfg, TrainOptions(num_epoch=6, **kw)).fit(*data)

    ckdir = str(tmp_path / "ck")
    Trainer(cfg, TrainOptions(num_epoch=3, checkpoint_dir=ckdir, **kw)).fit(*data)
    resumed = Trainer(cfg, TrainOptions(num_epoch=6, checkpoint_dir=ckdir,
                                        resume=True, **kw)).fit(*data)
    assert resumed.final_lr == pytest.approx(straight.final_lr, rel=1e-12), \
        (resumed.final_lr, straight.final_lr)
    # and the restored lr actually was the post-decay one, not the base
    assert resumed.final_lr < 0.04 * 0.5 ** 4


def test_restore_train_state_missing_step_returns_none(tmp_path):
    from ip_avsr_tpu.train import checkpoints

    assert checkpoints.restore_train_state(str(tmp_path), step=99) is None


def test_grad_accum_composes_with_sequence_parallel():
    """sp x grad_accum (interaction-matrix catch): the sp forward requires
    every MICRObatch divisible by data*seq, so _infinite_batches must pad
    batches to a multiple of K * n_dev — a batchsize that isn't (10 here,
    and 8 = the device count exactly, whose K=2 micros are 4-row) used to
    die mid-fit with an opaque 'B not divisible by data*seq' error."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    X, y, lens = make_synthetic(20)
    data = (([X], y, lens),) * 3
    for bs in (8, 10):
        opts = TrainOptions(num_epoch=2, epochsize=2, batchsize=bs,
                            learning_rate=0.01, validation_window=50, seed=0,
                            log_fn=lambda s: None, sequence_parallel=2,
                            grad_accum_steps=2)
        result = Trainer(cfg, opts).fit(*data)
        assert np.isfinite(result.cost_train).all()
        assert np.isfinite(result.cost_val).all()


def test_train_options_interaction_matrix():
    """Randomized TrainOptions COMBINATIONS (hypothesis): the pairwise
    feature tests can miss interaction bugs, so draw whole option vectors —
    optimizer x mesh/mesh_mode x model/sequence parallel x bucketing x
    grad accumulation x device_eval/device_data x nan handling — against
    model families with/without encoders, peepholes, and batch norm.

    Contract: a combination the docs declare invalid must raise ValueError;
    every other combination must complete a 2-epoch fit with finite costs.
    This also catches OVER-strict rejection of documented-valid combos
    (catches so far: the sp window check rejected delta-free models; sp x
    grad_accum microbatches violated the data*seq divisibility mid-fit).

    Config-level training knobs (lstm_remat, lstm_residual_dtype,
    fuse_scans, matmul_dtype, agg_dropout) are drawn too — they interact
    with the option axes (e.g. remat x grad_accum x shard_map) and are all
    valid everywhere under the Trainer (fuse_scans merely warns and yields
    when a residual lever is set)."""
    from hypothesis import given, settings, strategies as st

    from ip_avsr_tpu.models.adenet import AdeNetConfig, StreamSpec

    def bn_model():
        return AdeNetConfig(
            streams=[StreamSpec(input_dim=12, name="s1",
                                encoder_shapes=(10, 6),
                                encoder_nonlinearities=("sigmoid", "linear"),
                                use_batchnorm=True, use_delta=False,
                                use_lstm=False)],
            output_classes=4, lstm_size=8, agg_layers=1,
            agg_bidirectional=True, output_mode="per_step", w_init="glorot")

    MODELS = {
        "plain": lambda: zoo.lstm_classifier_majority_vote(
            12, lstm_size=8, output_classes=4),
        "peep_last": lambda: zoo.lstm_classifier_baseline(
            12, lstm_size=8, output_classes=4, use_peepholes=True),
        "encdelta": lambda: zoo.deltanet_majority_vote(
            12, [10, 6], ["sigmoid", "linear"], lstm_size=8, window=3,
            output_classes=4),
        "bn": bn_model,
    }

    X, y, lens = make_synthetic(16)
    data = (([X], y, lens),) * 3

    import os

    @settings(max_examples=int(os.environ.get("IPAVSR_COMBO_EXAMPLES", "10")),
              deadline=None)
    @given(model=st.sampled_from(sorted(MODELS)),
           optimizer=st.sampled_from(["adam", "adadelta", "momentum",
                                      "nesterov", "adam_vlr"]),
           use_mesh=st.booleans(),
           mesh_mode=st.sampled_from(["gspmd", "shard_map"]),
           mp=st.sampled_from([1, 2]),
           sp=st.sampled_from([1, 2]),
           buckets=st.sampled_from([None, "auto"]),
           grad_accum=st.sampled_from([1, 2]),
           device_eval=st.booleans(),
           device_data=st.booleans(),
           check_nans=st.booleans(),
           recover=st.booleans(),
           remat=st.booleans(),
           residual_dtype=st.sampled_from([None, "bfloat16"]),
           fuse=st.booleans(),
           mmdtype=st.sampled_from([None, "bfloat16"]),
           dropout=st.sampled_from([0.0, 0.2]))
    def run(model, optimizer, use_mesh, mesh_mode, mp, sp, buckets,
            grad_accum, device_eval, device_data, check_nans, recover,
            remat, residual_dtype, fuse, mmdtype, dropout):
        import dataclasses

        cfg = dataclasses.replace(
            MODELS[model](), lstm_remat=remat,
            lstm_residual_dtype=residual_dtype, fuse_scans=fuse,
            matmul_dtype=mmdtype, agg_dropout=dropout)
        has_bn = any(s.use_batchnorm for s in cfg.streams)
        invalid = (
            (mp > 1 and sp > 1)
            or (mp > 1 and mesh_mode == "shard_map")
            or (sp > 1 and mesh_mode == "shard_map")
            or (sp > 1 and buckets is not None)
            or (grad_accum > 1 and (has_bn or mesh_mode == "shard_map"))
        )
        opts = TrainOptions(
            num_epoch=2, epochsize=2, batchsize=8, learning_rate=0.01,
            validation_window=50, seed=0, log_fn=lambda s: None,
            optimizer=optimizer,
            lr_map_config={"output": 0.02} if optimizer == "adam_vlr" else None,
            use_mesh=use_mesh, mesh_mode=mesh_mode, model_parallel=mp,
            sequence_parallel=sp, bucket_boundaries=buckets,
            grad_accum_steps=grad_accum, device_eval=device_eval,
            device_data=device_data, check_nans=check_nans,
            recover_on_nan=recover)
        try:
            result = Trainer(cfg, opts).fit(*data)
        except ValueError:
            assert invalid, (
                f"documented-VALID combination raised ValueError: "
                f"model={model} optimizer={optimizer} use_mesh={use_mesh} "
                f"mesh_mode={mesh_mode} mp={mp} sp={sp} buckets={buckets} "
                f"grad_accum={grad_accum} device_eval={device_eval} "
                f"device_data={device_data}")
            return
        assert not invalid, (
            f"documented-INVALID combination was accepted: mp={mp} sp={sp} "
            f"mesh_mode={mesh_mode} buckets={buckets} grad_accum={grad_accum} "
            f"model={model}")
        assert result.epochs_run >= 1
        assert np.isfinite(result.cost_train).all(), result.cost_train
        assert np.isfinite(result.cost_val).all(), result.cost_val
        assert 0.0 <= result.test_cr <= 1.0

    run()


def make_order_task(n, T=12, dim=12, seed=0):
    """Temporal-structure task: class 0 = motif A then motif B, class 1 =
    B then A, equal per-class MEAN features (max mean gap ~0.04 vs motif
    magnitude 2.0) — unsolvable by any frame-pooled/mean model, so
    convergence demonstrates the recurrent learning path specifically
    (every other convergence fixture uses mean-separable classes)."""
    rng = np.random.RandomState(seed)
    A = np.zeros(dim)
    A[: dim // 2] = 2.0
    B = np.zeros(dim)
    B[dim // 2:] = 2.0
    lens = np.full(n, T)
    frames, ys = [], []
    for i in range(n):
        c = i % 2
        first, second = (A, B) if c == 0 else (B, A)
        seq = np.concatenate([np.tile(first, (T // 2, 1)),
                              np.tile(second, (T - T // 2, 1))])
        frames.append(seq + 0.3 * rng.randn(T, dim))
        ys.append(np.full(T, c))
    return (np.concatenate(frames).astype(np.float32),
            np.concatenate(ys).astype(np.int64), lens)


def test_trainer_learns_temporal_order():
    X, y, lens = make_order_task(64)
    data = (([X], y, lens),) * 3
    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=16,
                                            output_classes=2)
    opts = TrainOptions(num_epoch=40, epochsize=8, batchsize=16,
                        learning_rate=0.01, validation_window=100, seed=0,
                        log_fn=lambda s: None)
    res = Trainer(cfg, opts).fit(*data)
    assert res.test_cr >= 0.95, res.test_cr
