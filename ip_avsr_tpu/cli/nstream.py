"""Generic config-driven N-stream training runner.

CLI parity with runners/{1,2,3,4}stream.py: ``--config <ini>`` plus the
standard overrides (``--write_results``, ``--learning_rate``, ``--save_best``,
``--save_plot``; runners/4stream.py:116-137), the same [streamN] /
[lstm_classifier] / [training] INI schema, the same preprocessing pipeline
(presplit: reorder / meanremove / diffimage / samplewisenormalize; force-align;
subject-based split; postsplit featurewise normalize —
runners/4stream.py:90-113,238-294), pretrained encoder loading, and the same
per-epoch report lines.

Additions over the reference: ``--synthetic N`` fabricates a dataset (for
smoke-running without the gitignored corpora), ``--mesh`` turns on
data-parallel execution over all local devices, and ``--optimizer``.

Usage:
    python -m ip_avsr_tpu.cli.nstream --config configs/synthetic_1stream.ini
"""

from __future__ import annotations

import argparse

import numpy as np

from ip_avsr_tpu.data import preprocessing as pp
from ip_avsr_tpu.io import matio
from ip_avsr_tpu.models import adenet
from ip_avsr_tpu.ops.nonlinearities import select_nonlinearity  # noqa: F401 (registry check)
from ip_avsr_tpu.train import config as config_lib
from ip_avsr_tpu.train.evaluation import plot_confusion_matrix
from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

import jax


def parse_options(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="config/1stream.ini",
                        help="[CONFIG_FILE] config file to use")
    parser.add_argument("--write_results", help="[FILE] append results csv")
    parser.add_argument("--learning_rate", type=float, help="override learning rate")
    parser.add_argument("--save_best", help="[FILE] save the best model params")
    parser.add_argument("--save_plot", help="[FILE_PREFIX] save loss curve + confusion")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="use N synthetic videos instead of .mat datasets")
    parser.add_argument("--split", default="subjects", choices=["subjects", "itervec"],
                        help="'subjects': subject-id file split (runners/*); "
                             "'itervec': AVLetters-style iterations 1,2=train, "
                             "3=test (utils/preprocessing.py:54-74)")
    parser.add_argument("--mesh", action="store_true", help="data-parallel over devices")
    parser.add_argument("--mesh_mode", default="gspmd", choices=["gspmd", "shard_map"],
                        help="with --mesh: XLA-partitioned program (gspmd) or "
                             "explicit per-device bodies (shard_map; keeps the "
                             "Pallas kernels active on multi-chip TPU)")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="tensor parallelism: size of the 'model' mesh "
                             "axis (encoder weights column-sharded; builds a "
                             "dp x tp mesh over the visible devices)")
    parser.add_argument("--zero1", action="store_true",
                        help="ZeRO-1 optimizer-state sharding over the data "
                             "axis (moments sharded, params replicated; "
                             "implies --mesh, gspmd only)")
    parser.add_argument("--sequence_parallel", type=int, default=1,
                        help="sequence parallelism: size of the 'seq' mesh "
                             "axis (time-sharded prefix with halo-exchanged "
                             "deltas; for long feature streams)")
    parser.add_argument("--device_data", action="store_true",
                        help="stage the training set in device HBM; per-step "
                             "transfer is just the batch index array")
    parser.add_argument("--checkpoint_dir", help="orbax train-state checkpoints")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in --checkpoint_dir")
    parser.add_argument("--num_epoch", type=int)
    parser.add_argument("--validation_window", type=int)
    return parser.parse_args(argv)


def synthesize_dataset(n_videos, dim, classes, seed=0):
    """Fabricate a dataset dict with the reference's .mat schema.

    Sequence structure (lengths / targets / subjects) is drawn from a fixed
    seed so multiple synthetic streams stay frame-aligned; only the feature
    noise varies with ``seed``.
    """
    struct_rng = np.random.RandomState(0)
    rng = np.random.RandomState(seed + 1)
    lens = struct_rng.randint(10, 25, n_videos)
    y = struct_rng.randint(1, classes + 1, n_videos)  # MATLAB-style 1-based
    subjects = struct_rng.randint(1, 11, n_videos)  # per-video, like the .mat schema
    frames = []
    for l, c in zip(lens, y):
        base = np.zeros(dim, np.float32)
        base[(c - 1) % dim] = 2.0
        frames.append(base + 0.5 * rng.randn(l, dim).astype(np.float32))
    return {
        "dataMatrix": np.concatenate(frames),
        "targetsVec": np.repeat(y, lens).reshape(-1, 1),  # per-frame
        "subjectsVec": subjects.reshape(-1, 1),
        "videoLengthVec": lens.reshape(-1, 1),
    }


def presplit_processing(data_matrix, vidlens, sc: config_lib.StreamConfig):
    """runners/4stream.py:90-105 presplit pipeline."""
    if sc.reorderdata:
        data_matrix = pp.reorder_data(data_matrix, sc.imagesize)
    if sc.meanremove:
        data_matrix = pp.sequencewise_mean_image_subtraction(data_matrix, vidlens)
    if sc.diffimage:
        data_matrix = pp.compute_diff_images(data_matrix, vidlens)
    if sc.samplewisenormalize:
        data_matrix = pp.normalize_input(data_matrix)
    return data_matrix


def main(argv=None):
    options = parse_options(argv)
    cp = config_lib.load_config(options.config)
    stream_cfgs = config_lib.parse_streams(cp)
    clf = config_lib.parse_classifier(cp)
    tc = config_lib.parse_training(cp)

    print(f"Reading Config File: {options.config}...")
    print(f"streams: {[s.name for s in stream_cfgs]}")

    # ---- load data -------------------------------------------------------
    if options.synthetic:
        datasets = [synthesize_dataset(options.synthetic, sc.input_dimensions,
                                       clf.output_classes, seed=i)
                    for i, sc in enumerate(stream_cfgs)]
    else:
        # all stream files in one parallel pass (native loader thread pool)
        datasets = matio.load_mat_files([sc.data for sc in stream_cfgs])

    s1 = datasets[0]
    targets_vec = s1["targetsVec"].reshape(-1).astype(np.int64)
    subjects_vec = s1["subjectsVec"].reshape(-1)
    vidlen_vec = s1["videoLengthVec"].reshape(-1).astype(np.int64)
    if clf.matlab_target_offset or options.synthetic:
        targets_vec = targets_vec - 1

    matrices = [d["dataMatrix"].astype(np.float32) for d in datasets]
    matrices = [presplit_processing(m, vidlen_vec, sc)
                for m, sc in zip(matrices, stream_cfgs)]

    if stream_cfgs[0].force_align_data and not options.synthetic:
        # reduce a per-frame subjectsVec to per-video BEFORE alignment:
        # force_align pads every video to the longest stream's length, so the
        # post-alignment vidlen_vec no longer indexes stream1's original
        # frame vector (off-by-the-padding IndexError, or silently wrong
        # subject ids when the totals happen to fit)
        if len(subjects_vec) != len(vidlen_vec):
            subjects_vec = _video_subjects(subjects_vec, vidlen_vec)
        orig = []
        for d, m in zip(datasets, matrices):
            orig.append((m, d["targetsVec"].reshape(-1), d["videoLengthVec"].reshape(-1)))
        new_streams = pp.multistream_force_align(orig)
        matrices = [s[0] for s in new_streams]
        targets_vec = new_streams[0][1].astype(np.int64)
        vidlen_vec = new_streams[0][2]
        if clf.matlab_target_offset:
            targets_vec = targets_vec - 1

    # ---- split ------------------------------------------------------------
    if options.split == "itervec" and not options.synthetic:
        # AVLetters-style: frame-level boolean split from iterVec; iterations
        # 1 and 2 train, the rest test; test doubles as the validation set
        # (the avletters mains evaluate on test each epoch).
        iter_vec = s1["iterVec"].reshape(-1)
        train_mask = pp.create_split_index(len(matrices[0]), vidlen_vec, iter_vec)
        train_lens_l, test_lens_l = pp.split_videolen(vidlen_vec.tolist(),
                                                      iter_vec.tolist())
        train_streams = [m[train_mask] for m in matrices]
        test_streams = [m[~train_mask] for m in matrices]
        val_streams = list(test_streams)
        train_y = targets_vec[train_mask]
        test_y = targets_vec[~train_mask]
        val_y = test_y
        train_lens = np.asarray(train_lens_l)
        test_lens = np.asarray(test_lens_l)
        val_lens = test_lens
        return _train_and_report(options, clf, tc, stream_cfgs,
                                 train_streams, train_y, train_lens,
                                 val_streams, val_y, val_lens,
                                 test_streams, test_y, test_lens,
                                 lr_map_config=config_lib.parse_lr_map(cp))

    if options.synthetic:
        train_ids, val_ids, test_ids = \
            config_lib.synthetic_subject_split(subjects_vec)
    else:
        train_ids = matio.read_data_split_file(tc.train_subjects_file)
        val_ids = matio.read_data_split_file(tc.val_subjects_file)
        test_ids = matio.read_data_split_file(tc.test_subjects_file)

    # subjectsVec is per-video in the .mat schema; tolerate per-frame variants
    if len(subjects_vec) == len(vidlen_vec):
        video_subjects = subjects_vec
    else:
        video_subjects = _video_subjects(subjects_vec, vidlen_vec)
    split = [pp.split_seq_data(m, targets_vec, video_subjects,
                               vidlen_vec, train_ids, val_ids, test_ids)
             for m in matrices]

    train_streams = [s[0] for s in split]
    val_streams = [s[4] for s in split]
    test_streams = [s[8] for s in split]
    train_y, train_lens = split[0][1], split[0][2]
    val_y, val_lens = split[0][5], split[0][6]
    test_y, test_lens = split[0][9], split[0][10]

    return _train_and_report(options, clf, tc, stream_cfgs,
                             train_streams, train_y, train_lens,
                             val_streams, val_y, val_lens,
                             test_streams, test_y, test_lens,
                             lr_map_config=config_lib.parse_lr_map(cp))


def _train_and_report(options, clf, tc, stream_cfgs,
                      train_streams, train_y, train_lens,
                      val_streams, val_y, val_lens,
                      test_streams, test_y, test_lens,
                      lr_map_config=None):
    # ---- postsplit featurewise normalization ------------------------------
    for i, sc in enumerate(stream_cfgs):
        if sc.featurewisenormalize:
            train_streams[i], mean, std = pp.featurewise_normalize_sequence(train_streams[i])
            val_streams[i] = (val_streams[i] - mean) / std
            test_streams[i] = (test_streams[i] - mean) / std

    # ---- model ------------------------------------------------------------
    encoders = []
    pretrained = []
    for sc in stream_cfgs:
        if sc.shape and sc.use_encoder:
            encoders.append((sc.nonlinearities, sc.shape))
            if sc.model and not options.synthetic:
                w, b, _, _ = matio.load_decoder(sc.model, sc.shape,
                                                ",".join(sc.nonlinearities))
                pretrained.append((w, b))
            else:
                pretrained.append(None)
        else:
            encoders.append(None)
            pretrained.append(None)

    # one shared builder for every CLI (config_lib.build_model_config —
    # demo/confusion_visualizer rebuild the SAME config for a trained model)
    model_cfg = config_lib.build_model_config(stream_cfgs, clf, encoders)

    if tc.matmul_dtype:
        model_cfg = adenet.AdeNetConfig(**{**model_cfg.__dict__,
                                           "matmul_dtype": tc.matmul_dtype})

    # `is None` (not `or`): 0 is a legitimate explicit override
    # (--num_epoch 0 = eval-only smoke run)
    topts = TrainOptions(
        num_epoch=tc.num_epoch if options.num_epoch is None else options.num_epoch,
        epochsize=tc.epochsize,
        batchsize=tc.batchsize,
        learning_rate=(tc.learning_rate if options.learning_rate is None
                       else options.learning_rate),
        optimizer=tc.optimizer,
        validation_window=(tc.validation_window
                           if options.validation_window is None
                           else options.validation_window),
        window=clf.windowsize,
        decay_rate=tc.decay_rate,
        decay_start=tc.decay_start,
        use_mesh=options.mesh,
        mesh_mode=options.mesh_mode,
        model_parallel=options.model_parallel,
        sequence_parallel=options.sequence_parallel,
        zero1=options.zero1,
        checkpoint_dir=options.checkpoint_dir,
        resume=options.resume,
        bucket_boundaries=tc.bucket_boundaries,
        device_data=options.device_data,
        grad_accum_steps=tc.grad_accum_steps,
        lr_map_config=lr_map_config,
    )

    trainer = Trainer(model_cfg, topts)
    params0 = trainer.init_params(jax.random.PRNGKey(topts.seed),
                                  pretrained_encoders=pretrained if any(
                                      p is not None for p in pretrained) else None)
    trainer.init_params = lambda key, **kw: params0  # reuse pretrained init

    print("begin training...")
    result = trainer.fit(
        (train_streams, train_y, train_lens),
        (val_streams, val_y, val_lens),
        (test_streams, test_y, test_lens),
    )

    print("Final Model")
    print(f"CR: {result.best_cr}, val loss: {result.best_val}, Test CR: {result.test_cr}")
    classnames = clf.output_classnames or [str(i) for i in range(clf.output_classes)]
    table = plot_confusion_matrix(result.test_conf, classnames, fmt="pipe")
    print("confusion matrix: ")
    print(table)

    if options.save_plot:
        _save_loss_plot(result, options.save_plot)
        with open(f"{options.save_plot}.confmat.txt", "a") as f:
            f.write(table + "\n\n")
    if options.write_results:
        with open(options.write_results, "a") as f:
            f.write(f"{result.test_cr},{result.best_cr},{result.best_val}\n")
    if options.save_best:
        matio.save_model_params(result.best_params, options.save_best)
        print(f"best model saved to {options.save_best}")
    return result


def _video_subjects(subjects_vec, vidlen_vec):
    """Frame-level subjects -> per-video subjects via frame offsets."""
    from ip_avsr_tpu.data.datagen import compute_integral_len

    return np.asarray(subjects_vec)[np.asarray(compute_integral_len(vidlen_vec))]


def _save_loss_plot(result, prefix):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = np.arange(1, len(result.cost_train) + 1)
        plt.figure()
        plt.plot(epochs, result.cost_train, label="train")
        plt.plot(epochs, result.cost_val, label="validation")
        plt.xlabel("epoch")
        plt.ylabel("cost")
        plt.legend()
        plt.savefig(f"{prefix}.validloss.png")
        plt.close()
    except Exception as e:  # pragma: no cover
        print(f"could not save plot: {e}")


if __name__ == "__main__":
    main()
