"""INI config system — key-compatible with the reference's two schemas.

Schema "generic" (runners/*.py, e.g. runners/4stream.py:159-224):
  [stream1..N]  data, imagesize, model, input_dimensions, shape,
                nonlinearities, reorderdata, diffimage, meanremove,
                samplewisenormalize, featurewisenormalize, force_align_data
  [lstm_classifier] fusiontype, weight_init, use_peepholes, windowsize,
                output_classes, output_classnames, lstm_size,
                matlab_target_offset, use_dropout
  [training]    validation_window, num_epoch, learning_rate, epochsize,
                batchsize, train_subjects_file, val_subjects_file,
                test_subjects_file, bucket_boundaries, matmul_dtype,
                grad_accum_steps
  [lr_map]      optional: parameter-path prefixes -> per-layer learning
                rates for optimizer = adam_vlr (1stream_variable_lr.py)

Schema "legacy" ([data]/[models]/[training], oulu/trimodal_with_val.py:274-287)
is accepted by :func:`parse_legacy_config` for the dataset-specific CLIs.
"""

from __future__ import annotations

import configparser
import dataclasses
from typing import List, Optional


@dataclasses.dataclass
class StreamConfig:
    name: str
    data: Optional[str] = None
    imagesize: Optional[tuple] = None
    model: Optional[str] = None  # path to w1..wN/b1..bN .mat encoder
    input_dimensions: int = 0
    shape: Optional[List[int]] = None
    nonlinearities: Optional[List[str]] = None
    reorderdata: bool = False
    diffimage: bool = False
    meanremove: bool = False
    samplewisenormalize: bool = False
    featurewisenormalize: bool = False
    force_align_data: bool = False
    use_encoder: bool = True
    use_delta: bool = True  # False: adenet_v2_nodelta-style ablation


@dataclasses.dataclass
class ClassifierConfig:
    fusiontype: str = "sum"
    weight_init: str = "glorot"
    use_peepholes: bool = False
    windowsize: int = 9
    output_classes: int = 26
    output_classnames: Optional[List[str]] = None
    lstm_size: int = 250
    matlab_target_offset: bool = False
    use_dropout: bool = False
    use_blstm: bool = True
    # drop the (T, B, 4H) gate residuals and recompute in the backward
    # (models/adenet.AdeNetConfig.lstm_remat — long-sequence memory lever)
    lstm_remat: bool = False
    # store LSTM training residual stacks in this dtype, e.g. "bfloat16"
    # (models/adenet.AdeNetConfig.lstm_residual_dtype — HBM-traffic lever)
    lstm_residual_dtype: Optional[str] = None


@dataclasses.dataclass
class TrainingConfig:
    validation_window: int = 6
    num_epoch: int = 30
    learning_rate: float = 1e-4
    epochsize: int = 120
    batchsize: int = 30
    optimizer: str = "adam"
    decay_rate: float = 0.0
    decay_start: Optional[int] = None
    train_subjects_file: Optional[str] = None
    val_subjects_file: Optional[str] = None
    test_subjects_file: Optional[str] = None
    # "auto", or comma-separated T upper bounds; None = global-max padding
    bucket_boundaries: Optional[object] = None
    # e.g. "bfloat16": cast matmul operands (f32 accumulation) for MXU
    # throughput; None = full f32
    matmul_dtype: Optional[str] = None
    # K>1: lax.scan K microbatches per step, accumulating the exact
    # full-batch gradient with K-fold less residual memory
    # (TrainOptions.grad_accum_steps)
    grad_accum_steps: int = 1


def load_config(path: str) -> configparser.ConfigParser:
    cp = configparser.ConfigParser()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(f"config file not found: {path}")
    return cp


def _getboolean(cp, section, key, default=False):
    try:
        return cp.getboolean(section, key)
    except (configparser.NoOptionError, configparser.NoSectionError, ValueError):
        return default


def _get(cp, section, key, default=None):
    try:
        return cp.get(section, key)
    except (configparser.NoOptionError, configparser.NoSectionError):
        return default


def parse_stream(cp: configparser.ConfigParser, section: str) -> StreamConfig:
    shape = _get(cp, section, "shape")
    nonlin = _get(cp, section, "nonlinearities")
    imagesize = _get(cp, section, "imagesize")
    return StreamConfig(
        name=section,
        data=_get(cp, section, "data"),
        imagesize=tuple(int(d) for d in imagesize.split(",")) if imagesize else None,
        model=_get(cp, section, "model"),
        input_dimensions=int(_get(cp, section, "input_dimensions", 0)),
        shape=[int(s) for s in shape.split(",")] if shape else None,
        nonlinearities=nonlin.split(",") if nonlin else None,
        reorderdata=_getboolean(cp, section, "reorderdata"),
        diffimage=_getboolean(cp, section, "diffimage"),
        meanremove=_getboolean(cp, section, "meanremove"),
        samplewisenormalize=_getboolean(cp, section, "samplewisenormalize"),
        featurewisenormalize=_getboolean(cp, section, "featurewisenormalize"),
        force_align_data=_getboolean(cp, section, "force_align_data"),
        use_encoder=_getboolean(cp, section, "use_encoder", default=True),
        use_delta=_getboolean(cp, section, "use_delta", default=True),
    )


def parse_streams(cp: configparser.ConfigParser) -> List[StreamConfig]:
    streams = []
    i = 1
    while cp.has_section(f"stream{i}"):
        streams.append(parse_stream(cp, f"stream{i}"))
        i += 1
    return streams


def parse_classifier(cp: configparser.ConfigParser) -> ClassifierConfig:
    sec = "lstm_classifier"
    names = _get(cp, sec, "output_classnames")
    return ClassifierConfig(
        fusiontype=_get(cp, sec, "fusiontype", "sum"),
        weight_init=_get(cp, sec, "weight_init", "glorot"),
        use_peepholes=_getboolean(cp, sec, "use_peepholes"),
        windowsize=int(_get(cp, sec, "windowsize", 9)),
        output_classes=int(_get(cp, sec, "output_classes", 26)),
        output_classnames=names.split(",") if names else None,
        lstm_size=int(_get(cp, sec, "lstm_size", 250)),
        matlab_target_offset=_getboolean(cp, sec, "matlab_target_offset"),
        use_dropout=_getboolean(cp, sec, "use_dropout"),
        use_blstm=_getboolean(cp, sec, "use_blstm", default=True),
        lstm_remat=_getboolean(cp, sec, "lstm_remat"),
        lstm_residual_dtype=_get(cp, sec, "lstm_residual_dtype"),
    )


def parse_training(cp: configparser.ConfigParser) -> TrainingConfig:
    sec = "training"
    decay_start = _get(cp, sec, "decay_start")
    return TrainingConfig(
        validation_window=int(_get(cp, sec, "validation_window", 6)),
        num_epoch=int(_get(cp, sec, "num_epoch", 30)),
        learning_rate=float(_get(cp, sec, "learning_rate", 1e-4)),
        epochsize=int(_get(cp, sec, "epochsize", 120)),
        batchsize=int(_get(cp, sec, "batchsize", 30)),
        optimizer=_get(cp, sec, "optimizer", "adam"),
        decay_rate=float(_get(cp, sec, "decay_rate", 0.0)),
        decay_start=int(decay_start) if decay_start else None,
        train_subjects_file=_get(cp, sec, "train_subjects_file"),
        val_subjects_file=_get(cp, sec, "val_subjects_file"),
        test_subjects_file=_get(cp, sec, "test_subjects_file"),
        bucket_boundaries=_parse_buckets(_get(cp, sec, "bucket_boundaries")),
        matmul_dtype=_get(cp, sec, "matmul_dtype") or None,
        grad_accum_steps=int(_get(cp, sec, "grad_accum_steps", 1)),
    )


def parse_lr_map(cp: configparser.ConfigParser):
    """Optional ``[lr_map]`` section: parameter-path prefixes -> learning
    rates for ``optimizer = adam_vlr`` (the config-driven equivalent of
    runners/1stream_variable_lr.py's hardcoded per-layer map; prefixes
    match train/optimizers.generate_lr_map, e.g. ``output = 0.005`` or
    ``streams/s1/encoder = 0.0001``)."""
    if not cp.has_section("lr_map"):
        return None
    return {k: float(v) for k, v in cp.items("lr_map")}


def _parse_buckets(raw):
    if not raw:
        return None
    raw = raw.strip()
    if raw.lower() == "auto":
        return "auto"
    # searchsorted in BucketedDataset needs ascending unique boundaries
    return sorted(set(int(b) for b in raw.split(",")))


def parse_legacy_config(cp: configparser.ConfigParser) -> dict:
    """[data]/[models]/[training] schema (oulu/trimodal_with_val.py:274-287)."""
    out = {"data": dict(cp.items("data")) if cp.has_section("data") else {},
           "models": dict(cp.items("models")) if cp.has_section("models") else {},
           "training": dict(cp.items("training")) if cp.has_section("training") else {}}
    return out


def build_model_config(stream_cfgs, clf: "ClassifierConfig", encoders=None):
    """One shared (stream configs, classifier config) -> AdeNetConfig builder.

    The single authoritative model-selection logic for every CLI — nstream
    (training), demo, and confusion_visualizer previously re-implemented it
    and drifted (demo dropped w_init/use_peepholes, so a peephole-trained
    model rebuilt WITHOUT peepholes and its params failed to load).

    ``encoders[i]`` is None or ``(nonlinearities, shapes)`` for stream i;
    defaults to what the stream configs declare (fresh-init shapes — pass
    explicitly when pretrained weights determine them, as nstream does).
    """
    import dataclasses as _dc

    from ip_avsr_tpu.models import zoo

    if encoders is None:
        encoders = [(s.nonlinearities, s.shape) if s.shape and s.use_encoder
                    else None for s in stream_cfgs]
    dims = [s.input_dimensions for s in stream_cfgs]
    if len(stream_cfgs) == 1:
        if encoders[0] is not None:
            cfg = zoo.deltanet_majority_vote(
                dims[0], encoders[0][1], encoders[0][0],
                lstm_size=clf.lstm_size, window=clf.windowsize,
                output_classes=clf.output_classes, w_init=clf.weight_init,
                use_peepholes=clf.use_peepholes, use_blstm=clf.use_blstm)
        elif stream_cfgs[0].use_delta:
            # the reference's no-encoder 1-stream runner builds deltanet_v1
            # (deltas straight on the raw features —
            # runners/1stream_noencoder.py:234); previously this branch
            # silently built the delta-free lstm_classifier instead
            cfg = zoo.deltanet_v1(
                dims[0], lstm_size=clf.lstm_size, window=clf.windowsize,
                output_classes=clf.output_classes, w_init=clf.weight_init,
                use_peepholes=clf.use_peepholes, use_blstm=clf.use_blstm)
        else:
            cfg = zoo.lstm_classifier_majority_vote(
                dims[0], lstm_size=clf.lstm_size,
                output_classes=clf.output_classes, w_init=clf.weight_init,
                use_peepholes=clf.use_peepholes, use_blstm=clf.use_blstm)
        if not stream_cfgs[0].use_delta:
            # unimodal_nodelta / 1stream nodelta ablation
            streams = [_dc.replace(cfg.streams[0], use_delta=False)]
            cfg = _dc.replace(cfg, streams=streams)
    else:
        cfg = zoo.adenet_nstream(
            dims, encoders, lstm_size=clf.lstm_size, window=clf.windowsize,
            output_classes=clf.output_classes, fusiontype=clf.fusiontype,
            w_init=clf.weight_init, use_peepholes=clf.use_peepholes,
            stream_dropout=0.5 if clf.use_dropout else 0.0,
            stream_lstm_multiplier=2 if clf.use_dropout else 1,
            use_delta=[s.use_delta for s in stream_cfgs],
            # INI use_blstm previously reached only the 1-stream builders —
            # an N-stream `use_blstm = false` was silently ignored (caught
            # by the INI property's streaming leg)
            use_blstm=clf.use_blstm)
    if clf.lstm_remat:
        cfg = _dc.replace(cfg, lstm_remat=True)
    if clf.lstm_residual_dtype:
        cfg = _dc.replace(cfg, lstm_residual_dtype=clf.lstm_residual_dtype)
    return cfg


def synthetic_subject_split(subjects_vec):
    """The 60/20/20 unique-subject split every --synthetic CLI run uses
    (one implementation instead of five copies)."""
    import numpy as _np

    subj_ids = _np.unique(subjects_vec)
    n = len(subj_ids)
    train_ids = subj_ids[: max(1, int(0.6 * n))]
    val_ids = subj_ids[max(1, int(0.6 * n)) : max(2, int(0.8 * n))]
    test_ids = subj_ids[max(2, int(0.8 * n)) :]
    return train_ids, val_ids, test_ids
