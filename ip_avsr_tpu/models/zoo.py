"""Model zoo — reference-named AdeNet configurations.

Each builder returns an :class:`~ip_avsr_tpu.models.adenet.AdeNetConfig`
mirroring the corresponding ``modelzoo/*.py`` graph builder in the reference
(citations inline).  Instantiate parameters with
``adenet.init_adenet_params(key, cfg, pretrained_encoders=...)`` and run with
``adenet.adenet_forward``.

Conventions shared with the reference: LSTM size default 250; softmax heads
emit probabilities; "per_step" heads produce (B, T, C) for the temporal
softmax loss + majority-vote eval; "last_step" heads slice the final timestep
(utterance-level classification).
"""

from __future__ import annotations

from typing import Optional, Sequence

from ip_avsr_tpu.models.adenet import AdeNetConfig, StreamSpec

SIGMOID_ENCODER = (["sigmoid", "sigmoid", "sigmoid", "linear"], [2000, 1000, 500, 50])
RELU_ENCODER = (["rectify", "rectify", "rectify", "linear"], [2000, 1000, 500, 50])


def _encoder_stream(input_dim, name, shapes=None, nonlinearities=None, **kw) -> StreamSpec:
    nl, sh = SIGMOID_ENCODER
    return StreamSpec(
        input_dim=input_dim,
        name=name,
        encoder_shapes=tuple(shapes or sh),
        encoder_nonlinearities=tuple(nonlinearities or nl),
        **kw,
    )


# ---------------------------------------------------------------------------
# Single-stream models
# ---------------------------------------------------------------------------

def deltanet(input_dim, encoder_shapes, encoder_nonlinearities, lstm_size=250,
             window=9, output_classes=26, w_init="glorot", use_peepholes=False) -> AdeNetConfig:
    """Encoder + delta + BLSTM + last-step slice classifier
    (modelzoo/deltanet.py:12-77)."""
    return AdeNetConfig(
        streams=[_encoder_stream(input_dim, "s1", encoder_shapes, encoder_nonlinearities,
                                 use_lstm=False)],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype="sum", agg_layers=1, agg_bidirectional=True,
        output_mode="last_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def deltanet_v1(input_dim, lstm_size=250, window=9, output_classes=26,
                w_init="glorot", use_peepholes=False, use_blstm=True) -> AdeNetConfig:
    """No-encoder DeltaLayer directly on input, per-timestep softmax
    (modelzoo/deltanet_v1.py:8-42)."""
    return AdeNetConfig(
        streams=[StreamSpec(input_dim=input_dim, name="s1", use_lstm=False)],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        agg_layers=1, agg_bidirectional=use_blstm,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def deltanet_majority_vote(input_dim, encoder_shapes, encoder_nonlinearities,
                           lstm_size=250, window=9, output_classes=26,
                           w_init="glorot", use_peepholes=False,
                           use_blstm=True) -> AdeNetConfig:
    """Encoder + delta + (B)LSTM + per-timestep softmax for majority voting
    (modelzoo/deltanet_majority_vote.py:14-66)."""
    return AdeNetConfig(
        streams=[_encoder_stream(input_dim, "s1", encoder_shapes, encoder_nonlinearities,
                                 use_lstm=False)],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        agg_layers=1, agg_bidirectional=use_blstm,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def lstm_classifier_baseline(input_dim, lstm_size=250, output_classes=26,
                             w_init="glorot", use_peepholes=False) -> AdeNetConfig:
    """Raw-feature BLSTM + last-step classifier
    (modelzoo/lstm_classifier_baseline.py:56-82)."""
    return AdeNetConfig(
        streams=[StreamSpec(input_dim=input_dim, name="s1", use_delta=False, use_lstm=False)],
        output_classes=output_classes, lstm_size=lstm_size,
        agg_layers=1, agg_bidirectional=True, output_mode="last_step",
        w_init=w_init, use_peepholes=use_peepholes,
    )


def lstm_classifier_majority_vote(input_dim, lstm_size=250, output_classes=26,
                                  w_init="glorot", use_peepholes=False,
                                  use_blstm=True) -> AdeNetConfig:
    """Raw-feature (B)LSTM + per-timestep softmax
    (modelzoo/lstm_classifier_majority_vote.py:10-45)."""
    return AdeNetConfig(
        streams=[StreamSpec(input_dim=input_dim, name="s1", use_delta=False, use_lstm=False)],
        output_classes=output_classes, lstm_size=lstm_size,
        agg_layers=1, agg_bidirectional=use_blstm, output_mode="per_step",
        w_init=w_init, use_peepholes=use_peepholes,
    )


def baseline_end2end(input_dim, encoder_shapes, encoder_nonlinearities, lstm_size=250,
                     output_classes=26, w_init="glorot", use_peepholes=False) -> AdeNetConfig:
    """Encoder + BLSTM (no delta) + last-step classifier
    (modelzoo/baseline_end2end.py:64-120)."""
    return AdeNetConfig(
        streams=[_encoder_stream(input_dim, "s1", encoder_shapes, encoder_nonlinearities,
                                 use_delta=False, use_lstm=False)],
        output_classes=output_classes, lstm_size=lstm_size,
        agg_layers=1, agg_bidirectional=True, output_mode="last_step",
        w_init=w_init, use_peepholes=use_peepholes,
    )


# ---------------------------------------------------------------------------
# Bimodal raw + DCT (the adenet_v1/v2/v4 family)
# ---------------------------------------------------------------------------

def adenet_v1(input_dim, dct_dim, lstm_size=250, window=9, output_classes=26) -> AdeNetConfig:
    """Raw encoder (sigmoid, 2000/1000/500/50) + batch norm -> delta, feature
    concat with DCT, 2-layer BLSTM stack (sizes lstm, 2*lstm), slice classifier
    (modelzoo/adenet_v1.py:47-109)."""
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", use_batchnorm=True, use_lstm=False),
            StreamSpec(input_dim=dct_dim, name="dct", use_delta=False, use_lstm=False),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype="concat", agg_layers=2, agg_sizes=(lstm_size, lstm_size * 2),
        agg_bidirectional=True, output_mode="last_step", w_init="glorot",
    )


def adenet_v1_1(input_dim, dct_dim, lstm_size=250, window=9, output_classes=26) -> AdeNetConfig:
    """adenet_v1 + dropout before both BLSTMs, both sized 2*lstm
    (modelzoo/adenet_v1_1.py:48-115)."""
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", use_batchnorm=True, use_lstm=False),
            StreamSpec(input_dim=dct_dim, name="dct", use_delta=False, use_lstm=False),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype="concat", agg_layers=2, agg_sizes=(lstm_size * 2, lstm_size * 2),
        agg_dropout=0.5, agg_bidirectional=True, output_mode="last_step", w_init="glorot",
    )


def adenet_v2(input_dim, dct_dim, encoder_shapes=None, encoder_nonlinearities=None,
              lstm_size=250, window=9, output_classes=26, fusiontype="sum",
              w_init="glorot", use_peepholes=False) -> AdeNetConfig:
    """Canonical bimodal raw+DCT: encoder -> delta, delta(DCT), per-stream
    LSTMs, fusion, BLSTM aggregator, per-timestep softmax
    (modelzoo/adenet_v2.py:12-94)."""
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", encoder_shapes, encoder_nonlinearities),
            StreamSpec(input_dim=dct_dim, name="dct"),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype=fusiontype, agg_layers=1, agg_bidirectional=True,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def adenet_v2_1(input_dim, diff_dim, lstm_size=250, window=9, output_classes=26,
                fusiontype="sum", w_init="glorot", use_peepholes=True) -> AdeNetConfig:
    """Raw + diff-image with two ReLU encoders (modelzoo/adenet_v2_1.py:40-173)."""
    nl, sh = RELU_ENCODER
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", sh, nl),
            _encoder_stream(diff_dim, "diff", sh, nl),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype=fusiontype, agg_layers=1, agg_bidirectional=True,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def adenet_v2_2(s1_dim, s2_dim, s1_encoder=None, s2_encoder=None, lstm_size=250,
                window=9, output_classes=26, fusiontype="sum", w_init="glorot",
                use_peepholes=True) -> AdeNetConfig:
    """Generic 2-stream with two encoder tuples (modelzoo/adenet_v2_2.py:40-170)."""
    s1_nl, s1_sh = s1_encoder or SIGMOID_ENCODER
    s2_nl, s2_sh = s2_encoder or SIGMOID_ENCODER
    return AdeNetConfig(
        streams=[
            _encoder_stream(s1_dim, "s1", s1_sh, s1_nl),
            _encoder_stream(s2_dim, "s2", s2_sh, s2_nl),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype=fusiontype, agg_layers=1, agg_bidirectional=True,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def adenet_v2_3(input_dim, dct_dim, encoder_shapes=None, encoder_nonlinearities=None,
                lstm_size=250, window=9, output_classes=26, fusiontype="sum",
                w_init="glorot", use_peepholes=True) -> AdeNetConfig:
    """adenet_v2 with a unidirectional LSTM aggregator
    (modelzoo/adenet_v2_3.py:64-158)."""
    cfg = adenet_v2(input_dim, dct_dim, encoder_shapes, encoder_nonlinearities,
                    lstm_size, window, output_classes, fusiontype, w_init, use_peepholes)
    return AdeNetConfig(**{**cfg.__dict__, "agg_bidirectional": False})


def adenet_v2_4(input_dim, diff_dim, lstm_size=250, window=9, output_classes=26,
                fusiontype="sum", w_init="glorot", use_peepholes=True) -> AdeNetConfig:
    """Raw + diff with unidirectional aggregator (modelzoo/adenet_v2_4.py:35-155)."""
    cfg = adenet_v2_1(input_dim, diff_dim, lstm_size, window, output_classes,
                      fusiontype, w_init, use_peepholes)
    return AdeNetConfig(**{**cfg.__dict__, "agg_bidirectional": False})


def adenet_v2_nodelta(s1_dim, s2_dim, s1_encoder=None, s2_encoder=None, lstm_size=250,
                      output_classes=26, fusiontype="sum", w_init="glorot",
                      use_peepholes=True) -> AdeNetConfig:
    """2-stream ablation without DeltaLayers (modelzoo/adenet_v2_nodelta.py:43-152)."""
    s1_nl, s1_sh = s1_encoder or SIGMOID_ENCODER
    s2_nl, s2_sh = s2_encoder or SIGMOID_ENCODER
    return AdeNetConfig(
        streams=[
            _encoder_stream(s1_dim, "s1", s1_sh, s1_nl, use_delta=False),
            _encoder_stream(s2_dim, "s2", s2_sh, s2_nl, use_delta=False),
        ],
        output_classes=output_classes, lstm_size=lstm_size,
        fusiontype=fusiontype, agg_layers=1, agg_bidirectional=True,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )


def adenet_v4(input_dim, dct_dim, encoder_shapes=None, encoder_nonlinearities=None,
              lstm_size=250, window=9, output_classes=26, fusiontype="sum",
              w_init="glorot", use_peepholes=False) -> AdeNetConfig:
    """Raw+DCT dropout variant: stream LSTMs sized 2*lstm with input dropout
    (0.5 delta / 0.2 DCT), unidirectional aggregator 2*lstm after dropout,
    slice classifier (modelzoo/adenet_v4.py:49-141)."""
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", encoder_shapes, encoder_nonlinearities,
                            dropout=0.5, lstm_size=lstm_size * 2),
            StreamSpec(input_dim=dct_dim, name="dct", use_delta=False, dropout=0.2,
                       lstm_size=lstm_size * 2),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype=fusiontype, agg_layers=1, agg_bidirectional=False,
        agg_size=lstm_size * 2, agg_dropout=0.5,
        output_mode="last_step", w_init=w_init, use_peepholes=use_peepholes,
    )


# ---------------------------------------------------------------------------
# Trimodal (adenet_v3 / v5) and bimodal raw+diff (v6)
# ---------------------------------------------------------------------------

def adenet_v3(input_dim, dct_dim, diff_dim, lstm_size=250, window=9,
              output_classes=10, fusiontype="sum") -> AdeNetConfig:
    """North-star trimodal raw+DCT+diff: two sigmoid encoders, dropout on each
    delta stream (0.5/0.2/0.5), stream LSTMs sized lstm/(1-0.5)=2*lstm,
    fusion, dropout + BLSTM(2*lstm) aggregator, slice classifier
    (modelzoo/adenet_v3.py:64-188). Orthogonal gate init (:71-79)."""
    big = int(lstm_size / (1 - 0.5))
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", dropout=0.5, lstm_size=big),
            StreamSpec(input_dim=dct_dim, name="dct", use_delta=False, dropout=0.2,
                       lstm_size=big),
            _encoder_stream(diff_dim, "diff", dropout=0.5, lstm_size=big),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype=fusiontype, agg_layers=1, agg_bidirectional=True,
        agg_size=lstm_size * 2, agg_dropout=0.5,
        output_mode="last_step", w_init="ortho",
    )


def adenet_v5(input_dim, dct_dim, diff_dim, lstm_size=250, window=9,
              output_classes=10, use_adascale=False) -> AdeNetConfig:
    """Trimodal like v3 with optional adaptive-sum fusion
    (modelzoo/adenet_v5.py:66-186)."""
    cfg = adenet_v3(input_dim, dct_dim, diff_dim, lstm_size, window, output_classes,
                    fusiontype="adasum" if use_adascale else "sum")
    return cfg


def adenet_v6(input_dim, diff_dim, lstm_size=250, window=9, output_classes=10,
              use_adascale=False) -> AdeNetConfig:
    """Bimodal raw+diff (no DCT) with dropout on both deltas
    (modelzoo/adenet_v6.py:66-177)."""
    big = int(lstm_size / (1 - 0.5))
    return AdeNetConfig(
        streams=[
            _encoder_stream(input_dim, "raw", dropout=0.5, lstm_size=big),
            _encoder_stream(diff_dim, "diff", dropout=0.5, lstm_size=big),
        ],
        output_classes=output_classes, lstm_size=lstm_size, window=window,
        fusiontype="adasum" if use_adascale else "sum",
        agg_layers=1, agg_bidirectional=True, agg_size=lstm_size * 2,
        agg_dropout=0.5, output_mode="last_step", w_init="ortho",
    )


# ---------------------------------------------------------------------------
# Generic N-stream (adenet_2stream / 3stream / 3stream_dct / 3stream_dropout /
# 4stream) and avnet substream composition
# ---------------------------------------------------------------------------

def adenet_nstream(
    input_dims: Sequence[int],
    encoders: Sequence[Optional[tuple]],
    lstm_size=250,
    window=9,
    output_classes=26,
    fusiontype="sum",
    w_init="glorot",
    use_peepholes=True,
    stream_dropout=0.0,
    stream_lstm_multiplier=1,
    use_delta=True,
    use_blstm=True,
) -> AdeNetConfig:
    """Generic N-stream AdeNet (modelzoo/adenet_{2,3,4}stream.py,
    adenet_3stream_dct.py — pass encoders[i]=None for encoder-less streams —
    and adenet_3stream_dropout.py via stream_dropout=0.5 +
    stream_lstm_multiplier=2).  ``use_delta`` may be a bool or a per-stream
    list (adenet_v2_nodelta-style ablations).  Per-timestep softmax output."""
    if isinstance(use_delta, bool):
        use_delta = [use_delta] * len(input_dims)
    streams = []
    for i, (dim, enc) in enumerate(zip(input_dims, encoders)):
        kw = dict(dropout=stream_dropout, use_delta=bool(use_delta[i]),
                  lstm_size=lstm_size * stream_lstm_multiplier if stream_lstm_multiplier != 1 else None)
        if enc is not None:
            nl, sh = enc
            streams.append(_encoder_stream(dim, f"s{i + 1}", sh, nl, **kw))
        else:
            streams.append(StreamSpec(input_dim=dim, name=f"s{i + 1}", **kw))
    return AdeNetConfig(
        streams=streams, output_classes=output_classes, lstm_size=lstm_size,
        window=window, fusiontype=fusiontype, agg_layers=1,
        agg_bidirectional=use_blstm,
        output_mode="per_step", w_init=w_init, use_peepholes=use_peepholes,
    )
