"""Shared test-size zoo case definitions.

Used by the cross-implementation parity sweep (test_reference_parity.py),
the committed golden fixtures (test_goldens.py / scripts/make_goldens.py),
and anything else that needs one instance of every zoo topology.
"""

import dataclasses

from ip_avsr_tpu.models import adenet, avnet, zoo

ENC_NL = ("sigmoid", "sigmoid", "sigmoid", "linear")
ENC_SH = (24, 16, 12, 6)
ENC = (ENC_NL, ENC_SH)
K = dict(lstm_size=6, window=3, output_classes=7)


def _shrink(cfg):
    """Swap any fixed-size (2000/1000/500/50) encoder for the test-size one,
    preserving the builder's own nonlinearity choice."""
    streams = []
    for s in cfg.streams:
        if s.encoder_shapes and max(s.encoder_shapes) > 64:
            streams.append(dataclasses.replace(s, encoder_shapes=ENC_SH))
        else:
            streams.append(s)
    return adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})


ZOO_CASES = {
    "deltanet": lambda: zoo.deltanet(20, ENC_SH, ENC_NL, **K),
    "deltanet_v1": lambda: zoo.deltanet_v1(20, **K),
    "deltanet_v1_unidir": lambda: zoo.deltanet_v1(20, use_blstm=False, **K),
    "deltanet_majority_vote": lambda: zoo.deltanet_majority_vote(20, ENC_SH, ENC_NL, **K),
    "deltanet_majority_vote_peep": lambda: zoo.deltanet_majority_vote(
        20, ENC_SH, ENC_NL, use_peepholes=True, **K),
    "lstm_classifier_baseline": lambda: zoo.lstm_classifier_baseline(
        20, lstm_size=6, output_classes=7),
    "lstm_classifier_majority_vote": lambda: zoo.lstm_classifier_majority_vote(
        20, lstm_size=6, output_classes=7),
    "baseline_end2end": lambda: zoo.baseline_end2end(
        20, ENC_SH, ENC_NL, lstm_size=6, output_classes=7),
    "adenet_v1": lambda: _shrink(zoo.adenet_v1(20, 8, **K)),
    "adenet_v1_1": lambda: _shrink(zoo.adenet_v1_1(20, 8, **K)),
    "adenet_v2": lambda: zoo.adenet_v2(20, 8, ENC_SH, ENC_NL, **K),
    "adenet_v2_concat": lambda: zoo.adenet_v2(20, 8, ENC_SH, ENC_NL,
                                              fusiontype="concat", **K),
    "adenet_v2_1": lambda: _shrink(zoo.adenet_v2_1(20, 20, **K)),
    "adenet_v2_2": lambda: zoo.adenet_v2_2(20, 14, ENC, ENC, **K),
    "adenet_v2_3": lambda: zoo.adenet_v2_3(20, 8, ENC_SH, ENC_NL, **K),
    "adenet_v2_4": lambda: _shrink(zoo.adenet_v2_4(20, 20, **K)),
    "adenet_v2_nodelta": lambda: zoo.adenet_v2_nodelta(
        20, 14, ENC, ENC, lstm_size=6, output_classes=7),
    "adenet_v3": lambda: _shrink(zoo.adenet_v3(20, 8, 20, **K)),
    "adenet_v4": lambda: zoo.adenet_v4(20, 8, ENC_SH, ENC_NL, **K),
    "adenet_v5_adascale": lambda: _shrink(zoo.adenet_v5(20, 8, 20,
                                                        use_adascale=True, **K)),
    "adenet_v6": lambda: _shrink(zoo.adenet_v6(20, 20, **K)),
    "adenet_v6_adascale": lambda: _shrink(zoo.adenet_v6(20, 20,
                                                        use_adascale=True, **K)),
    "adenet_nstream3": lambda: zoo.adenet_nstream(
        [20, 8, 14], [ENC, None, ENC], **K),
    "adenet_nstream3_dropout": lambda: zoo.adenet_nstream(
        [20, 8, 14], [ENC, None, ENC], stream_dropout=0.5,
        stream_lstm_multiplier=2, **K),
    "adenet_nstream_nodelta": lambda: zoo.adenet_nstream(
        [20, 8], [ENC, None], use_delta=[True, False], **K),
    "avnet": lambda: avnet.avnet_config(
        [20, 14], encoder_shapes=ENC_SH, encoder_nonlinearities=ENC_NL,
        no_encoder_for=["s2"], **K),
}
