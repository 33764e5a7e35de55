"""AVNet — composable audio/visual substream fusion network.

Parity: modelzoo/avnet.py:30-114.  Each substream is a pretrained dense
encoder (2000/1000/500/50, rectify x3 + linear) -> DeltaLayer -> LSTM
(peepholes on, orthogonal init); any number of substreams fuse via
sum/adasum/concat into a BLSTM aggregator with a per-timestep softmax — used
by cuave/audio_visual_runner.py:331-341 for audio+visual fusion.

This is a thin veneer over the AdeNet composer: the substream and fusion
structure map 1:1 onto StreamSpec/AdeNetConfig.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ip_avsr_tpu.models.adenet import AdeNetConfig, StreamSpec


def avnet_config(
    substream_dims: Sequence[int],
    substream_names: Optional[Sequence[str]] = None,
    encoder_shapes=(2000, 1000, 500, 50),
    encoder_nonlinearities=("rectify", "rectify", "rectify", "linear"),
    lstm_size: int = 250,
    window: int = 9,
    output_classes: int = 26,
    fusiontype: str = "concat",
    w_init: str = "ortho",
    use_peepholes: bool = True,
    no_encoder_for: Sequence[str] = (),
) -> AdeNetConfig:
    """Build an AVNet config.  ``no_encoder_for`` names substreams (e.g. a
    precomputed MFCC audio stream) that skip the dense encoder."""
    names = substream_names or [f"s{i + 1}" for i in range(len(substream_dims))]
    streams = []
    for dim, name in zip(substream_dims, names):
        if name in no_encoder_for:
            streams.append(StreamSpec(input_dim=dim, name=name))
        else:
            streams.append(
                StreamSpec(
                    input_dim=dim,
                    name=name,
                    encoder_shapes=tuple(encoder_shapes),
                    encoder_nonlinearities=tuple(encoder_nonlinearities),
                )
            )
    return AdeNetConfig(
        streams=streams,
        output_classes=output_classes,
        lstm_size=lstm_size,
        window=window,
        fusiontype=fusiontype,
        agg_layers=1,
        agg_bidirectional=True,
        output_mode="per_step",
        w_init=w_init,
        use_peepholes=use_peepholes,
    )
