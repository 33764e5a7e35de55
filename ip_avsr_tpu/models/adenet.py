"""The AdeNet composer — one configurable multi-stream architecture covering
the reference's entire model zoo.

Shared skeleton (SURVEY.md §2.2; modelzoo/adenet_v2.py:30-94,
modelzoo/adenet_3stream.py:166-263): per stream, reshape (B,T,D)->(B*T,D) ->
optional pretrained dense encoder [-> optional batch norm] -> reshape back ->
optional DeltaLayer(win) (output dim x3) -> optional dropout -> optional
stream LSTM; then fusion {sum|adasum|concat}; then an aggregator of zero or
more (bi)directional LSTM layers (forward+backward summed), each optionally
preceded by dropout; and either a per-timestep softmax over all frames
(majority-vote models) or a last-timestep slice classifier.

Special cases this expresses:
  * 1-stream models whose only LSTM is the aggregator (deltanet*,
    lstm_classifier_*: streams with ``use_lstm=False``)
  * adenet_v1/v1_1's feature-level concat into a 2-layer BLSTM stack
    (``agg_layers=2``) with batch-normalized encoder (``use_batchnorm``)
  * unidirectional aggregators (adenet_v2_3/v2_4: ``agg_bidirectional=False``)
  * nodelta ablations (``use_delta=False``)

Everything is a pure function over a parameter pytree; dropout takes an
explicit rng and a ``train`` flag (Lasagne deterministic=False/True).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ip_avsr_tpu.ops import fusion as fusion_ops
from ip_avsr_tpu.ops import initializers as inits
from ip_avsr_tpu.ops import lstm as lstm_ops
from ip_avsr_tpu.ops import normalization as norm_ops
from ip_avsr_tpu.ops.delta import delta_layer
from ip_avsr_tpu.models import encoder as encoder_mod


@dataclasses.dataclass(frozen=True)
class StreamSpec:
    """Configuration of one input stream."""

    input_dim: int
    name: str = "stream"
    # encoder: None, or a list of layer sizes (e.g. [2000, 1000, 500, 50]) with
    # matching nonlinearity names (e.g. ['sigmoid']*3 + ['linear'])
    encoder_shapes: Optional[Sequence[int]] = None
    encoder_nonlinearities: Optional[Sequence] = None
    use_batchnorm: bool = False  # BN on encoder output (adenet_v1.py:82)
    use_delta: bool = True
    dropout: float = 0.0  # applied to the LSTM input (post-delta), train only
    use_lstm: bool = True  # False: stream contributes its feature sequence
    lstm_size: Optional[int] = None  # overrides model lstm_size for this stream

    def encoded_dim(self) -> int:
        d = self.encoder_shapes[-1] if self.encoder_shapes else self.input_dim
        return int(d)

    def feature_dim(self) -> int:
        return self.encoded_dim() * (3 if self.use_delta else 1)


@dataclasses.dataclass(frozen=True)
class AdeNetConfig:
    streams: Sequence[StreamSpec]
    output_classes: int
    lstm_size: int = 250
    window: int = 9
    fusiontype: str = "sum"  # sum | adasum | concat
    agg_layers: int = 1  # number of aggregator (B)LSTM layers (0 = none)
    agg_bidirectional: bool = True
    agg_size: Optional[int] = None  # default: lstm_size
    agg_sizes: Optional[Sequence[int]] = None  # per-layer override (adenet_v1)
    agg_dropout: float = 0.0  # applied before each aggregator layer
    output_mode: str = "per_step"  # per_step | last_step
    use_peepholes: bool = False
    w_init: str = "glorot"
    matmul_dtype: Optional[str] = None  # e.g. "bfloat16" for MXU throughput
    # Run independent LSTMs (parallel streams; BLSTM fwd/bwd halves) as one
    # grouped scan — T sequential steps instead of G*T (ops/lstm.py
    # lstm_forward_grouped). Numerically identical. Measured on v5e: helps
    # small/latency-bound INFERENCE (B<=32, batch-1 serving), HURTS
    # throughput at large batch (B>=128: the per-step matmuls already
    # saturate the MXU and the group stacking/transposes add HBM traffic),
    # and hurts TRAINING at every measured batch (the transposes are paid
    # again in the backward pass — matrix in docs/DESIGN.md). Default off;
    # enable for low-latency inference only.  Under training it is ignored
    # (with a warning) when lstm_remat / lstm_residual_dtype is set: the
    # grouped core has no residual machinery and the memory levers win.
    fuse_scans: bool = False
    # LSTM recurrence backend for inference (train=False): "xla" (lax.scan)
    # or "pallas" (ops/pallas/lstm_kernel.py: weights VMEM-resident, fused
    # gate math; bit-exact vs the scan and ~18% faster on v5e at B=1024).
    # Training goes through ops/lstm's custom-VJP core, which dispatches its
    # own Pallas forward/backward kernels when shapes fit VMEM regardless of
    # this flag. Peephole models (the reference default) have their own
    # kernel variants on every path.
    lstm_impl: str = "xla"
    # Long-sequence memory lever: drop the (T, B, 4H) gate pre-activations
    # from every LSTM's training residuals and rebuild them at the start of
    # that layer's backward with two large matmuls (ops/lstm.lstm_forward
    # remat) — ~3x less residual memory per recurrent layer, at the cost of
    # one transient recompute per layer.  Pair with sequence_parallel for
    # long feature streams.  Covers peephole layers too (the rebuild needs
    # only x and hids_prev; the peephole terms come from the saved cell
    # residuals); no effect at inference.
    lstm_remat: bool = False
    # HBM-bandwidth lever for the (bandwidth-bound) backward: store each
    # LSTM's per-step training residual stacks (gates, hids, cells) in this
    # dtype (e.g. "bfloat16"), halving residual read/write traffic; compute
    # and gradients stay f32 (ops/lstm.lstm_forward residual_dtype).
    # Gradients are perturbed at ~bf16 epsilon — tested for gradient
    # tolerance and optimizer-trajectory argmax stability.  None = f32.
    # Capacity note (compiler-measured, docs/DESIGN.md): peak temp memory
    # is dominated by transient f32 buffers this flag doesn't touch, so
    # alone it buys only ~0-5% peak; compose with lstm_remat (~18-24%
    # together) or sequence_parallel for real long-T capacity.
    lstm_residual_dtype: Optional[str] = None

    def stream_lstm_size(self, spec: StreamSpec) -> int:
        return int(spec.lstm_size or self.lstm_size)

    def stream_out_dim(self, spec: StreamSpec) -> int:
        return self.stream_lstm_size(spec) if spec.use_lstm else spec.feature_dim()

    def fused_dim(self) -> int:
        return fusion_ops.fused_dim(
            [self.stream_out_dim(s) for s in self.streams], self.fusiontype
        )

    def aggregator_sizes(self) -> list:
        if self.agg_sizes is not None:
            assert len(self.agg_sizes) == self.agg_layers
            return [int(s) for s in self.agg_sizes]
        return [int(self.agg_size or self.lstm_size)] * self.agg_layers

    def classifier_in_dim(self) -> int:
        sizes = self.aggregator_sizes()
        return sizes[-1] if sizes else self.fused_dim()

    def _matmul_dtype(self):
        return jnp.dtype(self.matmul_dtype) if self.matmul_dtype else None


def init_adenet_params(
    key,
    config: AdeNetConfig,
    pretrained_encoders: Optional[Sequence] = None,
    pretrained_stream_lstms: Optional[Sequence] = None,
) -> dict:
    """Build the parameter pytree.

    ``pretrained_encoders[i]`` is None or ``(weights, biases)`` for stream i
    (the "dbn tuple" content); ``pretrained_stream_lstms[i]`` is None or an
    LSTM param dict (e.g. from io.matio.lstm_params_from_mat_dict) matching
    adenet_2stream/3stream's create_pretrained_model and avnet substreams
    (modelzoo/avnet.py:30-71).
    """
    w_init = inits.select_weight_init(config.w_init)
    n = len(config.streams)
    keys = jax.random.split(key, 2 * n + 2 * max(config.agg_layers, 1) + 1)
    params: dict = {"streams": {}}

    for i, spec in enumerate(config.streams):
        sp: dict = {}
        if spec.encoder_shapes:
            pre = pretrained_encoders[i] if pretrained_encoders else None
            if pre is not None:
                weights, biases = pre[0], pre[1]
                sp["encoder"] = encoder_mod.pretrained_encoder_params(weights, biases)
            else:
                sp["encoder"] = encoder_mod.init_encoder_params(
                    keys[2 * i], spec.input_dim, spec.encoder_shapes, w_init
                )
        if spec.use_batchnorm:
            bn_params, bn_state = norm_ops.init_batch_norm(spec.encoded_dim())
            sp["bn"] = bn_params
            sp["bn_state"] = bn_state
        if spec.use_lstm:
            pre_lstm = pretrained_stream_lstms[i] if pretrained_stream_lstms else None
            H = config.stream_lstm_size(spec)
            if pre_lstm is not None:
                sp["lstm"] = dict(pre_lstm)
                sp["lstm"].setdefault("cell_init", jnp.zeros((1, H)))
                sp["lstm"].setdefault("hid_init", jnp.zeros((1, H)))
            else:
                sp["lstm"] = lstm_ops.init_lstm_params(
                    keys[2 * i + 1], spec.feature_dim(), H, w_init, config.use_peepholes
                )
        params["streams"][spec.name] = sp

    if config.fusiontype == "adasum":
        params["adasum"] = fusion_ops.init_adasum_params(n)

    in_dim = config.fused_dim()
    params["aggregator"] = []
    for layer, agg in enumerate(config.aggregator_sizes()):
        k = keys[2 * n + 2 * layer]
        if config.agg_bidirectional:
            fwd, bwd = lstm_ops.init_blstm_params(k, in_dim, agg, w_init, config.use_peepholes)
            params["aggregator"].append({"fwd": fwd, "bwd": bwd})
        else:
            params["aggregator"].append(
                {"fwd": lstm_ops.init_lstm_params(k, in_dim, agg, w_init, config.use_peepholes)}
            )
        in_dim = agg

    params["output"] = {
        "w": w_init(keys[-1], (config.classifier_in_dim(), config.output_classes)),
        "b": jnp.zeros((config.output_classes,)),
    }
    return params


def _dropout(x, rate, rng, train):
    """Lasagne DropoutLayer semantics: train-time mask with 1/(1-p) rescale."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def adenet_forward(
    params: dict,
    config: AdeNetConfig,
    inputs: Sequence[jnp.ndarray],
    mask: jnp.ndarray,
    window: Optional[int] = None,
    train: bool = False,
    dropout_rng=None,
    return_aux: bool = False,
    bn_axis=None,
):
    """Run the model.  inputs[i] is (B, T, D_i); mask is (B, T).

    Returns (B, T, C) per-timestep softmax probabilities in "per_step" mode or
    (B, C) softmax in "last_step" mode — probabilities, not logits, because
    the reference's losses consume the softmax layer's output (see
    ops/losses.temporal_softmax_loss docstring).

    With ``return_aux=True`` returns (out, aux) where aux carries batch-norm
    running-statistic updates (aux["bn_state"][stream_name]) to be merged into
    the params by the trainer.  ``bn_axis`` names the mesh axis (or axes) to
    psum batch-norm training statistics over when this forward runs inside a
    ``shard_map`` body (ops/normalization.batch_norm_forward).
    """
    window = config.window if window is None else window
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(dropout_rng, len(config.streams) + max(config.agg_layers, 1))
    stream_feats, aux = stream_prefix(params, config, inputs, train,
                                      rngs[: len(config.streams)], window=window,
                                      bn_axis=bn_axis)
    out = head_forward(params, config, stream_feats, mask, train,
                       rngs[len(config.streams):])
    if return_aux:
        return out, aux
    return out


def stream_prefix(params, config: AdeNetConfig, inputs, train, rngs,
                  window=None, delta_fn=None, bn_axis=None):
    """The frame-parallel part of the forward: per stream, encoder -> [BN] ->
    delta -> dropout.  Every op here is local to a frame except the delta
    window — which is why this prefix is the sequence-parallel region
    (parallel/sequence.py swaps ``delta_fn`` for a halo-exchange variant).

    Returns (stream_feats, aux) with aux carrying BN running-stat updates.
    """
    window = config.window if window is None else window
    mmdtype = config._matmul_dtype()
    B, T = inputs[0].shape[0], inputs[0].shape[1]
    if delta_fn is None:
        # the Pallas kernel carries a custom VJP (the FIR is linear, so
        # backward is its fixed transpose via the XLA formulation), so the
        # same heuristic dispatch applies under training and inference
        delta_fn = lambda x: delta_layer(x, window)  # noqa: E731
    aux = {"bn_state": {}}

    stream_feats = []
    for i, spec in enumerate(config.streams):
        sp = params["streams"][spec.name]
        x = inputs[i]
        if spec.encoder_shapes:
            flat = x.reshape(B * T, spec.input_dim)
            enc = encoder_mod.encoder_forward(
                sp["encoder"], flat, spec.encoder_nonlinearities, matmul_dtype=mmdtype
            )
            x = enc.reshape(B, T, -1)
        if spec.use_batchnorm:
            x, new_bn = norm_ops.batch_norm_forward(sp["bn"], sp["bn_state"], x,
                                                    train, axis_name=bn_axis)
            aux["bn_state"][spec.name] = new_bn
        if spec.use_delta:
            x = delta_fn(x)
        x = _dropout(x, spec.dropout, rngs[i], train)
        stream_feats.append(x)
    return stream_feats, aux


def head_forward(params, config: AdeNetConfig, stream_feats, mask, train,
                 agg_rngs):
    """The recurrent part of the forward: per-stream LSTMs -> fusion ->
    aggregator (B)LSTM stack -> classifier head.  Sequential in time, so it
    runs data-parallel (batch-sharded) even when the prefix was
    sequence-parallel."""
    mmdtype = config._matmul_dtype()
    B, T = stream_feats[0].shape[0], stream_feats[0].shape[1]

    def run_lstm(p, feats, m, backwards=False):
        if config.lstm_impl == "pallas" and not train:
            from ip_avsr_tpu.ops.pallas import dispatch, lstm_kernel

            # An explicit lstm_impl="pallas" must still respect the
            # environment gates the auto heuristics use: under
            # dispatch.disabled() (export traces, non-default-device
            # compiles) or a multi-device GSPMD trace, an opaque
            # pallas_call cannot lower/partition — fall back to the XLA
            # scan instead of baking in a kernel that fails downstream
            # (r5 review: the forced path bypassed every gate).
            if dispatch.auto_dispatch_ok():
                return lstm_kernel.lstm_forward_pallas(
                    p, feats, m, backwards=backwards, matmul_dtype=mmdtype)
            import warnings

            warnings.warn(
                "lstm_impl='pallas' requested but the trace context cannot "
                "take a Pallas kernel (dispatch disabled, non-TPU backend, "
                "or multi-device global shapes); using the XLA scan",
                stacklevel=2)
        return lstm_ops.lstm_forward(p, feats, m, backwards=backwards,
                                     matmul_dtype=mmdtype,
                                     remat=config.lstm_remat,
                                     residual_dtype=config.lstm_residual_dtype)

    # per-stream LSTMs — grouped into one scan when homogeneous.  The
    # grouped core has no remat/residual-dtype machinery, so under training
    # those residual levers take precedence over fuse_scans (silently
    # honoring fuse_scans would drop the promised memory savings — the
    # user sized their batch to them); warn once per trace.
    fuse_ok = config.fuse_scans and not (
        train and (config.lstm_remat or config.lstm_residual_dtype))
    if config.fuse_scans and not fuse_ok:
        import warnings

        warnings.warn(
            "fuse_scans is ignored under training when lstm_remat or "
            "lstm_residual_dtype is set (the grouped scan stores full-f32 "
            "residuals); running ungrouped LSTMs so the residual levers "
            "apply", stacklevel=2)
    lstm_idx = [i for i, s in enumerate(config.streams) if s.use_lstm]
    lstm_params = [params["streams"][config.streams[i].name]["lstm"] for i in lstm_idx]
    stream_outs = list(stream_feats)
    if lstm_idx:
        if fuse_ok and lstm_ops.can_group_lstms(lstm_params):
            grouped = lstm_ops.lstm_forward_grouped(
                lstm_params, [stream_feats[i] for i in lstm_idx], mask,
                [False] * len(lstm_idx), matmul_dtype=mmdtype)
            for i, out in zip(lstm_idx, grouped):
                stream_outs[i] = out
        else:
            for i in lstm_idx:
                stream_outs[i] = run_lstm(
                    lstm_params[lstm_idx.index(i)], stream_feats[i], mask)

    fused = fusion_ops.fuse(stream_outs, config.fusiontype, params.get("adasum"))

    agg = fused
    for layer in range(config.agg_layers):
        agg = _dropout(agg, config.agg_dropout, agg_rngs[layer], train)
        lp = params["aggregator"][layer]
        if config.agg_bidirectional:
            if fuse_ok and lstm_ops.can_group_lstms([lp["fwd"], lp["bwd"]]):
                f, bwd = lstm_ops.lstm_forward_grouped(
                    [lp["fwd"], lp["bwd"]], [agg, agg], mask, [False, True],
                    matmul_dtype=mmdtype)
                agg = f + bwd
            else:
                agg = (run_lstm(lp["fwd"], agg, mask)
                       + run_lstm(lp["bwd"], agg, mask, backwards=True))
        else:
            agg = run_lstm(lp["fwd"], agg, mask)

    w, b = params["output"]["w"], params["output"]["b"]
    if config.output_mode == "per_step":
        flat = agg.reshape(B * T, -1)
        probs = jax.nn.softmax(flat @ w + b, axis=-1)
        out = probs.reshape(B, T, config.output_classes)
    elif config.output_mode == "last_step":
        last = lstm_ops.last_valid_step(agg, mask)
        out = jax.nn.softmax(last @ w + b, axis=-1)
    else:
        raise ValueError(f"unknown output_mode: {config.output_mode}")
    return out


# ---------------------------------------------------------------------------
# Streaming (stateful) head — online serving, serve.StreamingSession
# ---------------------------------------------------------------------------

def check_streamable(config: AdeNetConfig) -> None:
    """Raise if the recurrent head cannot be advanced chunk by chunk.

    A bidirectional aggregator consumes the whole utterance in its flipped
    half, so its scores are only defined once the utterance ends — that is
    batch serving, not streaming.  last_step heads stream fine (the score
    just appears at finalize)."""
    if config.agg_layers > 0 and config.agg_bidirectional:
        raise ValueError(
            "streaming requires a forward-only recurrent head: set "
            "agg_bidirectional=False or agg_layers=0 (a BLSTM aggregator's "
            "backward half consumes the whole utterance)")


def streaming_init_state(params, config: AdeNetConfig, batch: int) -> dict:
    """Initial (cell, hid) carries for every recurrence in the head, taken
    from the learned cell_init/hid_init exactly as the one-shot forward
    broadcasts them."""
    def init(p):
        H = lstm_ops.lstm_params_hidden_size(p)
        return (jnp.broadcast_to(p["cell_init"], (batch, H)).astype(jnp.float32),
                jnp.broadcast_to(p["hid_init"], (batch, H)).astype(jnp.float32))

    state = {"streams": {}, "aggregator": []}
    for spec in config.streams:
        if spec.use_lstm:
            state["streams"][spec.name] = init(
                params["streams"][spec.name]["lstm"])
    for layer in range(config.agg_layers):
        if config.agg_bidirectional:
            raise ValueError("streaming state is forward-only "
                             "(check_streamable)")
        state["aggregator"].append(init(params["aggregator"][layer]["fwd"]))
    return state


def head_forward_streaming(params, config: AdeNetConfig, stream_feats, mask,
                           state):
    """One streaming chunk through the recurrent head: per-stream LSTMs ->
    fusion -> forward aggregator stack -> per-frame softmax, with every
    recurrence carrying (cell, hid) in/out of ``state``.

    Numerics are the one-shot :func:`head_forward` exactly (same ops,
    masked steps carry state through unchanged — zero-mask chunk padding is
    free), restricted to the streamable subset (:func:`check_streamable`;
    dropout off — this is a serving path).  Returns ``(probs (B, n, C),
    new_state)``; a last_step caller takes the last valid frame's probs at
    finalize."""
    check_streamable(config)
    mmdtype = config._matmul_dtype()
    B, n = stream_feats[0].shape[0], stream_feats[0].shape[1]
    new_state = {"streams": {}, "aggregator": []}

    stream_outs = list(stream_feats)
    for i, spec in enumerate(config.streams):
        if not spec.use_lstm:
            continue
        out, st = lstm_ops.lstm_forward(
            params["streams"][spec.name]["lstm"], stream_feats[i], mask,
            matmul_dtype=mmdtype, initial_state=state["streams"][spec.name],
            return_state=True)
        stream_outs[i] = out
        new_state["streams"][spec.name] = st

    fused = fusion_ops.fuse(stream_outs, config.fusiontype,
                            params.get("adasum"))

    agg = fused
    for layer in range(config.agg_layers):
        agg, st = lstm_ops.lstm_forward(
            params["aggregator"][layer]["fwd"], agg, mask,
            matmul_dtype=mmdtype, initial_state=state["aggregator"][layer],
            return_state=True)
        new_state["aggregator"].append(st)

    w, b = params["output"]["w"], params["output"]["b"]
    probs = jax.nn.softmax(
        (agg.reshape(B * n, -1) @ w + b), axis=-1
    ).reshape(B, n, config.output_classes)
    return probs, new_state
