"""Deployment export: one self-contained artifact for the serve program.

The reference deploys a model by shipping a pickled weight dict that
``demo.py`` re-wires into a freshly-built Theano graph at load time
(``oulu/demo.py:274-447`` rebuilds the network, then copies weights in) —
serving requires the full model-building source tree.  A TPU production
deployment wants the opposite: serialize the TRACED serving program itself
(StableHLO via :mod:`jax.export`, weights baked in as constants) so the
serving host needs jax and the artifact, nothing else — no model zoo, no
config parsing, no version skew between training and serving code.

Two export shapes:

- **Polymorphic** (default): the batch and time axes are exported as
  symbolic dimensions, so ONE artifact serves any request size.  Pallas
  auto-dispatch is disabled for the trace (the kernel heuristics need
  concrete shapes), leaving pure StableHLO — which is also what makes the
  artifact multi-platform (``platforms=("cpu", "tpu")`` by default: the
  same file runs on a dev laptop and the serving chip).
- **Fixed-shape**: concrete (B, T), native platform only.  The trace keeps
  whatever Pallas kernels the heuristics select (they serialize as
  ``tpu_custom_call``), preserving the tuned single-chip serve path.

The artifact is a zip (conventionally ``.ipax``) with ``meta.json``
(format tag, model config as JSON, entry descriptors, jax version) and one
serialized :class:`jax.export.Exported` blob per entry.  :func:`load_server`
returns a callable ``(streams, mask) -> scores``; it is a thin wrapper over
``jax.export.deserialize(blob).call`` — an artifact remains loadable with
plain jax even without this package.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import zipfile
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ip_avsr_tpu.models import adenet

_FORMAT = "ipavsr-export/1"


def config_to_dict(config: adenet.AdeNetConfig) -> dict:
    """JSON-able dict of an :class:`AdeNetConfig` (tuples become lists)."""
    return dataclasses.asdict(config)


def config_from_dict(d: dict) -> adenet.AdeNetConfig:
    streams = [adenet.StreamSpec(**{**s, "encoder_shapes":
                                    tuple(s["encoder_shapes"]) if s.get("encoder_shapes") else None,
                                    "encoder_nonlinearities":
                                    tuple(s["encoder_nonlinearities"]) if s.get("encoder_nonlinearities") else None})
               for s in d["streams"]]
    rest = {k: v for k, v in d.items() if k != "streams"}
    if rest.get("agg_sizes") is not None:
        rest["agg_sizes"] = tuple(rest["agg_sizes"])
    return adenet.AdeNetConfig(streams=streams, **rest)


def _cast_weights(params, weights_dtype):
    """Deployment size/bandwidth lever shared by every exporter: bake the
    weights in a narrower dtype (bf16 halves the artifact and the weight
    HBM traffic; it is the recommended inference dtype — predictions are
    pinned argmax-stable vs f32).  Compute follows the model's
    matmul/activation dtypes as usual; None is a no-op."""
    if weights_dtype is None:
        return params
    wd = jnp.dtype(weights_dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(wd) if (hasattr(x, "dtype")
                                   and x.dtype == jnp.float32) else x,
        params)


def _input_specs(config: adenet.AdeNetConfig, batch, time):
    """ShapeDtypeStructs for ``make_server``'s (streams, mask) signature."""
    streams = [jax.ShapeDtypeStruct((batch, time, s.input_dim), jnp.float32)
               for s in config.streams]
    mask = jax.ShapeDtypeStruct((batch, time), jnp.float32)
    return streams, mask


def resolved_platforms(platforms, batch, time):
    """The platform list :func:`export_server` actually serializes for —
    the SINGLE source of truth, also consulted by :func:`save_artifact`
    for meta.json (r5 review: the default was re-derived there, so a
    future change to this rule could have made meta disagree with the
    blob).  Symbolic shapes default to cross-platform ("cpu", "tpu");
    pinned shapes default to the native platform (None)."""
    if platforms is not None:
        return list(platforms)
    return ["cpu", "tpu"] if (batch is None or time is None) else None


def export_server(
    params: dict,
    config: adenet.AdeNetConfig,
    *,
    vote: bool = True,
    batch: Optional[int] = None,
    time: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    min_time: Optional[int] = None,
    trimodal: Optional[dict] = None,
    weights_dtype=None,
) -> bytes:
    """Serialize the generic preprocessed-streams server to one blob.

    ``batch``/``time`` = None exports that axis symbolically (any size at
    call time); integers pin it.  Symbolic axes disable Pallas
    auto-dispatch for the trace (concrete-shape heuristics) and default
    ``platforms`` to ("cpu", "tpu"); fully pinned shapes keep the tuned
    kernels and default to the native platform.  ``min_time`` adds a
    ``t >= min_time`` constraint (models whose delta window needs frames;
    defaults to the model window when time is symbolic).

    ``trimodal`` (a kwargs dict for
    :func:`ip_avsr_tpu.serve.make_trimodal_server`: ``image_shape``,
    optional ``dct_coeffs``/``dct_mean``/``dct_std``) exports the
    raw-pixel server instead — input is one (B, T, H*W) pixel array; the
    diff/DCT/normalization prep is inside the exported program (the
    transport-optimal serve path; normalization stats serialize as baked
    constants).
    """
    from ip_avsr_tpu.ops.pallas import dispatch
    from ip_avsr_tpu.serve import make_server, make_trimodal_server

    params = _cast_weights(params, weights_dtype)
    if trimodal is not None:
        serve = make_trimodal_server(params, config, vote=vote, **trimodal)
    else:
        serve = make_server(params, config, vote=vote)
    symbolic = batch is None or time is None
    platforms = resolved_platforms(platforms, batch, time)

    dims, constraints = [], []
    if batch is None:
        dims.append("b")
    if time is None:
        dims.append("t")
        if min_time is not None:
            floor = min_time
        elif any(s.use_delta for s in config.streams):
            floor = max(config.window, 1)
        else:
            # the window only matters where deltas exist — a delta-free
            # model serves any length (same over-strictness class as the
            # sp window check; caught by the INI->export property leg)
            floor = 1
        constraints.append(f"t >= {int(floor)}")
    if dims:
        syms = dict(zip(dims, jax.export.symbolic_shape(
            ", ".join(dims), constraints=constraints)))
    b = syms["b"] if batch is None else int(batch)
    t = syms["t"] if time is None else int(time)

    if trimodal is not None:
        hw = int(trimodal["image_shape"][0]) * int(trimodal["image_shape"][1])
        specs = (jax.ShapeDtypeStruct((b, t, hw), jnp.float32),
                 jax.ShapeDtypeStruct((b, t), jnp.float32))
    else:
        specs = _input_specs(config, b, t)
    # Pallas auto-dispatch needs concrete shapes AND single-platform native
    # lowering (a TPU kernel baked into the trace fails to lower for cpu) —
    # fall back to pure StableHLO in either case
    cross_platform = platforms is not None and (
        len(set(platforms)) > 1
        or list(platforms)[0] != jax.default_backend())
    no_pallas = symbolic or cross_platform
    ctx = dispatch.disabled() if no_pallas else contextlib.nullcontext()
    with ctx:
        exported = jax.export.export(
            jax.jit(serve),
            platforms=tuple(platforms) if platforms else None)(*specs)
    return exported.serialize()


def save_artifact(
    path: str,
    params: dict,
    config: adenet.AdeNetConfig,
    *,
    vote: bool = True,
    batch: Optional[int] = None,
    time: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    labels: Optional[Sequence[str]] = None,
    trimodal: Optional[dict] = None,
    min_time: Optional[int] = None,
    weights_dtype=None,
) -> None:
    """Export the serve program and write the ``.ipax`` zip artifact.

    ``labels`` (optional class names) ride along in meta.json so a serving
    host can map argmax indices to names without the training config.
    ``weights_dtype="bfloat16"`` halves the artifact (and the serving
    weight traffic) at bf16 prediction tolerance.
    """
    blob = export_server(params, config, vote=vote, batch=batch, time=time,
                         platforms=platforms, trimodal=trimodal,
                         min_time=min_time, weights_dtype=weights_dtype)
    if trimodal is not None:
        hw = int(trimodal["image_shape"][0]) * int(trimodal["image_shape"][1])
        input_kind, stream_dims = "raw", [hw]
    else:
        input_kind = "streams"
        stream_dims = [s.input_dim for s in config.streams]
    meta = {
        "format": _FORMAT,
        "jax_version": jax.__version__,
        "config": config_to_dict(config),
        "labels": list(labels) if labels is not None else None,
        "entries": [{
            "name": "serve",
            "blob": "entries/serve.jaxexport",
            "vote": bool(vote),
            "input": input_kind,
            "batch": batch,
            "time": time,
            "platforms": resolved_platforms(platforms, batch, time),
            "stream_dims": stream_dims,
            "output_classes": config.output_classes,
            "weights_dtype": (str(jnp.dtype(weights_dtype))
                              if weights_dtype is not None else "float32"),
        }],
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("entries/serve.jaxexport", blob)


class ExportedServer:
    """A loaded artifact: ``server(streams, mask) -> scores``.

    ``streams`` is a list of (B, T, D_i) float arrays, ``mask`` (B, T)
    {0,1} float.  Fixed-shape entries require exactly the exported (B, T);
    symbolic entries accept any size satisfying the export constraints.
    """

    def __init__(self, meta: dict, exported):
        self.meta = meta
        entry = meta["entries"][0]
        self.vote = entry["vote"]
        self.input_kind = entry.get("input", "streams")
        self.batch = entry["batch"]
        self.time = entry["time"]
        self.stream_dims = entry["stream_dims"]
        self.output_classes = entry["output_classes"]
        self.labels = meta.get("labels")
        self._exported = exported
        # jit the exported call: Exported.call re-traces its calling
        # convention on every invocation (~1.7 ms/call measured); under jit
        # it compiles once per concrete shape like any served program
        self._call = jax.jit(exported.call)

    @property
    def config(self) -> adenet.AdeNetConfig:
        return config_from_dict(self.meta["config"])

    def __call__(self, streams, mask):
        mask = jnp.asarray(mask, jnp.float32)
        if self.input_kind == "raw":
            raw = jnp.asarray(streams, jnp.float32)
            if raw.shape[-1] != self.stream_dims[0]:
                raise ValueError(f"raw pixel dim {raw.shape[-1]} != "
                                 f"exported {self.stream_dims[0]}")
            return self._call(raw, mask)
        if len(streams) != len(self.stream_dims):
            raise ValueError(f"artifact expects {len(self.stream_dims)} "
                             f"streams, got {len(streams)}")
        streams = [jnp.asarray(s, jnp.float32) for s in streams]
        for s, d in zip(streams, self.stream_dims):
            if s.shape[-1] != d:
                raise ValueError(f"stream dim {s.shape[-1]} != exported {d}")
        return self._call(streams, mask)


def save_streaming_artifact(
    path: str,
    params: dict,
    config: adenet.AdeNetConfig,
    *,
    batch: int = 1,
    platforms: Optional[Sequence[str]] = None,
    labels: Optional[Sequence[str]] = None,
    weights_dtype=None,
) -> None:
    """Export a STREAMING session (serve.StreamingSession) as one artifact.

    Serializes the session's two device programs — the per-stream prep
    (encoder + eval BN) and the stateful head advance — with a symbolic
    chunk length, plus the initial recurrent-state arrays and the scalar
    session contract (window, lookahead, per-stream delta flags, head
    mode).  :func:`load_streaming_session` revives a fully functional
    session on a host with jax and this package's serve module only (no
    model zoo, weights, or config parsing).  The chunk axis being symbolic,
    any feed pattern works; like the symbolic batch server this trace
    disables Pallas dispatch and lowers for cpu+tpu by default.
    """
    from ip_avsr_tpu.ops.pallas import dispatch
    from ip_avsr_tpu.serve import StreamingSession

    params = _cast_weights(params, weights_dtype)
    sess = StreamingSession(params, config, batch=batch)
    if platforms is None:
        platforms = ("cpu", "tpu")
    n, = jax.export.symbolic_shape("n", constraints=["n >= 1"])

    blobs = {}
    with dispatch.disabled():
        for i, spec in enumerate(config.streams):
            x_spec = jax.ShapeDtypeStruct((batch, n, spec.input_dim),
                                          jnp.float32)
            blobs[f"prep_{i}"] = jax.export.export(
                jax.jit(sess._prep[i]), platforms=tuple(platforms))(
                    x_spec).serialize()
        feat_specs = tuple(
            jax.ShapeDtypeStruct((batch, n, s.feature_dim()), jnp.float32)
            for s in config.streams)
        mask_spec = jax.ShapeDtypeStruct((batch, n), jnp.float32)
        state_specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), sess._state)
        blobs["advance"] = jax.export.export(
            jax.jit(sess._advance), platforms=tuple(platforms))(
                feat_specs, mask_spec, state_specs).serialize()

    import io

    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(sess._state)
    state_buf = io.BytesIO()
    np.savez(state_buf, **{f"leaf_{i}": np.asarray(l)
                           for i, l in enumerate(leaves)})

    meta = {
        "format": _FORMAT,
        "jax_version": jax.__version__,
        "config": config_to_dict(config),
        "labels": list(labels) if labels is not None else None,
        "streaming": {
            "batch": int(batch),
            "window": int(config.window),
            "lookahead": int(sess._L),
            "use_delta": [bool(s.use_delta) for s in config.streams],
            "output_mode": config.output_mode,
            "output_classes": int(config.output_classes),
            "stream_dims": [s.input_dim for s in config.streams],
            "n_state_leaves": len(leaves),
            # loud-error guard for structural drift between save and load
            # (the loader rebuilds the treedef from parallel code)
            "state_treedef": str(treedef),
            "platforms": list(platforms),
        },
        "entries": [{"name": k, "blob": f"entries/{k}.jaxexport"}
                    for k in sorted(blobs)],
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        for k, blob in blobs.items():
            z.writestr(f"entries/{k}.jaxexport", blob)
        z.writestr("state0.npz", state_buf.getvalue())


class StreamingArtifact:
    """A loaded streaming artifact: call :meth:`new_session` per utterance.

    Deserialize ONCE, open many sessions — each session reuses the same
    deserialized (and, after first use, compiled) prep/advance programs,
    so per-utterance startup is just fresh bookkeeping, not a zip read +
    re-deserialize + re-compile."""

    def __init__(self, meta, exported, state0):
        self.meta = meta
        self.labels = meta.get("labels")
        self._s = meta["streaming"]
        self._exported = exported
        self._state0 = state0
        # jit the exported calls (see ExportedServer: bare Exported.call
        # re-traces per invocation); shared across sessions of this artifact
        self._prep = [jax.jit(exported[f"prep_{i}"].call)
                      for i in range(len(self._s["stream_dims"]))]
        self._advance = jax.jit(exported["advance"].call)

    def new_session(self):
        from ip_avsr_tpu.serve import StreamingSession

        s = self._s
        return StreamingSession._from_parts(
            prep=self._prep, advance=self._advance, state0=self._state0,
            window=s["window"], lookahead=s["lookahead"],
            use_delta=s["use_delta"], output_mode=s["output_mode"],
            output_classes=s["output_classes"], batch=s["batch"])


def load_streaming_artifact(path: str) -> StreamingArtifact:
    """Load a :func:`save_streaming_artifact` file; open per-utterance
    sessions with :meth:`StreamingArtifact.new_session`."""
    import io

    import numpy as np

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json").decode("utf-8"))
        if meta.get("format") != _FORMAT or "streaming" not in meta:
            raise ValueError("not a streaming export artifact")
        s = meta["streaming"]
        exported = {e["name"]: jax.export.deserialize(z.read(e["blob"]))
                    for e in meta["entries"]}
        npz = np.load(io.BytesIO(z.read("state0.npz")))
        leaves = [jnp.asarray(npz[f"leaf_{i}"])
                  for i in range(s["n_state_leaves"])]

    # rebuild the state treedef from the config (same structure
    # streaming_init_state produces — the advance program was traced with
    # it); the saved treedef string turns any future structural drift into
    # a loud error instead of silently scrambled state
    config = config_from_dict(meta["config"])
    treedef = jax.tree_util.tree_structure(
        _streaming_state_structure(config))
    if s.get("state_treedef") and s["state_treedef"] != str(treedef):
        raise ValueError(
            "state structure mismatch: the artifact was saved with "
            f"{s['state_treedef']} but this code rebuilds {treedef} — "
            "re-export the artifact with this version")
    state0 = jax.tree_util.tree_unflatten(treedef, leaves)
    return StreamingArtifact(meta, exported, state0)


def load_streaming_session(path: str):
    """Revive a :func:`save_streaming_artifact` file as one live
    :class:`ip_avsr_tpu.serve.StreamingSession`.  For many utterances,
    :func:`load_streaming_artifact` once + ``new_session()`` per utterance
    avoids re-deserializing the programs."""
    return load_streaming_artifact(path).new_session()


def _streaming_state_structure(config: adenet.AdeNetConfig):
    """A value with the same pytree STRUCTURE as streaming_init_state's
    output (leaf values irrelevant — used only for unflattening)."""
    state = {"streams": {}, "aggregator": []}
    for spec in config.streams:
        if spec.use_lstm:
            state["streams"][spec.name] = (0, 0)
    for _ in range(config.agg_layers):
        state["aggregator"].append((0, 0))
    return state


def load_server(path: str) -> ExportedServer:
    """Load a ``.ipax`` artifact written by :func:`save_artifact`."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json").decode("utf-8"))
        if meta.get("format") != _FORMAT:
            raise ValueError(f"not an ipavsr export artifact: "
                             f"format={meta.get('format')!r}")
        if "streaming" in meta:
            raise ValueError("this is a streaming artifact — use "
                             "load_streaming_session()")
        entry = meta["entries"][0]
        exported = jax.export.deserialize(z.read(entry["blob"]))
    return ExportedServer(meta, exported)
