"""Multi-stream fusion: sum / adaptive-sum / concat.

Parity: modelzoo/adenet_v2.py:68-75 selects ElemwiseSumLayer,
AdaptiveElemwiseSumLayer (custom/layers.py:178-228: one learned scalar per
stream, init 1.0) or ConcatLayer on the feature axis.
"""

from __future__ import annotations

import jax.numpy as jnp

FUSION_TYPES = ("sum", "adasum", "concat")


def init_adasum_params(n_streams: int, dtype=jnp.float32) -> dict:
    """One learned scalar coefficient per stream, initialized to 1.0
    (custom/layers.py:219: ``theano.shared(np.float32(1.0))``).  Tagged by
    name so optimizers can apply scaling-param learning-rate rules."""
    return {f"adacoeff{i}": jnp.asarray(1.0, dtype) for i in range(n_streams)}


def fuse(streams, fusiontype: str, adasum_params: dict | None = None) -> jnp.ndarray:
    if fusiontype == "sum":
        out = streams[0]
        for s in streams[1:]:
            out = out + s
        return out
    if fusiontype == "adasum":
        if adasum_params is None:
            raise ValueError("adasum fusion requires adasum params")
        out = None
        for i, s in enumerate(streams):
            scaled = s * adasum_params[f"adacoeff{i}"]
            out = scaled if out is None else out + scaled
        return out
    if fusiontype == "concat":
        return jnp.concatenate(list(streams), axis=-1)
    raise ValueError(f"Unsupported fusion type: {fusiontype!r}")


def fused_dim(stream_dims, fusiontype: str) -> int:
    if fusiontype == "concat":
        return int(sum(stream_dims))
    dims = set(int(d) for d in stream_dims)
    if len(dims) != 1:
        raise ValueError(f"{fusiontype} fusion requires equal stream dims, got {stream_dims}")
    return dims.pop()
