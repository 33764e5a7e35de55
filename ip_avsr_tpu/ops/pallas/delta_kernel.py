"""Fused Pallas TPU kernel for the DeltaLayer.

Computes delta and acceleration in a single VMEM pass per batch row: one HBM
read of x, one HBM write each for d and a, with both FIR orders evaluated
on-chip (the pure-XLA formulation in ops/delta.py materializes the padded
tensor and the first-order delta in HBM between orders; the op is
bandwidth-bound, so that traffic is the cost).

Mosaic notes: concatenates of shifted slices don't lower well (offset
mismatches), so edge padding is realized by explicit writes into a VMEM
scratch buffer and the [x, d, a] feature concat is left to XLA outside the
kernel, where it fuses with whatever consumes it.

Semantics are identical to ops/delta.append_delta_coeff (which mirrors the
reference's utils/signal.py:59-80).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test runs)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# stay well under the ~16MB VMEM budget: x, pad scratch, d, a ~= 5x block bytes
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _write_padded(pad_ref, v, window: int, T: int):
    """pad_ref[(T+2W, D)] <- [v[0]]*W ++ v ++ [v[-1]]*W (edge repeat)."""
    pad_ref[window : window + T, :] = v
    for i in range(window):
        pad_ref[i : i + 1, :] = v[0:1, :]
        pad_ref[window + T + i : window + T + i + 1, :] = v[T - 1 : T, :]


def _fir(pad_ref, window: int, T: int):
    """Normalized delta FIR read from the padded scratch buffer."""
    acc = None
    for theta in range(1, window + 1):
        coeff = 1.0 / (2.0 * theta)
        term = coeff * (
            pad_ref[window + theta : window + theta + T, :]
            - pad_ref[window - theta : window - theta + T, :]
        )
        acc = term if acc is None else acc + term
    return acc


def _delta_kernel(x_ref, d_ref, a_ref, pad_ref, *, window: int, T: int, D: int):
    x = x_ref[0]
    _write_padded(pad_ref, x, window, T)
    d = _fir(pad_ref, window, T)
    d_ref[0] = d
    _write_padded(pad_ref, d, window, T)
    a_ref[0] = _fir(pad_ref, window, T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def append_delta_pallas(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, T, 3D) fused delta+accel via the Pallas kernel, differentiable.

    The op is linear in x, so its VJP is the fixed transpose of the FIR; the
    backward pass runs the XLA formulation's transpose (Pallas kernels have
    no native autodiff), making the kernel safe inside training steps.
    """
    return _append_delta_pallas_impl(x, window)


def _append_delta_fwd(x, window):
    return _append_delta_pallas_impl(x, window), x.shape


def _append_delta_bwd(window, shape, g):
    from ip_avsr_tpu.ops import delta as delta_ops

    zeros = jnp.zeros(shape, g.dtype)
    _, vjp = jax.vjp(lambda v: delta_ops.append_delta_coeff(v, window), zeros)
    return (vjp(g)[0],)


append_delta_pallas.defvjp(_append_delta_fwd, _append_delta_bwd)


@functools.partial(jax.jit, static_argnums=(1,))
def _append_delta_pallas_impl(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, T, D) -> (B, T, 3D) fused delta+accel; grid over the batch axis."""
    B, T, D = x.shape
    kernel = functools.partial(_delta_kernel, window=window, T=T, D=D)
    d, a = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), x.dtype),
            jax.ShapeDtypeStruct((B, T, D), x.dtype),
        ),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, D), lambda b: (b, 0, 0))],
        out_specs=(
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((T + 2 * window, D), x.dtype)],
    )(x)
    return jnp.concatenate([x, d, a], axis=-1)


def should_use_pallas(x, window: int) -> bool:
    """Heuristic dispatch: TPU backend, block fits VMEM, big enough to pay off.

    Disabled when more than one device is visible: auto-dispatching an
    opaque ``pallas_call`` inside a mesh-sharded program would force GSPMD
    to all-gather the sharded operands (or fail to partition); multi-chip
    meshes take the XLA formulation, which partitions cleanly.
    """
    if pltpu is None:
        return False
    from ip_avsr_tpu.ops.pallas import dispatch

    if not dispatch.auto_dispatch_ok():
        return False
    if x.ndim != 3:
        return False
    if window <= 0:
        # the XLA path returns zero deltas for window<=0 (delta_coeff's
        # explicit guard); the kernel's tap loop would be empty — keep the
        # degenerate case on the branch that defines its semantics
        return False
    B, T, D = x.shape
    block_bytes = (T + 2 * window) * D * x.dtype.itemsize
    return 5 * block_bytes < _VMEM_BUDGET_BYTES and T * D >= 16 * 128
