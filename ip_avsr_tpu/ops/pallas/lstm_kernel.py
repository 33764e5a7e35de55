"""Pallas TPU kernel for the masked LSTM recurrence (inference path).

The XLA implementation (ops/lstm.lstm_forward) is a `lax.scan` whose body is
one (B, H) x (H, 4H) matmul plus gate math.  This kernel runs the same
recurrence as a Pallas grid sweep over (batch tiles, time):

  * the recurrent weights stay **resident in VMEM** for the whole sweep
    (their block index is constant, so the pipeline fetches them once);
  * the per-step gate pre-activations x_proj[t] stream through VMEM with the
    pallas pipeline's double buffering, overlapping DMA with the MXU matmul;
  * gate math is fused in-register — no HBM round trip for the gate tensor;
  * the carried cell/hidden state lives in VMEM scratch, persisting across
    grid steps (TPU grids execute sequentially), re-initialized at t == 0 of
    each batch tile.

Semantics are identical to ops/lstm.lstm_forward (Lasagne mask-carry, no
peepholes — the kernel targets the high-volume inference configs; peephole
models fall back to the XLA path).  Forward-only: no autodiff rule is
defined, training uses the XLA scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _lstm_kernel(x_proj_ref, w_hid_ref, mask_ref, cell0_ref, hid0_ref, out_ref,
                 cell_scr, hid_scr, *, H: int):
    """Mosaic layout notes: x_proj/out are time-major (T, B, 4H)/(T, B, H) so
    the per-step block's last two dims are (block_b, lanes) — tileable; the
    mask is lane-padded to (T, B, 128) so its per-step block is tileable too
    (dynamic lane slicing can't be proven 128-aligned by Mosaic)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        cell_scr[...] = cell0_ref[...]
        hid_scr[...] = hid0_ref[...]

    cell_prev = cell_scr[...]
    hid_prev = hid_scr[...]

    gates = x_proj_ref[0] + jnp.dot(
        hid_prev.astype(w_hid_ref.dtype), w_hid_ref[...],
        preferred_element_type=jnp.float32,
    )
    ingate = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    forgetgate = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    cell_input = jnp.tanh(gates[:, 2 * H : 3 * H])
    outgate = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])

    cell = forgetgate * cell_prev + ingate * cell_input
    hid = outgate * jnp.tanh(cell)

    m = mask_ref[0][:, 0:1]  # (block_b, 1)
    cell = m * cell + (1.0 - m) * cell_prev
    hid = m * hid + (1.0 - m) * hid_prev

    cell_scr[...] = cell
    hid_scr[...] = hid
    out_ref[0] = hid


def lstm_pallas(x_proj, w_hid, mask, cell0, hid0, *, block_b: int = 256,
                interpret: bool = False):
    """Run the recurrence.  x_proj (B, T, 4H) float32 (input projections +
    bias already added); w_hid (H, 4H); mask (B, T) float32; cell0/hid0
    (B, H) float32.  Returns hids (B, T, H) float32."""
    B, T, H4 = x_proj.shape
    H = H4 // 4
    block_b = min(block_b, B)
    if B % block_b != 0:
        pad = block_b - B % block_b
        x_proj = jnp.pad(x_proj, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        cell0 = jnp.pad(cell0, ((0, pad), (0, 0)))
        hid0 = jnp.pad(hid0, ((0, pad), (0, 0)))
    Bp = x_proj.shape[0]

    x_proj_t = jnp.transpose(x_proj, (1, 0, 2))  # (T, Bp, 4H)
    mask_t = jnp.broadcast_to(jnp.transpose(mask)[..., None], (T, Bp, 128))
    kernel = functools.partial(_lstm_kernel, H=H)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, 4 * H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, block_b, 128), lambda b, t: (t, b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_b, H), lambda b, t: (t, b, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj_t, w_hid, mask_t, cell0, hid0)
    return jnp.transpose(out, (1, 0, 2))[:B]


def lstm_forward_pallas(params, x, mask, backwards: bool = False,
                        matmul_dtype=jnp.bfloat16, block_b: int = 256,
                        interpret: bool = False):
    """Drop-in (inference-only) replacement for ops/lstm.lstm_forward for
    non-peephole models: the big input projection stays a plain XLA matmul,
    the recurrence runs in the Pallas kernel."""
    B, T, D = x.shape
    H = params["w_hid"].shape[0]
    if mask is None:
        mask = jnp.ones((B, T), jnp.float32)
    mask = mask.astype(jnp.float32)
    if backwards:
        x = jnp.flip(x, axis=1)
        mask = jnp.flip(mask, axis=1)

    w_in = params["w_in"]
    if matmul_dtype is not None:
        x_mm, w_in_mm = x.astype(matmul_dtype), w_in.astype(matmul_dtype)
    else:
        x_mm, w_in_mm = x, w_in
    x_proj = jnp.dot(x_mm.reshape(B * T, D), w_in_mm,
                     preferred_element_type=jnp.float32).reshape(B, T, 4 * H)
    x_proj = x_proj + params["b"]

    w_hid = params["w_hid"].astype(matmul_dtype) if matmul_dtype is not None \
        else params["w_hid"]
    cell0 = jnp.broadcast_to(params["cell_init"], (B, H)).astype(jnp.float32)
    hid0 = jnp.broadcast_to(params["hid_init"], (B, H)).astype(jnp.float32)

    out = lstm_pallas(x_proj, w_hid, mask, cell0, hid0, block_b=block_b,
                      interpret=interpret)
    return jnp.flip(out, axis=1) if backwards else out
