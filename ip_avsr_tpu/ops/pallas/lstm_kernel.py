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

Semantics are identical to ops/lstm.lstm_forward (Lasagne mask-carry).
Four kernel bodies — two per peephole setting: ``_lstm[_peep]_fwd_kernel``
(the one forward recurrence; ``emit_residuals`` selects whether the
custom-VJP residuals — post-mask cells + pre-activation gates — are also
written, so inference and training share one set of numerics) and
``_lstm[_peep]_bwd_kernel`` (the reverse-time backward chain; the
peephole variant accumulates the three (H,) peephole gradients in VMEM
scratch).  The training entry points are dispatched by ops/lstm._lstm_core /
_lstm_core_peep when shapes fit VMEM; the XLA scans remain the fallback
and numerical reference.
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


def _lstm_fwd_kernel(x_proj_ref, w_hid_ref, mask_ref, cell0_ref, hid0_ref,
                     *refs, H: int, emit_residuals: bool):
    """The ONE non-peephole forward recurrence body (inference and training
    differ only in whether the custom-VJP residuals — post-mask cells +
    pre-activation gates — are written; a single body keeps the numerics in
    one place).  ``refs`` is (out[, cells, gates], cell_scr, hid_scr).

    Mosaic layout notes: x_proj/out are time-major (T, B, 4H)/(T, B, H) so
    the per-step block's last two dims are (block_b, lanes) — tileable; the
    mask is lane-padded to (T, B, 128) so its per-step block is tileable too
    (dynamic lane slicing can't be proven 128-aligned by Mosaic)."""
    if emit_residuals:
        out_ref, cells_ref, gates_ref, cell_scr, hid_scr = refs
    else:
        out_ref, cell_scr, hid_scr = refs
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
    if emit_residuals:
        cells_ref[0] = cell
        gates_ref[0] = gates


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
    kernel = functools.partial(_lstm_fwd_kernel, H=H, emit_residuals=False)
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


def lstm_pallas_train(x_proj_t, w_hid, mask_t, cell0, hid0, *,
                      block_b: int = 128, interpret: bool = False):
    """Forward recurrence emitting residuals for the training custom VJP.

    ``x_proj_t`` is TIME-MAJOR (T, B, 4H) float32 (projections + bias);
    ``mask_t`` (T, B, 1) float32.  Returns ``(hids, cells, gates_pre)``,
    all time-major — exactly the residual layout of ops/lstm._lstm_core.
    """
    T, B, H4 = x_proj_t.shape
    H = H4 // 4
    block_b = min(block_b, B)
    if B % block_b != 0:
        pad = block_b - B % block_b
        x_proj_t = jnp.pad(x_proj_t, ((0, 0), (0, pad), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, pad), (0, 0)))
        cell0 = jnp.pad(cell0, ((0, pad), (0, 0)))
        hid0 = jnp.pad(hid0, ((0, pad), (0, 0)))
    Bp = x_proj_t.shape[1]

    mask_l = jnp.broadcast_to(mask_t, (T, Bp, 128))
    kernel = functools.partial(_lstm_fwd_kernel, H=H, emit_residuals=True)
    hids, cells, gates = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
        ),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, 4 * H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, block_b, 128), lambda b, t: (t, b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, block_b, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, block_b, 4 * H), lambda b, t: (t, b, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj_t, w_hid, mask_l, cell0, hid0)
    if Bp != B:
        hids, cells, gates = hids[:, :B], cells[:, :B], gates[:, :B]
    return hids, cells, gates


def _lstm_bwd_kernel(g_out_ref, gates_ref, cells_ref, cells_prev_ref,
                     mask_ref, w_hid_t_ref, dgates_ref, dcell0_ref, dhid0_ref,
                     dcell_scr, dhid_scr, *, H: int, clip: float):
    """Reverse-time chain: elementwise gate backward + the one unavoidable
    dgates @ W_hid^T matmul per step, with W_hid VMEM-resident and the
    (dcell, dhid) carry in scratch.  Emits dgates per step plus the final
    carries (dcell0/dhid0 use a constant block index, so the write at the
    last grid step — time 0 — is the one that lands in HBM).  Grid:
    (batch tiles, T) with t mapped to reverse time via the index maps."""
    t = pl.program_id(1)  # 0..T-1, maps to time index T-1-t via index maps

    @pl.when(t == 0)
    def _init():
        dcell_scr[...] = jnp.zeros_like(dcell_scr)
        dhid_scr[...] = jnp.zeros_like(dhid_scr)

    dcell_next = dcell_scr[...]
    dhid_next = dhid_scr[...]

    go = g_out_ref[0]
    gates = gates_ref[0]
    cell_t = cells_ref[0]
    cell_prev = cells_prev_ref[0]
    m = mask_ref[0][:, 0:1]

    dhid_total = go + dhid_next
    dhid_cand = m * dhid_total
    dcell_cand = m * dcell_next
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    c_in = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    tc = jnp.tanh(cell_t)
    do = dhid_cand * tc
    dcell_cand = dcell_cand + dhid_cand * o * (1.0 - tc * tc)
    dgates = jnp.concatenate(
        [dcell_cand * c_in * i * (1.0 - i),
         dcell_cand * cell_prev * f * (1.0 - f),
         dcell_cand * i * (1.0 - c_in * c_in),
         do * o * (1.0 - o)],
        axis=-1)
    if clip:
        dgates = jnp.clip(dgates, -clip, clip)

    dhid_prev = jnp.dot(
        dgates.astype(w_hid_t_ref.dtype), w_hid_t_ref[...],
        preferred_element_type=jnp.float32,
    ) + (1.0 - m) * dhid_total
    dcell_prev = dcell_cand * f + (1.0 - m) * dcell_next

    dcell_scr[...] = dcell_prev
    dhid_scr[...] = dhid_prev
    dgates_ref[0] = dgates
    dcell0_ref[...] = dcell_prev
    dhid0_ref[...] = dhid_prev


def lstm_pallas_bwd_chain(g_out_t, gates_pre, cells, cells_prev, mask_t, w_hid,
                          clip: float, *, block_b: int = 128,
                          interpret: bool = False):
    """Reverse-time backward chain.  All sequence args TIME-MAJOR (T, B, .),
    float32; returns ``(dgates (T,B,4H) in forward time order, dcell0 (B,H),
    dhid0 (B,H))`` — the carries are the cotangents of the initial states."""
    T, B, H = cells.shape
    block_b = min(block_b, B)
    if B % block_b != 0:
        pad = block_b - B % block_b
        g_out_t = jnp.pad(g_out_t, ((0, 0), (0, pad), (0, 0)))
        gates_pre = jnp.pad(gates_pre, ((0, 0), (0, pad), (0, 0)))
        cells = jnp.pad(cells, ((0, 0), (0, pad), (0, 0)))
        cells_prev = jnp.pad(cells_prev, ((0, 0), (0, pad), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, pad), (0, 0)))
    Bp = g_out_t.shape[1]

    mask_l = jnp.broadcast_to(mask_t, (T, Bp, 128))
    rev = lambda b, t: (T - 1 - t, b, 0)  # noqa: E731  reverse-time block maps
    kernel = functools.partial(_lstm_bwd_kernel, H=H, clip=float(clip or 0.0))
    dgates, dcell0, dhid0 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, H), rev),
            pl.BlockSpec((1, block_b, 4 * H), rev),
            pl.BlockSpec((1, block_b, H), rev),
            pl.BlockSpec((1, block_b, H), rev),
            pl.BlockSpec((1, block_b, 128), rev),
            pl.BlockSpec((4 * H, H), lambda b, t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, 4 * H), rev),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(g_out_t, gates_pre, cells, cells_prev, mask_l, w_hid.T)
    return dgates[:, :B], dcell0[:B], dhid0[:B]


# ---------------------------------------------------------------------------
# Peephole variants (the reference DEFAULT: custom/layers.py:10 use_peepholes).
# Same grid/layout/scratch design as the non-peephole kernels; the three
# peephole vectors ride in as (1, H) blocks with constant index maps (fetched
# once, VMEM-resident like w_hid).  Residual contract matches
# ops/lstm._lstm_core_peep: gates_pre is PRE-peephole (the peephole adds are
# recomputed in the backward from cells/cells_prev), so the XLA scan and the
# kernel share one backward formulation.
# ---------------------------------------------------------------------------

def _lstm_peep_fwd_kernel(x_proj_ref, w_hid_ref, mask_ref, cell0_ref,
                          hid0_ref, wci_ref, wcf_ref, wco_ref, *refs,
                          H: int, emit_residuals: bool):
    """The ONE peephole forward body (see _lstm_fwd_kernel).  Training
    residuals: post-mask cells + PRE-peephole gate pre-activations.
    ``refs`` is (out[, cells, gates], cell_scr, hid_scr)."""
    if emit_residuals:
        out_ref, cells_ref, gates_ref, cell_scr, hid_scr = refs
    else:
        out_ref, cell_scr, hid_scr = refs
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
    ingate = jax.nn.sigmoid(gates[:, 0 * H : 1 * H] + cell_prev * wci_ref[...])
    forgetgate = jax.nn.sigmoid(gates[:, 1 * H : 2 * H] + cell_prev * wcf_ref[...])
    cell_input = jnp.tanh(gates[:, 2 * H : 3 * H])
    cell = forgetgate * cell_prev + ingate * cell_input
    outgate = jax.nn.sigmoid(gates[:, 3 * H : 4 * H] + cell * wco_ref[...])
    hid = outgate * jnp.tanh(cell)

    m = mask_ref[0][:, 0:1]
    cell = m * cell + (1.0 - m) * cell_prev
    hid = m * hid + (1.0 - m) * hid_prev

    cell_scr[...] = cell
    hid_scr[...] = hid
    out_ref[0] = hid
    if emit_residuals:
        cells_ref[0] = cell
        gates_ref[0] = gates


def lstm_pallas_peep(x_proj, w_hid, mask, cell0, hid0, w_ci, w_cf, w_co, *,
                     block_b: int = 256, interpret: bool = False):
    """Peephole inference recurrence; same contract as :func:`lstm_pallas`
    plus the three (H,) peephole vectors."""
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

    x_proj_t = jnp.transpose(x_proj, (1, 0, 2))
    mask_t = jnp.broadcast_to(jnp.transpose(mask)[..., None], (T, Bp, 128))
    peep = lambda v: v.reshape(1, H).astype(jnp.float32)  # noqa: E731
    kernel = functools.partial(_lstm_peep_fwd_kernel, H=H,
                               emit_residuals=False)
    const = lambda b, t: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, 4 * H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, 4 * H), const),
            pl.BlockSpec((1, block_b, 128), lambda b, t: (t, b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
        ],
        out_specs=pl.BlockSpec((1, block_b, H), lambda b, t: (t, b, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj_t, w_hid, mask_t, cell0, hid0, peep(w_ci), peep(w_cf), peep(w_co))
    return jnp.transpose(out, (1, 0, 2))[:B]


def lstm_pallas_peep_train(x_proj_t, w_hid, mask_t, cell0, hid0, w_ci, w_cf,
                           w_co, *, block_b: int = 128, interpret: bool = False):
    """Peephole twin of :func:`lstm_pallas_train`; returns
    ``(hids, cells, gates_pre)`` time-major."""
    T, B, H4 = x_proj_t.shape
    H = H4 // 4
    block_b = min(block_b, B)
    if B % block_b != 0:
        pad = block_b - B % block_b
        x_proj_t = jnp.pad(x_proj_t, ((0, 0), (0, pad), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, pad), (0, 0)))
        cell0 = jnp.pad(cell0, ((0, pad), (0, 0)))
        hid0 = jnp.pad(hid0, ((0, pad), (0, 0)))
    Bp = x_proj_t.shape[1]

    mask_l = jnp.broadcast_to(mask_t, (T, Bp, 128))
    peep = lambda v: v.reshape(1, H).astype(jnp.float32)  # noqa: E731
    const = lambda b, t: (0, 0)  # noqa: E731
    kernel = functools.partial(_lstm_peep_fwd_kernel, H=H,
                               emit_residuals=True)
    hids, cells, gates = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
        ),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, 4 * H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, 4 * H), const),
            pl.BlockSpec((1, block_b, 128), lambda b, t: (t, b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, block_b, H), lambda b, t: (t, b, 0)),
            pl.BlockSpec((1, block_b, 4 * H), lambda b, t: (t, b, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj_t, w_hid, mask_l, cell0, hid0, peep(w_ci), peep(w_cf), peep(w_co))
    if Bp != B:
        hids, cells, gates = hids[:, :B], cells[:, :B], gates[:, :B]
    return hids, cells, gates


def _lstm_peep_bwd_kernel(g_out_ref, gates_ref, cells_ref, cells_prev_ref,
                          mask_ref, w_hid_t_ref, wci_ref, wcf_ref, wco_ref,
                          dgates_ref, dcell0_ref, dhid0_ref, dwci_ref,
                          dwcf_ref, dwco_ref, dcell_scr, dhid_scr, wci_scr,
                          wcf_scr, wco_scr, *, H: int, clip: float):
    """Peephole reverse-time chain.  On top of the non-peephole kernel:
    the gate activations are recomputed WITH the peephole adds, the cell
    cotangent picks up the in/forget peephole routes, and the three (H,)
    peephole gradients accumulate in VMEM scratch as per-row partial sums
    (reduced to vectors outside the kernel) — peephole grads use the
    UNCLIPPED gate cotangents, exactly like ops/lstm._lstm_core_peep_bwd."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        dcell_scr[...] = jnp.zeros_like(dcell_scr)
        dhid_scr[...] = jnp.zeros_like(dhid_scr)
        wci_scr[...] = jnp.zeros_like(wci_scr)
        wcf_scr[...] = jnp.zeros_like(wcf_scr)
        wco_scr[...] = jnp.zeros_like(wco_scr)

    dcell_next = dcell_scr[...]
    dhid_next = dhid_scr[...]

    go = g_out_ref[0]
    gates = gates_ref[0]
    cell_t = cells_ref[0]
    cell_prev = cells_prev_ref[0]
    m = mask_ref[0][:, 0:1]
    w_ci = wci_ref[...]
    w_cf = wcf_ref[...]
    w_co = wco_ref[...]

    dhid_total = go + dhid_next
    dhid_cand = m * dhid_total
    dcell_cand = m * dcell_next
    i = jax.nn.sigmoid(gates[:, :H] + cell_prev * w_ci)
    f = jax.nn.sigmoid(gates[:, H : 2 * H] + cell_prev * w_cf)
    c_in = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :] + cell_t * w_co)
    tc = jnp.tanh(cell_t)
    do_pre = dhid_cand * tc * o * (1.0 - o)
    dcell_cand = (dcell_cand + dhid_cand * o * (1.0 - tc * tc)
                  + do_pre * w_co)
    di_pre = dcell_cand * c_in * i * (1.0 - i)
    df_pre = dcell_cand * cell_prev * f * (1.0 - f)
    dgc = dcell_cand * i * (1.0 - c_in * c_in)

    wci_scr[...] = wci_scr[...] + di_pre * cell_prev
    wcf_scr[...] = wcf_scr[...] + df_pre * cell_prev
    wco_scr[...] = wco_scr[...] + do_pre * cell_t

    dgates = jnp.concatenate([di_pre, df_pre, dgc, do_pre], axis=-1)
    if clip:
        dgates = jnp.clip(dgates, -clip, clip)

    dhid_prev = jnp.dot(
        dgates.astype(w_hid_t_ref.dtype), w_hid_t_ref[...],
        preferred_element_type=jnp.float32,
    ) + (1.0 - m) * dhid_total
    dcell_prev = (dcell_cand * f + di_pre * w_ci + df_pre * w_cf
                  + (1.0 - m) * dcell_next)

    dcell_scr[...] = dcell_prev
    dhid_scr[...] = dhid_prev
    dgates_ref[0] = dgates
    dcell0_ref[...] = dcell_prev
    dhid0_ref[...] = dhid_prev
    dwci_ref[...] = wci_scr[...]
    dwcf_ref[...] = wcf_scr[...]
    dwco_ref[...] = wco_scr[...]


def lstm_pallas_peep_bwd_chain(g_out_t, gates_pre, cells, cells_prev, mask_t,
                               w_hid, w_ci, w_cf, w_co, clip: float, *,
                               block_b: int = 128, interpret: bool = False):
    """Peephole backward chain.  Returns ``(dgates, dcell0, dhid0, dw_ci,
    dw_cf, dw_co)`` with the peephole grads already reduced to (H,)."""
    T, B, H = cells.shape
    block_b = min(block_b, B)
    if B % block_b != 0:
        pad = block_b - B % block_b
        g_out_t = jnp.pad(g_out_t, ((0, 0), (0, pad), (0, 0)))
        gates_pre = jnp.pad(gates_pre, ((0, 0), (0, pad), (0, 0)))
        cells = jnp.pad(cells, ((0, 0), (0, pad), (0, 0)))
        cells_prev = jnp.pad(cells_prev, ((0, 0), (0, pad), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, pad), (0, 0)))
    Bp = g_out_t.shape[1]

    mask_l = jnp.broadcast_to(mask_t, (T, Bp, 128))
    rev = lambda b, t: (T - 1 - t, b, 0)  # noqa: E731
    const = lambda b, t: (0, 0)  # noqa: E731
    peep = lambda v: v.reshape(1, H).astype(jnp.float32)  # noqa: E731
    kernel = functools.partial(_lstm_peep_bwd_kernel, H=H,
                               clip=float(clip or 0.0))
    dgates, dcell0, dhid0, dwci, dwcf, dwco = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ),
        grid=(Bp // block_b, T),
        in_specs=[
            pl.BlockSpec((1, block_b, H), rev),
            pl.BlockSpec((1, block_b, 4 * H), rev),
            pl.BlockSpec((1, block_b, H), rev),
            pl.BlockSpec((1, block_b, H), rev),
            pl.BlockSpec((1, block_b, 128), rev),
            pl.BlockSpec((4 * H, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
            pl.BlockSpec((1, H), const),
        ],
        out_specs=(
            pl.BlockSpec((1, block_b, 4 * H), rev),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
            pl.BlockSpec((block_b, H), lambda b, t: (b, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
            pltpu.VMEM((block_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(g_out_t, gates_pre, cells, cells_prev, mask_l, w_hid.T,
      peep(w_ci), peep(w_cf), peep(w_co))
    # per-row partial sums -> (H,) vectors (pad rows contributed zeros:
    # their mask is zero so dhid_cand/dcell_cand vanish)
    return (dgates[:, :B], dcell0[:B], dhid0[:B],
            dwci.sum(axis=0), dwcf.sum(axis=0), dwco.sum(axis=0))


def should_use_pallas_train(B: int, T: int, H: int, dtype_bytes: int = 4) -> bool:
    """Dispatch heuristic for the training-path kernels: TPU backend and the
    per-step working set (w_hid + x_proj/gates blocks + scratch, double
    buffered) fits comfortably in VMEM.  Disabled when more than one device
    is visible — an auto-dispatched opaque ``pallas_call`` inside a
    mesh-sharded train step can't be partitioned by GSPMD; multi-chip
    meshes use the XLA scans, which shard cleanly."""
    if pltpu is None:
        return False
    from ip_avsr_tpu.ops.pallas import dispatch

    if not dispatch.auto_dispatch_ok():
        return False
    # block last dims need not be (8,128)-divisible when they equal the full
    # array dims (the inference kernel already runs H=500 this way), so no
    # H alignment requirement — only the VMEM working-set bound
    block_b = min(128, B)
    w_bytes = H * 4 * H * dtype_bytes
    step_bytes = block_b * (4 * H + 4 * H + 3 * H + 128) * 4
    return (w_bytes + 2 * step_bytes) < 12 * 1024 * 1024 \
        and B * T * H >= 1 << 16


def lstm_forward_pallas(params, x, mask, backwards: bool = False,
                        matmul_dtype=jnp.bfloat16, block_b: int = 256,
                        interpret: bool = False):
    """Drop-in (inference-only) replacement for ops/lstm.lstm_forward:
    the big input projection stays a plain XLA matmul, the recurrence runs
    in the Pallas kernel (peephole models use the peephole kernel).  The
    flip/projection/broadcast prologue is ops/lstm._lstm_prep — ONE place
    owns those numerics (incl. the accumulation-dtype rule)."""
    from ip_avsr_tpu.ops import lstm as lstm_ops

    B, T, D = x.shape
    if mask is None:
        mask = jnp.ones((B, T), jnp.float32)
    mask = mask.astype(jnp.float32)
    md = jnp.dtype(matmul_dtype).name if matmul_dtype is not None else None
    x, mask, x_proj, cell0, hid0, w_hid_mm, H, _f32 = lstm_ops._lstm_prep(
        (bool(backwards), 0.0, md), params["w_in"], params["w_hid"],
        params["b"], params["cell_init"], params["hid_init"], x, mask)

    if "w_cell_to_ingate" in params:
        out = lstm_pallas_peep(x_proj, w_hid_mm, mask, cell0, hid0,
                               params["w_cell_to_ingate"],
                               params["w_cell_to_forgetgate"],
                               params["w_cell_to_outgate"],
                               block_b=block_b, interpret=interpret)
    else:
        out = lstm_pallas(x_proj, w_hid_mm, mask, cell0, hid0, block_b=block_b,
                          interpret=interpret)
    return jnp.flip(out, axis=1) if backwards else out
