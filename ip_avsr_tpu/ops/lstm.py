"""Masked LSTM / BLSTM with Lasagne-compatible semantics, as a jitted scan.

Behavioral parity targets (custom/layers.py:10-80 and Lasagne's LSTMLayer):

  * gate stacking order (ingate, forgetgate, cell, outgate); sigmoid gates,
    tanh cell input and output nonlinearities
  * elementwise *gradient* clipping of the stacked gate pre-activations to
    [-5, 5] during backprop (Lasagne ``grad_clipping=5.``) — forward values
    untouched
  * optional peephole connections: cell_prev feeds in/forget gates
    pre-nonlinearity, the *new* cell feeds the outgate
  * learned initial hidden/cell state, broadcast over the batch
  * mask semantics: masked steps carry the previous hidden AND cell state
    forward unchanged (so the last timestep of a padded sequence holds the
    last valid output)
  * backwards layers reverse input+mask along time, scan, and reverse the
    output back (padded tail therefore holds the learned initial state)

TPU design: the input projection for all gates and timesteps is one large
(B*T, D) x (D, 4H) matmul on the MXU before the scan; the scan body contains
only the (B, H) x (H, 4H) recurrence and elementwise gate math, which XLA
fuses.  Time is the scan axis (batch stays vectorized), shapes are static,
and the whole thing lives under jit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ip_avsr_tpu.ops import initializers as inits


def _acc(compute_dtype):
    """Matmul accumulation dtype: f32 for f32/bf16 compute (MXU-native),
    widened to f64 when the compute dtype is f64 — so the finite-difference
    validation suite can run the whole model at double precision."""
    return jnp.promote_types(jnp.float32, compute_dtype)


# ---------------------------------------------------------------------------
# Elementwise gradient clipping (theano.gradient.grad_clip equivalent)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def grad_clip(x, bound):
    return x


def _grad_clip_fwd(x, bound):
    return x, bound


def _grad_clip_bwd(bound, g):
    return (jnp.clip(g, -bound, bound), None)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_lstm_params(
    key,
    input_dim: int,
    hidden: int,
    w_init=inits.glorot_uniform,
    use_peepholes: bool = False,
    peephole_init=inits.normal(0.1),
    dtype=jnp.float32,
) -> dict:
    """Parameter pytree for one LSTM layer.

    Layout: ``w_in (D, 4H)``, ``w_hid (H, 4H)``, ``b (4H,)``,
    ``cell_init (1, H)``, ``hid_init (1, H)`` and optional peephole vectors.
    Each gate's block is initialized with an independent draw (matching the
    per-gate Lasagne parameters) and stacked.
    """
    keys = jax.random.split(key, 11)
    w_in = jnp.concatenate([w_init(keys[i], (input_dim, hidden), dtype) for i in range(4)], axis=1)
    w_hid = jnp.concatenate([w_init(keys[4 + i], (hidden, hidden), dtype) for i in range(4)], axis=1)
    params = {
        "w_in": w_in,
        "w_hid": w_hid,
        "b": jnp.zeros((4 * hidden,), dtype),
        "cell_init": jnp.zeros((1, hidden), dtype),
        "hid_init": jnp.zeros((1, hidden), dtype),
    }
    if use_peepholes:
        params["w_cell_to_ingate"] = peephole_init(keys[8], (hidden,), dtype)
        params["w_cell_to_forgetgate"] = peephole_init(keys[9], (hidden,), dtype)
        params["w_cell_to_outgate"] = peephole_init(keys[10], (hidden,), dtype)
    return params


def lstm_params_hidden_size(params) -> int:
    return params["w_hid"].shape[0]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def lstm_forward(
    params: dict,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    backwards: bool = False,
    grad_clipping: float = 5.0,
    matmul_dtype=None,
    use_custom_vjp: bool = True,
    remat: bool = False,
    residual_dtype=None,
    initial_state=None,
    return_state: bool = False,
) -> jnp.ndarray:
    """Run a masked LSTM over ``x`` (B, T, D); returns hidden states (B, T, H).

    ``initial_state`` ((B, H) cell, (B, H) hid) overrides the learned
    ``cell_init``/``hid_init`` broadcast, and ``return_state=True`` makes
    the call return ``(out, (cell_T, hid_T))`` — together they let a
    STREAMING caller advance the recurrence chunk by chunk with exact
    one-shot semantics (masked steps carry state through unchanged, so
    chunk padding with zero mask is free).  Either option routes to the
    plain-autodiff scan (inference path; the custom-VJP/Pallas cores don't
    expose their carry) and is incompatible with ``backwards`` (a flipped
    recurrence has no forward-streamable state).

    ``matmul_dtype`` (e.g. jnp.bfloat16) casts matmul *operands* for MXU
    throughput while keeping f32 accumulation and state.

    Training path: the non-peephole recurrence carries a custom VJP
    (:func:`_lstm_core`) whose backward scan emits the per-step gate
    cotangents and batches ALL weight/input gradients into three large
    MXU matmuls afterwards, instead of XLA autodiff's per-step
    ``h_prev^T @ dgates`` accumulation inside the sequential chain —
    measured ~1.5x faster full-train-step on v5e.  ``use_custom_vjp=False``
    forces plain autodiff (kept for gradient-equality tests).

    ``remat=True`` drops the (T, B, 4H) pre-activation gates from the
    training residuals — the dominant activation tensor — and recomputes
    them at the START of the backward with two large MXU matmuls
    (``x @ W_in`` and ``hids_prev @ W_hid``; the recurrence itself is never
    re-run).  Residual memory per layer falls from ~6H to ~2H floats/step,
    and the recomputed tensor is transient (alive only during that layer's
    backward) instead of held across the whole forward+backward.  This is
    the long-sequence memory lever that pairs with sequence parallelism
    (docs/SCALING.md); gradients are numerically equal up to matmul
    reduction order (tested).  Works for peephole layers too: the peephole
    terms enter the gates inside the backward's activation recompute from
    the SAVED cell residuals, so the rebuilt pre-peephole gates need only
    x and hids_prev — no recurrence dependency.

    ``residual_dtype`` (e.g. jnp.bfloat16) stores the per-step training
    residual stacks (gates, hids, cells) in that dtype, halving the HBM
    residual traffic that bounds the (bandwidth-limited) backward pass;
    compute stays f32 — residuals are upcast as the backward consumes
    them.  The outputs and all gradients remain f32; only the backward's
    *inputs* are quantized, perturbing gradients at ~bf16 epsilon
    (tested: gradient tolerance + optimizer-trajectory argmax stability).
    Composes with ``remat`` (then only hids/cells are stored, in the
    reduced dtype).
    """
    B, T, D = x.shape
    H = lstm_params_hidden_size(params)
    use_peepholes = "w_cell_to_ingate" in params
    f32 = x.dtype

    if mask is None:
        mask = jnp.ones((B, T), dtype=jnp.float32)
    mask = mask.astype(jnp.float32)

    if initial_state is not None or return_state:
        if backwards:
            raise ValueError("initial_state/return_state require a forward "
                             "recurrence (backwards=True has no streamable "
                             "carry)")
        use_custom_vjp = False

    if use_custom_vjp:
        static = (bool(backwards), float(grad_clipping or 0.0),
                  jnp.dtype(matmul_dtype).name if matmul_dtype is not None else None,
                  bool(remat),
                  jnp.dtype(residual_dtype).name if residual_dtype is not None else None)
        if use_peepholes:
            # the peephole terms enter the gates inside the backward's
            # activation recompute (from the saved cell residuals), so the
            # remat gate rebuild is identical to the non-peephole one
            return _lstm_core_peep(
                static, params["w_in"], params["w_hid"], params["b"],
                params["cell_init"], params["hid_init"],
                params["w_cell_to_ingate"], params["w_cell_to_forgetgate"],
                params["w_cell_to_outgate"], x, mask)
        return _lstm_core(static, params["w_in"], params["w_hid"], params["b"],
                          params["cell_init"], params["hid_init"], x, mask)

    if remat or residual_dtype is not None:
        # both are residual-layout levers of the custom-VJP cores; the
        # plain-autodiff path has no residual machinery, and silently
        # ignoring them would make a remat-on-vs-off comparison through
        # this flag compare two identical programs
        raise ValueError("remat / residual_dtype require use_custom_vjp=True")

    if backwards:
        x = jnp.flip(x, axis=1)
        mask = jnp.flip(mask, axis=1)

    w_in, w_hid, b = params["w_in"], params["w_hid"], params["b"]
    if matmul_dtype is not None:
        x_mm, w_in_mm = x.astype(matmul_dtype), w_in.astype(matmul_dtype)
    else:
        x_mm, w_in_mm = x, w_in

    # One MXU-sized matmul for every gate at every timestep.
    x_proj = (
        jnp.dot(x_mm.reshape(B * T, D), w_in_mm, preferred_element_type=_acc(f32))
        .reshape(B, T, 4 * H)
        .astype(f32)
        + b
    )
    x_proj_t = jnp.transpose(x_proj, (1, 0, 2))  # (T, B, 4H)
    mask_t = jnp.transpose(mask, (1, 0))[..., None]  # (T, B, 1)

    if initial_state is not None:
        cell0 = initial_state[0].astype(f32)
        hid0 = initial_state[1].astype(f32)
    else:
        cell0 = jnp.broadcast_to(params["cell_init"], (B, H)).astype(f32)
        hid0 = jnp.broadcast_to(params["hid_init"], (B, H)).astype(f32)

    w_hid_mm = w_hid.astype(matmul_dtype) if matmul_dtype is not None else w_hid

    def step(carry, inputs):
        cell_prev, hid_prev = carry
        xp, m = inputs
        hid_mm = hid_prev.astype(w_hid_mm.dtype)
        gates = xp + jnp.dot(hid_mm, w_hid_mm, preferred_element_type=_acc(f32)).astype(f32)
        if grad_clipping:
            gates = grad_clip(gates, grad_clipping)
        ingate, forgetgate, cell_input, outgate = jnp.split(gates, 4, axis=-1)
        if use_peepholes:
            ingate = ingate + cell_prev * params["w_cell_to_ingate"]
            forgetgate = forgetgate + cell_prev * params["w_cell_to_forgetgate"]
        ingate = jax.nn.sigmoid(ingate)
        forgetgate = jax.nn.sigmoid(forgetgate)
        cell_input = jnp.tanh(cell_input)
        cell = forgetgate * cell_prev + ingate * cell_input
        if use_peepholes:
            outgate = outgate + cell * params["w_cell_to_outgate"]
        outgate = jax.nn.sigmoid(outgate)
        hid = outgate * jnp.tanh(cell)
        # masked steps carry previous state through
        cell = m * cell + (1.0 - m) * cell_prev
        hid = m * hid + (1.0 - m) * hid_prev
        return (cell, hid), hid

    (cell_fin, hid_fin), hids = jax.lax.scan(step, (cell0, hid0),
                                             (x_proj_t, mask_t))
    out = jnp.transpose(hids, (1, 0, 2))  # (B, T, H)
    if backwards:
        out = jnp.flip(out, axis=1)
    if return_state:
        return out, (cell_fin, hid_fin)
    return out


# ---------------------------------------------------------------------------
# Custom-VJP LSTM core (non-peephole): batched weight gradients
# ---------------------------------------------------------------------------
#
# XLA's autodiff of the scan accumulates dW_hid with a per-step
# (H, B) @ (B, 4H) matmul inside the sequential backward chain and stores
# every gate activation as a residual.  This core instead:
#   * saves only (gates_pre, cells, hids) per step, recomputing the cheap
#     elementwise nonlinearities in the backward pass;
#   * keeps ONLY the unavoidable dh chain matmul (dgates @ W_hid^T) in the
#     backward scan, stacking dgates;
#   * computes dW_hid / dW_in / dx / db afterwards as three large (T*B)-row
#     MXU matmuls.
# Gradient semantics (Lasagne grad_clipping on the stacked pre-activations,
# mask carry, learned initial states) are identical to autodiff of
# lstm_forward(use_custom_vjp=False); tests assert equality.
#
# On TPU, when shapes fit VMEM, both the forward recurrence and the backward
# chain run as Pallas kernels (ops/pallas/lstm_kernel.py: weights resident in
# VMEM, gate math fused, carry in scratch); the XLA scans are the fallback
# and the numerical reference.

def _static_extras(static):
    """(remat, residual_dtype) from the trailing optional static elements."""
    remat = bool(static[3]) if len(static) > 3 else False
    resd = (jnp.dtype(static[4]) if len(static) > 4 and static[4] is not None
            else None)
    return remat, resd


def _pallas_train_ok(B, T, H, dtype=None) -> bool:
    # the kernels' out_shape/scratch are f32; any other compute dtype
    # (f64 under the x64 finite-difference suite, bf16 states) must take
    # the XLA scan, which follows the input dtype
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    try:
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        return lstm_kernel.should_use_pallas_train(B, T, H)
    except Exception:  # pragma: no cover
        return False


def _lstm_prep(static, w_in, w_hid, b, cell_init, hid_init, x, mask):
    """Shared prologue of the custom-VJP forwards: time flip, the hoisted
    (B*T, D) x (D, 4H) input projection, broadcast initial states, matmul
    dtype casts.  Returns (x, mask, x_proj, cell0, hid0, w_hid_mm, H, f32)
    with x/mask already flipped when ``backwards``."""
    backwards, _grad_clipping, md = static[:3]
    mmdtype = jnp.dtype(md) if md else None
    B, T, D = x.shape
    H = w_hid.shape[0]
    f32 = x.dtype
    if backwards:
        x = jnp.flip(x, axis=1)
        mask = jnp.flip(mask, axis=1)
    x_mm = x.astype(mmdtype) if mmdtype else x
    w_in_mm = w_in.astype(mmdtype) if mmdtype else w_in
    x_proj = (
        jnp.dot(x_mm.reshape(B * T, D), w_in_mm, preferred_element_type=_acc(f32))
        .reshape(B, T, 4 * H)
        .astype(f32)
        + b.astype(f32)
    )
    cell0 = jnp.broadcast_to(cell_init, (B, H)).astype(f32)
    hid0 = jnp.broadcast_to(hid_init, (B, H)).astype(f32)
    w_hid_mm = w_hid.astype(mmdtype) if mmdtype else w_hid
    return x, mask, x_proj, cell0, hid0, w_hid_mm, H, f32


def _recurrence_scan(x_proj_t, mask_t, cell0, hid0, w_hid_mm, H, f32,
                     collect_residuals):
    """The XLA fallback recurrence (non-peephole, Lasagne mask-carry).
    ``collect_residuals``: True emits (hids, cells, gates) stacks (the
    custom-VJP forward), "hc" emits (hids, cells) (the remat forward —
    gates are recomputed in the backward), False emits hids (the primal)."""

    def step(carry, inputs):
        cell_prev, hid_prev = carry
        xp, m = inputs
        gates = xp + jnp.dot(hid_prev.astype(w_hid_mm.dtype), w_hid_mm,
                             preferred_element_type=_acc(f32)).astype(f32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        c_in = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        cell_cand = f * cell_prev + i * c_in
        hid_cand = o * jnp.tanh(cell_cand)
        cell = m * cell_cand + (1.0 - m) * cell_prev
        hid = m * hid_cand + (1.0 - m) * hid_prev
        if collect_residuals == "hc":
            out = (hid, cell)
        elif collect_residuals:
            out = (hid, cell, gates)
        else:
            out = hid
        return (cell, hid), out

    (_, _), ys = jax.lax.scan(step, (cell0, hid0), (x_proj_t, mask_t))
    return ys


def _lstm_core_fwd_impl(static, w_in, w_hid, b, cell_init, hid_init, x, mask):
    backwards = static[0]
    remat, resd = _static_extras(static)
    x, mask, x_proj, cell0, hid0, w_hid_mm, H, f32 = _lstm_prep(
        static, w_in, w_hid, b, cell_init, hid_init, x, mask)
    B, T = x.shape[0], x.shape[1]
    x_proj_t = jnp.transpose(x_proj, (1, 0, 2))  # (T, B, 4H)
    mask_t = jnp.transpose(mask, (1, 0))[..., None]

    if remat:
        # gates are NOT saved — the backward rebuilds them from x and
        # hids_prev with two large matmuls; a scalar placeholder keeps the
        # residual structure uniform.  (The Pallas train kernel always
        # emits gates, so the remat forward takes the scan path.)
        hids, cells = _recurrence_scan(
            x_proj_t, mask_t, cell0, hid0, w_hid_mm, H, f32,
            collect_residuals="hc")
        gates_pre = jnp.zeros((), f32)
    elif _pallas_train_ok(B, T, H, f32):
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        hids, cells, gates_pre = lstm_kernel.lstm_pallas_train(
            x_proj_t, w_hid_mm, mask_t, cell0, hid0)
    else:
        hids, cells, gates_pre = _recurrence_scan(
            x_proj_t, mask_t, cell0, hid0, w_hid_mm, H, f32,
            collect_residuals=True)
    out = jnp.transpose(hids, (1, 0, 2))
    if backwards:
        out = jnp.flip(out, axis=1)
    if resd is not None:
        # quantize the per-step residual stacks only (output stays f32)
        hids = hids.astype(resd)
        cells = cells.astype(resd)
        gates_pre = gates_pre.astype(resd)
    # x and mask stored time-FORWARD-of-scan (i.e. already flipped when
    # backwards); the bwd pass mirrors the flips on the way out.  b /
    # cell_init / hid_init ride along so the bwd can return cotangents in
    # their dtypes (a bf16 param tree must get bf16 grads, or the first
    # optimizer update silently promotes those leaves to f32).
    residuals = (w_in, w_hid, b, cell_init, hid_init, x, mask, hids, cells,
                 gates_pre, cell0, hid0)
    return out, residuals


def _lstm_core_primal_impl(static, w_in, w_hid, b, cell_init, hid_init, x, mask):
    """Primal-only forward: no training residuals.

    The custom-vjp PRIMAL runs when nothing is being differentiated
    (eval/predict through ``lstm_forward``'s default path).  The
    residual-emitting implementations would then write cells + (T,B,4H)
    pre-activation gates to HBM that nothing consumes — XLA's DCE prunes
    them out of a scan, but a ``pallas_call`` is opaque, so on TPU the train
    kernel would pay ~6x the inference kernel's output bytes for nothing.
    This impl dispatches the inference kernel (bit-exact vs the scan)
    instead, and a hids-only scan elsewhere.
    """
    backwards = static[0]
    x, mask, x_proj, cell0, hid0, w_hid_mm, H, f32 = _lstm_prep(
        static, w_in, w_hid, b, cell_init, hid_init, x, mask)
    B, T = x.shape[0], x.shape[1]

    if _pallas_train_ok(B, T, H, f32):
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        # block_b=128 matches what should_use_pallas_train sized the VMEM
        # working set for (the kernel default of 256 would double it and
        # could exceed VMEM on shapes just inside the gate); 128 vs 256 is
        # a measured wash at these shapes (docs/DESIGN.md)
        out = lstm_kernel.lstm_pallas(x_proj, w_hid_mm, mask.astype(f32),
                                      cell0, hid0, block_b=128)
    else:
        x_proj_t = jnp.transpose(x_proj, (1, 0, 2))
        mask_t = jnp.transpose(mask, (1, 0))[..., None]
        hids = _recurrence_scan(x_proj_t, mask_t, cell0, hid0, w_hid_mm, H,
                                f32, collect_residuals=False)
        out = jnp.transpose(hids, (1, 0, 2))
    if backwards:
        out = jnp.flip(out, axis=1)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core(static, w_in, w_hid, b, cell_init, hid_init, x, mask):
    return _lstm_core_primal_impl(static, w_in, w_hid, b, cell_init, hid_init,
                                  x, mask)


def _lstm_core_fwd(static, w_in, w_hid, b, cell_init, hid_init, x, mask):
    return _lstm_core_fwd_impl(static, w_in, w_hid, b, cell_init, hid_init, x, mask)


def _lstm_core_bwd(static, residuals, g_out):
    backwards, grad_clipping, md = static[:3]
    remat, resd = _static_extras(static)
    mmdtype = jnp.dtype(md) if md else None
    (w_in, w_hid, b_p, cell_init_p, hid_init_p, x, mask, hids, cells,
     gates_pre, cell0, hid0) = residuals
    T, B, H = hids.shape
    D = x.shape[-1]
    f32 = x.dtype
    if resd is not None:
        # upcast the quantized residual stacks; all backward math stays f32
        hids = hids.astype(f32)
        cells = cells.astype(f32)
        gates_pre = gates_pre.astype(f32)
    if backwards:
        g_out = jnp.flip(g_out, axis=1)
    g_out_t = jnp.transpose(g_out, (1, 0, 2))  # (T, B, H)
    mask_t = jnp.transpose(mask, (1, 0))[..., None]
    cells_prev = jnp.concatenate([cell0[None], cells[:-1]], axis=0)
    w_hid_mm = w_hid.astype(mmdtype) if mmdtype else w_hid
    hids_prev = jnp.concatenate([hid0[None], hids[:-1]], axis=0)

    if remat:
        # rebuild the pre-activation gates dropped from the residuals: the
        # same x @ W_in + b and hids_prev @ W_hid the forward computed, as
        # two large transient MXU matmuls (no recurrence re-run — hids is a
        # saved residual, so hids_prev is just a shift)
        x_tm = jnp.transpose(x, (1, 0, 2))  # (T, B, D); 3-D dots, not a
        # (T*B, .) flatten — merging unsharded T with a data-parallel-sharded
        # B would force the SPMD partitioner to all-gather the stacks
        x_mm = x_tm.astype(mmdtype) if mmdtype else x_tm
        w_in_mm = w_in.astype(mmdtype) if mmdtype else w_in
        xp = (jnp.dot(x_mm, w_in_mm, preferred_element_type=_acc(f32))
              .astype(f32) + b_p.astype(f32))
        hp_mm = hids_prev.astype(mmdtype) if mmdtype else hids_prev
        rec = (jnp.dot(hp_mm, w_hid_mm, preferred_element_type=_acc(f32))
               .astype(f32))
        gates_pre = xp + rec

    def back_step(carry, inputs):
        dcell_next, dhid_next = carry  # cotangents of this step's outputs
        go, gates, cell_t, cell_prev, m = inputs
        dhid_total = go + dhid_next
        dhid_cand = m * dhid_total
        dcell_cand = m * dcell_next
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        c_in = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        # cell_t (post-mask) equals the candidate cell wherever m=1; the m=0
        # lanes are zeroed by dhid_cand/dcell_cand so the value is immaterial
        tc = jnp.tanh(cell_t)
        do = dhid_cand * tc
        dcell_cand = dcell_cand + dhid_cand * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [dcell_cand * c_in * i * (1.0 - i),
             dcell_cand * cell_prev * f * (1.0 - f),
             dcell_cand * i * (1.0 - c_in * c_in),
             do * o * (1.0 - o)],
            axis=-1)
        if grad_clipping:
            dgates = jnp.clip(dgates, -grad_clipping, grad_clipping)
        dg_mm = dgates.astype(mmdtype) if mmdtype else dgates
        dhid_prev = (jnp.dot(dg_mm, w_hid_mm.T, preferred_element_type=_acc(f32))
                     .astype(f32) + (1.0 - m) * dhid_total)
        dcell_prev = dcell_cand * f + (1.0 - m) * dcell_next
        return (dcell_prev, dhid_prev), dgates

    if _pallas_train_ok(B, T, H, f32):
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        dgates_all, dcell0_g, dhid0_g = lstm_kernel.lstm_pallas_bwd_chain(
            g_out_t, gates_pre, cells, cells_prev, mask_t, w_hid_mm,
            grad_clipping)
    else:
        zeros = jnp.zeros((B, H), f32)
        (dcell0_g, dhid0_g), dgates_all = jax.lax.scan(
            back_step, (zeros, zeros),
            (g_out_t, gates_pre, cells, cells_prev, mask_t), reverse=True)

    # weight/input grads as single large MXU contractions over all (T, B)
    # rows, expressed as dot_generals contracting BOTH axes of the stacked
    # (T, B, .) tensors.  NOT a (T*B, .) reshape: merging the unsharded T
    # axis with a (possibly data-parallel-sharded) B axis is inexpressible
    # as a sharded reshape, and the SPMD partitioner responds by
    # all-gathering every residual stack across the mesh (15 batch-axis
    # all-gathers in the dp train step, scripts/scaling_pins.py); the
    # contraction form instead keeps shards local and yields one partial
    # matmul + grad all-reduce.  Single-device lowering is identical (XLA
    # collapses the contracting dims itself).
    x_t = jnp.transpose(x, (1, 0, 2))  # (T, B, D)
    tb = (((0, 1), (0, 1)), ((), ()))  # contract T and B; no batch dims
    if mmdtype:
        dg_mm = dgates_all.astype(mmdtype)
        dw_hid = jax.lax.dot_general(
            hids_prev.astype(mmdtype), dg_mm, tb,
            preferred_element_type=_acc(f32)).astype(w_hid.dtype)
        dw_in = jax.lax.dot_general(
            x_t.astype(mmdtype), dg_mm, tb,
            preferred_element_type=_acc(f32)).astype(w_in.dtype)
        dx = (jnp.dot(dg_mm, w_in.astype(mmdtype).T,
                      preferred_element_type=_acc(f32)).astype(f32))
    else:
        dw_hid = jax.lax.dot_general(
            hids_prev, dgates_all, tb,
            preferred_element_type=_acc(f32)).astype(w_hid.dtype)
        dw_in = jax.lax.dot_general(
            x_t, dgates_all, tb,
            preferred_element_type=_acc(f32)).astype(w_in.dtype)
        dx = jnp.dot(dgates_all, w_in.T,
                     preferred_element_type=_acc(f32)).astype(f32)
    db = dgates_all.sum(axis=(0, 1)).astype(b_p.dtype)
    dx = jnp.transpose(dx, (1, 0, 2))  # (T, B, D) -> (B, T, D)
    if backwards:
        dx = jnp.flip(dx, axis=1)
    dcell_init = dcell0_g.sum(axis=0, keepdims=True).astype(cell_init_p.dtype)
    dhid_init = dhid0_g.sum(axis=0, keepdims=True).astype(hid_init_p.dtype)
    dmask = jnp.zeros_like(mask)
    return dw_in, dw_hid, db, dcell_init, dhid_init, dx, dmask


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


# Peephole variant: same batched-weight-gradient strategy; the peephole
# connections (cell_prev into in/forget gate pre-activations POST-clip-node,
# new cell into the outgate — custom/layers.py:10-27 peepholes) add three
# (H,) vector gradients accumulated inside the backward scan.  Like the
# non-peephole core, all three passes dispatch Pallas kernels when shapes
# fit VMEM (ops/pallas/lstm_kernel.lstm_pallas_peep*), with the XLA scans
# as fallback and numerical reference; the peephole-gradient accumulators
# live in VMEM scratch inside the backward kernel.

def _peep_recurrence_scan(x_proj_t, mask_t, cell0, hid0, w_hid_mm, w_ci, w_cf,
                          w_co, H, f32, collect_residuals):
    """XLA fallback peephole recurrence (Lasagne mask-carry)."""

    def step(carry, inputs):
        cell_prev, hid_prev = carry
        xp, m = inputs
        gates = xp + jnp.dot(hid_prev.astype(w_hid_mm.dtype), w_hid_mm,
                             preferred_element_type=_acc(f32)).astype(f32)
        i = jax.nn.sigmoid(gates[:, :H] + cell_prev * w_ci)
        f = jax.nn.sigmoid(gates[:, H : 2 * H] + cell_prev * w_cf)
        c_in = jnp.tanh(gates[:, 2 * H : 3 * H])
        cell_cand = f * cell_prev + i * c_in
        o = jax.nn.sigmoid(gates[:, 3 * H :] + cell_cand * w_co)
        hid_cand = o * jnp.tanh(cell_cand)
        cell = m * cell_cand + (1.0 - m) * cell_prev
        hid = m * hid_cand + (1.0 - m) * hid_prev
        if collect_residuals == "hc":
            out = (hid, cell)
        elif collect_residuals:
            out = (hid, cell, gates)
        else:
            out = hid
        return (cell, hid), out

    (_, _), ys = jax.lax.scan(step, (cell0, hid0), (x_proj_t, mask_t))
    return ys


def _lstm_core_peep_fwd_impl(static, w_in, w_hid, b, cell_init, hid_init,
                             w_ci, w_cf, w_co, x, mask):
    backwards = static[0]
    remat, resd = _static_extras(static)
    x, mask, x_proj, cell0, hid0, w_hid_mm, H, f32 = _lstm_prep(
        static, w_in, w_hid, b, cell_init, hid_init, x, mask)
    B, T = x.shape[0], x.shape[1]
    x_proj_t = jnp.transpose(x_proj, (1, 0, 2))
    mask_t = jnp.transpose(mask, (1, 0))[..., None]

    if remat:
        # like the non-peephole remat: the saved residuals are the PRE-
        # peephole stacked gates' inputs (x, hids_prev) — the backward's
        # activation recompute adds the peephole terms from the saved cells
        hids, cells = _peep_recurrence_scan(
            x_proj_t, mask_t, cell0, hid0, w_hid_mm, w_ci, w_cf, w_co, H, f32,
            collect_residuals="hc")
        gates_pre = jnp.zeros((), f32)
    elif _pallas_train_ok(B, T, H, f32):
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        hids, cells, gates_pre = lstm_kernel.lstm_pallas_peep_train(
            x_proj_t, w_hid_mm, mask_t.astype(f32), cell0, hid0,
            w_ci, w_cf, w_co)
    else:
        hids, cells, gates_pre = _peep_recurrence_scan(
            x_proj_t, mask_t, cell0, hid0, w_hid_mm, w_ci, w_cf, w_co, H, f32,
            collect_residuals=True)
    out = jnp.transpose(hids, (1, 0, 2))
    if backwards:
        out = jnp.flip(out, axis=1)
    if resd is not None:
        hids = hids.astype(resd)
        cells = cells.astype(resd)
        gates_pre = gates_pre.astype(resd)
    residuals = (w_in, w_hid, b, cell_init, hid_init, w_ci, w_cf, w_co, x,
                 mask, hids, cells, gates_pre, cell0, hid0)
    return out, residuals


def _lstm_core_peep_primal_impl(static, w_in, w_hid, b, cell_init, hid_init,
                                w_ci, w_cf, w_co, x, mask):
    """Primal-only peephole forward (no residuals written — see
    _lstm_core_primal_impl for why this matters with opaque pallas_calls)."""
    backwards = static[0]
    x, mask, x_proj, cell0, hid0, w_hid_mm, H, f32 = _lstm_prep(
        static, w_in, w_hid, b, cell_init, hid_init, x, mask)
    B, T = x.shape[0], x.shape[1]

    if _pallas_train_ok(B, T, H, f32):
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        out = lstm_kernel.lstm_pallas_peep(x_proj, w_hid_mm,
                                           mask.astype(f32), cell0, hid0,
                                           w_ci, w_cf, w_co)
    else:
        x_proj_t = jnp.transpose(x_proj, (1, 0, 2))
        mask_t = jnp.transpose(mask, (1, 0))[..., None]
        hids = _peep_recurrence_scan(x_proj_t, mask_t, cell0, hid0, w_hid_mm,
                                     w_ci, w_cf, w_co, H, f32,
                                     collect_residuals=False)
        out = jnp.transpose(hids, (1, 0, 2))
    if backwards:
        out = jnp.flip(out, axis=1)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core_peep(static, w_in, w_hid, b, cell_init, hid_init,
                    w_ci, w_cf, w_co, x, mask):
    return _lstm_core_peep_primal_impl(static, w_in, w_hid, b, cell_init,
                                       hid_init, w_ci, w_cf, w_co, x, mask)


def _lstm_core_peep_fwd(static, w_in, w_hid, b, cell_init, hid_init,
                        w_ci, w_cf, w_co, x, mask):
    return _lstm_core_peep_fwd_impl(static, w_in, w_hid, b, cell_init,
                                    hid_init, w_ci, w_cf, w_co, x, mask)


def _lstm_core_peep_bwd(static, residuals, g_out):
    backwards, grad_clipping, md = static[:3]
    remat, resd = _static_extras(static)
    mmdtype = jnp.dtype(md) if md else None
    (w_in, w_hid, b_p, cell_init_p, hid_init_p, w_ci, w_cf, w_co, x, mask,
     hids, cells, gates_pre, cell0, hid0) = residuals
    T, B, H = hids.shape
    D = x.shape[-1]
    f32 = x.dtype
    if resd is not None:
        hids = hids.astype(f32)
        cells = cells.astype(f32)
        gates_pre = gates_pre.astype(f32)
    if backwards:
        g_out = jnp.flip(g_out, axis=1)
    g_out_t = jnp.transpose(g_out, (1, 0, 2))
    mask_t = jnp.transpose(mask, (1, 0))[..., None]
    cells_prev = jnp.concatenate([cell0[None], cells[:-1]], axis=0)
    w_hid_mm = w_hid.astype(mmdtype) if mmdtype else w_hid
    hids_prev_full = jnp.concatenate([hid0[None], hids[:-1]], axis=0)

    if remat:
        # rebuild the pre-peephole stacked gates exactly as the non-peephole
        # remat does (x @ W_in + b and hids_prev @ W_hid; no recurrence
        # re-run — the peephole contributions are added per-gate below from
        # the saved cells residuals)
        x_tm = jnp.transpose(x, (1, 0, 2))  # (T, B, D); 3-D dots — see the
        # non-peephole backward's sharding note on (T*B, .) flattens
        x_mm = x_tm.astype(mmdtype) if mmdtype else x_tm
        w_in_mm = w_in.astype(mmdtype) if mmdtype else w_in
        xp = (jnp.dot(x_mm, w_in_mm, preferred_element_type=_acc(f32))
              .astype(f32) + b_p.astype(f32))
        hp_mm = (hids_prev_full.astype(mmdtype) if mmdtype
                 else hids_prev_full)
        rec = (jnp.dot(hp_mm, w_hid_mm, preferred_element_type=_acc(f32))
               .astype(f32))
        gates_pre = xp + rec

    def back_step(carry, inputs):
        dcell_next, dhid_next, dw_ci_acc, dw_cf_acc, dw_co_acc = carry
        go, gates, cell_t, cell_prev, m = inputs
        dhid_total = go + dhid_next
        dhid_cand = m * dhid_total
        dcell_cand = m * dcell_next
        # recompute activations; cell_t stands in for the candidate cell
        # (equal where m=1; the m=0 lanes carry zero cotangent)
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
        # peephole gradients use the UNCLIPPED gate cotangents (the clip node
        # sits upstream, on the stacked pre-activations)
        dw_ci_acc = dw_ci_acc + jnp.sum(di_pre * cell_prev, axis=0)
        dw_cf_acc = dw_cf_acc + jnp.sum(df_pre * cell_prev, axis=0)
        dw_co_acc = dw_co_acc + jnp.sum(do_pre * cell_t, axis=0)
        dgates = jnp.concatenate([di_pre, df_pre, dgc, do_pre], axis=-1)
        if grad_clipping:
            dgates = jnp.clip(dgates, -grad_clipping, grad_clipping)
        dg_mm = dgates.astype(mmdtype) if mmdtype else dgates
        dhid_prev = (jnp.dot(dg_mm, w_hid_mm.T, preferred_element_type=_acc(f32))
                     .astype(f32) + (1.0 - m) * dhid_total)
        dcell_prev = (dcell_cand * f + di_pre * w_ci + df_pre * w_cf
                      + (1.0 - m) * dcell_next)
        return (dcell_prev, dhid_prev, dw_ci_acc, dw_cf_acc, dw_co_acc), dgates

    if _pallas_train_ok(B, T, H, f32):
        from ip_avsr_tpu.ops.pallas import lstm_kernel

        (dgates_all, dcell0_g, dhid0_g, dw_ci, dw_cf,
         dw_co) = lstm_kernel.lstm_pallas_peep_bwd_chain(
            g_out_t, gates_pre, cells, cells_prev, mask_t, w_hid_mm,
            w_ci, w_cf, w_co, grad_clipping)
    else:
        zeros = jnp.zeros((B, H), f32)
        zh = jnp.zeros((H,), f32)
        (dcell0_g, dhid0_g, dw_ci, dw_cf, dw_co), dgates_all = jax.lax.scan(
            back_step, (zeros, zeros, zh, zh, zh),
            (g_out_t, gates_pre, cells, cells_prev, mask_t), reverse=True)

    # (T, B)-contracting dot_generals, not (T*B, .) flattens — see the
    # non-peephole backward's sharding note
    x_t = jnp.transpose(x, (1, 0, 2))  # (T, B, D)
    tb = (((0, 1), (0, 1)), ((), ()))
    if mmdtype:
        dg_mm = dgates_all.astype(mmdtype)
        dw_hid = jax.lax.dot_general(
            hids_prev_full.astype(mmdtype), dg_mm, tb,
            preferred_element_type=_acc(f32)).astype(w_hid.dtype)
        dw_in = jax.lax.dot_general(
            x_t.astype(mmdtype), dg_mm, tb,
            preferred_element_type=_acc(f32)).astype(w_in.dtype)
        dx = jnp.dot(dg_mm, w_in.astype(mmdtype).T,
                     preferred_element_type=_acc(f32)).astype(f32)
    else:
        dw_hid = jax.lax.dot_general(
            hids_prev_full, dgates_all, tb,
            preferred_element_type=_acc(f32)).astype(w_hid.dtype)
        dw_in = jax.lax.dot_general(
            x_t, dgates_all, tb,
            preferred_element_type=_acc(f32)).astype(w_in.dtype)
        dx = jnp.dot(dgates_all, w_in.T,
                     preferred_element_type=_acc(f32)).astype(f32)
    db = dgates_all.sum(axis=(0, 1)).astype(b_p.dtype)
    dx = jnp.transpose(dx, (1, 0, 2))
    if backwards:
        dx = jnp.flip(dx, axis=1)
    dcell_init = dcell0_g.sum(axis=0, keepdims=True).astype(cell_init_p.dtype)
    dhid_init = dhid0_g.sum(axis=0, keepdims=True).astype(hid_init_p.dtype)
    dw_ci = dw_ci.astype(w_ci.dtype)
    dw_cf = dw_cf.astype(w_cf.dtype)
    dw_co = dw_co.astype(w_co.dtype)
    dmask = jnp.zeros_like(mask)
    return (dw_in, dw_hid, db, dcell_init, dhid_init, dw_ci, dw_cf, dw_co,
            dx, dmask)


_lstm_core_peep.defvjp(_lstm_core_peep_fwd, _lstm_core_peep_bwd)


# Grouped variant: same batched-weight-gradient strategy with a leading
# group axis, so G independent recurrences cost T (not G*T) sequential
# batched matmuls in BOTH passes.  Inputs arrive pre-flipped/padded/stacked
# from lstm_forward_grouped (those ops are plain jnp, so autodiff routes the
# stacked cotangents back to the per-stream parameter trees).

def _lstm_core_grouped_fwd_impl(static, w_in, w_hid, b, cell0, hid0, x_g, mask_g):
    grad_clipping, md = static
    del grad_clipping
    mmdtype = jnp.dtype(md) if md else None
    G, B, T, D = x_g.shape
    H = w_hid.shape[1]
    f32 = x_g.dtype

    x_mm = x_g.astype(mmdtype) if mmdtype else x_g
    w_in_mm = w_in.astype(mmdtype) if mmdtype else w_in
    w_hid_mm = w_hid.astype(mmdtype) if mmdtype else w_hid
    x_proj = jax.lax.dot_general(
        x_mm.reshape(G, B * T, D), w_in_mm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_acc(f32),
    ).reshape(G, B, T, 4 * H).astype(f32) + b.astype(f32)[:, None, None, :]
    x_proj_t = jnp.transpose(x_proj, (2, 0, 1, 3))  # (T, G, B, 4H)

    def step(carry, inputs):
        cell_prev, hid_prev = carry  # (G, B, H)
        xp, m = inputs
        gates = xp + jax.lax.dot_general(
            hid_prev.astype(w_hid_mm.dtype), w_hid_mm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_acc(f32),
        ).astype(f32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        c_in = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        cell_cand = f * cell_prev + i * c_in
        hid_cand = o * jnp.tanh(cell_cand)
        cell = m * cell_cand + (1.0 - m) * cell_prev
        hid = m * hid_cand + (1.0 - m) * hid_prev
        return (cell, hid), (hid, cell, gates)

    (_, _), (hids, cells, gates_pre) = jax.lax.scan(
        step, (cell0.astype(f32), hid0.astype(f32)), (x_proj_t, mask_g))
    residuals = (w_in, w_hid, x_g, mask_g, hids, cells, gates_pre,
                 cell0.astype(f32), hid0.astype(f32))
    return hids, residuals  # (T, G, B, H)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_core_grouped(static, w_in, w_hid, b, cell0, hid0, x_g, mask_g):
    out, _ = _lstm_core_grouped_fwd_impl(static, w_in, w_hid, b, cell0, hid0,
                                         x_g, mask_g)
    return out


def _lstm_core_grouped_fwd(static, w_in, w_hid, b, cell0, hid0, x_g, mask_g):
    return _lstm_core_grouped_fwd_impl(static, w_in, w_hid, b, cell0, hid0,
                                       x_g, mask_g)


def _lstm_core_grouped_bwd(static, residuals, g_out):
    grad_clipping, md = static
    mmdtype = jnp.dtype(md) if md else None
    w_in, w_hid, x_g, mask_g, hids, cells, gates_pre, cell0, hid0 = residuals
    T, G, B, H = hids.shape
    D = x_g.shape[-1]
    f32 = x_g.dtype
    cells_prev = jnp.concatenate([cell0[None], cells[:-1]], axis=0)
    w_hid_mm = w_hid.astype(mmdtype) if mmdtype else w_hid

    def back_step(carry, inputs):
        dcell_next, dhid_next = carry
        go, gates, cell_t, cell_prev, m = inputs
        dhid_total = go + dhid_next
        dhid_cand = m * dhid_total
        dcell_cand = m * dcell_next
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        c_in = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        tc = jnp.tanh(cell_t)
        do = dhid_cand * tc
        dcell_cand = dcell_cand + dhid_cand * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [dcell_cand * c_in * i * (1.0 - i),
             dcell_cand * cell_prev * f * (1.0 - f),
             dcell_cand * i * (1.0 - c_in * c_in),
             do * o * (1.0 - o)],
            axis=-1)
        if grad_clipping:
            dgates = jnp.clip(dgates, -grad_clipping, grad_clipping)
        dg_mm = dgates.astype(mmdtype) if mmdtype else dgates
        dhid_prev = jax.lax.dot_general(
            dg_mm, w_hid_mm,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_acc(f32),
        ).astype(f32) + (1.0 - m) * dhid_total
        dcell_prev = dcell_cand * f + (1.0 - m) * dcell_next
        return (dcell_prev, dhid_prev), dgates

    zeros = jnp.zeros((G, B, H), f32)
    (dcell0_g, dhid0_g), dgates_all = jax.lax.scan(
        back_step, (zeros, zeros),
        (g_out, gates_pre, cells, cells_prev, mask_g), reverse=True)

    hids_prev = jnp.concatenate([hid0[None], hids[:-1]], axis=0)
    # (T, G, B, .) stacks contracted over (T, B) with G as the batch dim —
    # dot_generals, not (G, T*B, .) flattens, for the same sharding reason
    # as the ungrouped backward (a time-major merge of the sharded B axis
    # forces batch all-gathers under data parallelism)
    x_t = jnp.transpose(x_g, (2, 0, 1, 3))  # (G, B, T, D) -> (T, G, B, D)
    gtb = (((0, 2), (0, 2)), ((1,), (1,)))  # contract (T, B), batch G

    def wgrad(a, bb, out_dtype):
        if mmdtype:
            a, bb = a.astype(mmdtype), bb.astype(mmdtype)
        return jax.lax.dot_general(
            a, bb, dimension_numbers=gtb,
            preferred_element_type=_acc(f32)).astype(out_dtype)

    dw_hid = wgrad(hids_prev, dgates_all, w_hid.dtype)  # (G, H, 4H)
    dw_in = wgrad(x_t, dgates_all, w_in.dtype)          # (G, D, 4H)
    db = dgates_all.sum(axis=(0, 2))  # (G, 4H)
    if mmdtype:
        dx = jax.lax.dot_general(
            dgates_all.astype(mmdtype), w_in.astype(mmdtype),
            dimension_numbers=(((3,), (2,)), ((1,), (0,))),
            preferred_element_type=_acc(f32)).astype(f32)
    else:
        dx = jax.lax.dot_general(
            dgates_all, w_in,
            dimension_numbers=(((3,), (2,)), ((1,), (0,))),
            preferred_element_type=_acc(f32)).astype(f32)
    dx = dx.transpose(0, 2, 1, 3)  # (G, T, B, D) -> (G, B, T, D)
    dmask = jnp.zeros_like(mask_g)
    return dw_in, dw_hid, db, dcell0_g, dhid0_g, dx, dmask


_lstm_core_grouped.defvjp(_lstm_core_grouped_fwd, _lstm_core_grouped_bwd)


def lstm_forward_grouped(
    params_list,
    xs,
    mask: Optional[jnp.ndarray],
    backwards_flags,
    grad_clipping: float = 5.0,
    matmul_dtype=None,
    use_custom_vjp: bool = True,
):
    """Run G independent LSTMs as ONE scan with stacked (batched) weights.

    The reference's multi-stream models run each stream's LSTM (and the
    aggregator's forward/backward halves) as separate recurrences; on TPU
    that serializes G*T small steps.  Independent LSTMs over the same mask
    and hidden size can instead be stacked on a leading group axis: the input
    projections become one batched matmul, and the scan body's recurrence is
    a single (G, B, H) x (G, H, 4H) batched matmul — T sequential steps total
    instead of G*T.

    Inputs with different feature dims are zero-padded to the widest and the
    corresponding w_in rows zero-padded (zero inputs contribute nothing and
    receive zero gradient, so semantics and training are unchanged).
    Backward-direction members have their inputs/mask pre-flipped in time and
    outputs flipped back, reproducing Lasagne's ``backwards=True``.

    Requirements: same hidden size, same peephole setting, same (B, T) mask.
    Returns a list of (B, T, H) outputs in input order.
    """
    G = len(params_list)
    assert G == len(xs) == len(backwards_flags)
    B, T = xs[0].shape[0], xs[0].shape[1]
    H = lstm_params_hidden_size(params_list[0])
    use_peepholes = "w_cell_to_ingate" in params_list[0]
    f32 = xs[0].dtype

    if mask is None:
        mask = jnp.ones((B, T), dtype=jnp.float32)
    mask = mask.astype(jnp.float32)

    d_max = max(int(x.shape[-1]) for x in xs)

    def pad_x(x):
        d = int(x.shape[-1])
        return x if d == d_max else jnp.pad(x, ((0, 0), (0, 0), (0, d_max - d)))

    def pad_w(w):
        d = int(w.shape[0])
        return w if d == d_max else jnp.pad(w, ((0, d_max - d), (0, 0)))

    xs_stack = []
    masks = []
    for x, bwd in zip(xs, backwards_flags):
        x = pad_x(x)
        xs_stack.append(jnp.flip(x, axis=1) if bwd else x)
        masks.append(jnp.flip(mask, axis=1) if bwd else mask)
    x_g = jnp.stack(xs_stack)  # (G, B, T, Dmax)
    mask_g = jnp.transpose(jnp.stack(masks), (2, 0, 1))[..., None]  # (T, G, B, 1)

    w_in = jnp.stack([pad_w(p["w_in"]) for p in params_list])  # (G, Dmax, 4H)
    w_hid = jnp.stack([p["w_hid"] for p in params_list])  # (G, H, 4H)
    b = jnp.stack([p["b"] for p in params_list]).astype(f32)  # (G, 4H)
    # carry must be f32 regardless of the stored param dtype (bf16 weights),
    # or the scan's carry-in/carry-out types diverge
    cell0 = jnp.stack([jnp.broadcast_to(p["cell_init"], (B, H))
                       for p in params_list]).astype(f32)
    hid0 = jnp.stack([jnp.broadcast_to(p["hid_init"], (B, H))
                      for p in params_list]).astype(f32)
    if use_peepholes:
        w_ci = jnp.stack([p["w_cell_to_ingate"] for p in params_list])[:, None, :]
        w_cf = jnp.stack([p["w_cell_to_forgetgate"] for p in params_list])[:, None, :]
        w_co = jnp.stack([p["w_cell_to_outgate"] for p in params_list])[:, None, :]

    if use_custom_vjp and not use_peepholes:
        static = (float(grad_clipping or 0.0),
                  jnp.dtype(matmul_dtype).name if matmul_dtype is not None else None)
        hids = _lstm_core_grouped(static, w_in, w_hid, b, cell0, hid0, x_g,
                                  mask_g.astype(jnp.float32))
        hids = jnp.transpose(hids, (1, 2, 0, 3))  # (T,G,B,H) -> (G,B,T,H)
        outs = []
        for g, bwd in enumerate(backwards_flags):
            out = hids[g]
            outs.append(jnp.flip(out, axis=1) if bwd else out)
        return outs

    if matmul_dtype is not None:
        x_mm, w_in_mm, w_hid_mm = (x_g.astype(matmul_dtype), w_in.astype(matmul_dtype),
                                   w_hid.astype(matmul_dtype))
    else:
        x_mm, w_in_mm, w_hid_mm = x_g, w_in, w_hid

    # (G, B*T, D) @ (G, D, 4H) -> one batched MXU matmul for all gates/steps
    x_proj = jax.lax.dot_general(
        x_mm.reshape(G, B * T, d_max), w_in_mm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_acc(f32),
    ).reshape(G, B, T, 4 * H).astype(f32) + b[:, None, None, :]
    x_proj_t = jnp.transpose(x_proj, (2, 0, 1, 3))  # (T, G, B, 4H)

    def step(carry, inputs):
        cell_prev, hid_prev = carry  # (G, B, H)
        xp, m = inputs  # (G, B, 4H), (G, B, 1)
        hid_mm = hid_prev.astype(w_hid_mm.dtype)
        rec = jax.lax.dot_general(
            hid_mm, w_hid_mm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=_acc(f32),
        ).astype(f32)
        gates = xp + rec
        if grad_clipping:
            gates = grad_clip(gates, grad_clipping)
        ingate, forgetgate, cell_input, outgate = jnp.split(gates, 4, axis=-1)
        if use_peepholes:
            ingate = ingate + cell_prev * w_ci
            forgetgate = forgetgate + cell_prev * w_cf
        ingate = jax.nn.sigmoid(ingate)
        forgetgate = jax.nn.sigmoid(forgetgate)
        cell_input = jnp.tanh(cell_input)
        cell = forgetgate * cell_prev + ingate * cell_input
        if use_peepholes:
            outgate = outgate + cell * w_co
        outgate = jax.nn.sigmoid(outgate)
        hid = outgate * jnp.tanh(cell)
        cell = m * cell + (1.0 - m) * cell_prev
        hid = m * hid + (1.0 - m) * hid_prev
        return (cell, hid), hid

    (_, _), hids = jax.lax.scan(step, (cell0, hid0), (x_proj_t, mask_g))
    # (T, G, B, H) -> per-group (B, T, H)
    hids = jnp.transpose(hids, (1, 2, 0, 3))
    outs = []
    for g, bwd in enumerate(backwards_flags):
        out = hids[g]
        outs.append(jnp.flip(out, axis=1) if bwd else out)
    return outs


def can_group_lstms(params_list) -> bool:
    """Grouped execution requires equal hidden sizes and peephole settings."""
    if len(params_list) < 2:
        return False
    H = lstm_params_hidden_size(params_list[0])
    peep = "w_cell_to_ingate" in params_list[0]
    return all(lstm_params_hidden_size(p) == H and ("w_cell_to_ingate" in p) == peep
               for p in params_list)


def blstm_forward(
    fwd_params: dict,
    bwd_params: dict,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    merge: str = "sum",
    grad_clipping: float = 5.0,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Bidirectional LSTM; ``merge`` is "sum" (ElemwiseSumLayer, the reference
    default) or "concat"."""
    f = lstm_forward(fwd_params, x, mask, False, grad_clipping, matmul_dtype)
    b = lstm_forward(bwd_params, x, mask, True, grad_clipping, matmul_dtype)
    if merge == "sum":
        return f + b
    if merge == "concat":
        return jnp.concatenate([f, b], axis=-1)
    raise ValueError(f"unknown merge: {merge}")


def init_blstm_params(key, input_dim, hidden, w_init=inits.glorot_uniform,
                      use_peepholes=False, dtype=jnp.float32):
    kf, kb = jax.random.split(key)
    return (
        init_lstm_params(kf, input_dim, hidden, w_init, use_peepholes, dtype=dtype),
        init_lstm_params(kb, input_dim, hidden, w_init, use_peepholes, dtype=dtype),
    )


def last_valid_step(outputs: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Hidden state at each sequence's last *timestep* (index -1).

    PRECONDITION: ``outputs`` must come from a mask-CARRYING recurrence (this
    module's lstm_forward / the Pallas LSTM kernel), whose padded tail holds
    the last valid output.  Then slicing index -1 (SliceLayer(l_sum, -1),
    e.g. modelzoo/deltanet.py:48) reads the last-valid forward state plus —
    in the BLSTM case — the backward layer's learned initial state, exactly
    what the reference computes; ``mask`` is intentionally unused.  For
    upstream ops that zero (rather than carry) padded steps, use
    :func:`last_valid_step_gathered` instead.
    """
    del mask
    return outputs[:, -1, :]


def last_valid_step_gathered(outputs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gather each sequence's output at its true last valid frame.

    Equivalent to :func:`last_valid_step` for a mask-carrying FORWARD
    recurrence (tested), and correct even for upstreams that zero padded
    steps.  NOT reference-equivalent for summed BLSTM outputs: there the
    reference's index -1 deliberately reads the backward layer's learned
    initial state at the padded tail, not its last-valid-frame state.
    All-pad rows index frame 0.
    """
    lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)
    idx = jnp.maximum(lengths - 1, 0)
    return jnp.take_along_axis(outputs, idx[:, None, None], axis=1)[:, 0, :]
