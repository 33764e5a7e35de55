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

from typing import Optional

import jax
import jax.numpy as jnp

from ip_avsr_tpu.ops import initializers as inits


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
) -> jnp.ndarray:
    """Run a masked LSTM over ``x`` (B, T, D); returns hidden states (B, T, H).

    ``matmul_dtype`` (e.g. jnp.bfloat16) casts matmul *operands* for MXU
    throughput while keeping f32 accumulation and state.
    """
    B, T, D = x.shape
    H = lstm_params_hidden_size(params)
    use_peepholes = "w_cell_to_ingate" in params
    f32 = x.dtype

    if mask is None:
        mask = jnp.ones((B, T), dtype=jnp.float32)
    mask = mask.astype(jnp.float32)

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
        jnp.dot(x_mm.reshape(B * T, D), w_in_mm, preferred_element_type=jnp.float32)
        .reshape(B, T, 4 * H)
        .astype(f32)
        + b
    )
    x_proj_t = jnp.transpose(x_proj, (1, 0, 2))  # (T, B, 4H)
    mask_t = jnp.transpose(mask, (1, 0))[..., None]  # (T, B, 1)

    cell0 = jnp.broadcast_to(params["cell_init"], (B, H)).astype(f32)
    hid0 = jnp.broadcast_to(params["hid_init"], (B, H)).astype(f32)

    w_hid_mm = w_hid.astype(matmul_dtype) if matmul_dtype is not None else w_hid

    def step(carry, inputs):
        cell_prev, hid_prev = carry
        xp, m = inputs
        hid_mm = hid_prev.astype(w_hid_mm.dtype)
        gates = xp + jnp.dot(hid_mm, w_hid_mm, preferred_element_type=jnp.float32).astype(f32)
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

    (_, _), hids = jax.lax.scan(step, (cell0, hid0), (x_proj_t, mask_t))
    out = jnp.transpose(hids, (1, 0, 2))  # (B, T, H)
    if backwards:
        out = jnp.flip(out, axis=1)
    return out


def lstm_forward_grouped(
    params_list,
    xs,
    mask: Optional[jnp.ndarray],
    backwards_flags,
    grad_clipping: float = 5.0,
    matmul_dtype=None,
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

    if matmul_dtype is not None:
        x_mm, w_in_mm, w_hid_mm = (x_g.astype(matmul_dtype), w_in.astype(matmul_dtype),
                                   w_hid.astype(matmul_dtype))
    else:
        x_mm, w_in_mm, w_hid_mm = x_g, w_in, w_hid

    # (G, B*T, D) @ (G, D, 4H) -> one batched MXU matmul for all gates/steps
    x_proj = jax.lax.dot_general(
        x_mm.reshape(G, B * T, d_max), w_in_mm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, B, T, 4 * H).astype(f32) + b[:, None, None, :]
    x_proj_t = jnp.transpose(x_proj, (2, 0, 1, 3))  # (T, G, B, 4H)

    def step(carry, inputs):
        cell_prev, hid_prev = carry  # (G, B, H)
        xp, m = inputs  # (G, B, 4H), (G, B, 1)
        hid_mm = hid_prev.astype(w_hid_mm.dtype)
        rec = jax.lax.dot_general(
            hid_mm, w_hid_mm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
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
