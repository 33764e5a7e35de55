"""Tests for core jnp ops: delta layer, LSTM semantics, losses, fusion, voting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu.ops import delta as delta_ops
from ip_avsr_tpu.ops import fusion, losses, lstm, voting
from ip_avsr_tpu.ops import initializers as inits


# ---------------------------------------------------------------------------
# DeltaLayer: brute-force the theano-scan formula
#   delta[t] = sum_{theta=1..W} (y[t+theta] - y[t-theta]) / (2 theta)
# ---------------------------------------------------------------------------

def brute_force_append_delta(x, window):
    T, D = x.shape

    def one_order(v):
        padded = np.concatenate(
            [np.repeat(v[:1], window, 0), v, np.repeat(v[-1:], window, 0)], axis=0
        )
        out = np.zeros_like(v)
        for t in range(T):
            for theta in range(1, window + 1):
                out[t] += (padded[window + t + theta] - padded[window + t - theta]) / (2.0 * theta)
        return out

    d = one_order(x)
    a = one_order(d)
    return np.concatenate([x, d, a], axis=1)


@pytest.mark.parametrize("window", [1, 4, 9])
def test_delta_layer_matches_reference_formula(window):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, 5).astype(np.float32)
    got = np.asarray(delta_ops.delta_layer(jnp.asarray(x), window, use_pallas="never"))
    expected = np.stack([brute_force_append_delta(x[b], window) for b in range(2)])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_delta_layer_output_dim_x3():
    x = jnp.ones((3, 7, 4))
    assert delta_ops.delta_layer(x, 2, use_pallas="never").shape == (3, 7, 12)


def test_delta_reference_inline_example():
    # utils/signal.py:95-101 test input, window=1:
    # delta[t] = (y[t+1] - y[t-1]) / 2 with edge padding
    seq = np.array([[1, 2, 3, 4, 5], [10, 12, 13, 14, 15], [300, 1, 23, 56, 22]],
                   dtype=np.float32).T[None]  # (1, T=5, D=3)? no — rows are features
    # reference sequences are (T, D): interpret as 3 timesteps, 5 features
    seq = np.array([[[1, 2, 3, 4, 5], [10, 12, 13, 14, 15], [300, 1, 23, 56, 22]]],
                   dtype=np.float32)
    out = np.asarray(delta_ops.delta_layer(jnp.asarray(seq), 1, use_pallas="never"))
    expected = np.stack([brute_force_append_delta(seq[0], 1)])
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_delta_pallas_interpret_matches_jnp():
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ip_avsr_tpu.ops.pallas import delta_kernel

    x = np.random.RandomState(1).randn(2, 9, 8).astype(np.float32)
    window, T, D = 3, 9, 8
    kernel = functools.partial(delta_kernel._delta_kernel, window=window, T=T, D=D)
    d, a = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, T, D), jnp.float32),
            jax.ShapeDtypeStruct((2, T, D), jnp.float32),
        ),
        grid=(2,),
        in_specs=[pl.BlockSpec((1, T, D), lambda b: (b, 0, 0))],
        out_specs=(
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((T + 2 * window, D), jnp.float32)],
        interpret=True,
    )(jnp.asarray(x))
    got = jnp.concatenate([jnp.asarray(x), d, a], axis=-1)
    expected = delta_ops.append_delta_coeff(jnp.asarray(x), window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


# ---------------------------------------------------------------------------
# LSTM semantics
# ---------------------------------------------------------------------------

def _params(key, D, H, **kw):
    return lstm.init_lstm_params(key, D, H, **kw)


def brute_force_lstm(params, x, mask, backwards=False):
    """NumPy replica of the Lasagne step recurrences (no grad clipping in fwd)."""
    p = {k: np.asarray(v) for k, v in params.items()}
    B, T, D = x.shape
    H = p["w_hid"].shape[0]
    peep = "w_cell_to_ingate" in p
    if backwards:
        x = x[:, ::-1]
        mask = mask[:, ::-1]
    cell = np.repeat(p["cell_init"], B, 0)
    hid = np.repeat(p["hid_init"], B, 0)
    outs = np.zeros((B, T, H), dtype=np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    for t in range(T):
        gates = x[:, t] @ p["w_in"] + p["b"] + hid @ p["w_hid"]
        i, f, c, o = np.split(gates, 4, axis=1)
        if peep:
            i = i + cell * p["w_cell_to_ingate"]
            f = f + cell * p["w_cell_to_forgetgate"]
        i, f, c = sig(i), sig(f), np.tanh(c)
        new_cell = f * cell + i * c
        if peep:
            o = o + new_cell * p["w_cell_to_outgate"]
        o = sig(o)
        new_hid = o * np.tanh(new_cell)
        m = mask[:, t : t + 1].astype(np.float32)
        cell = m * new_cell + (1 - m) * cell
        hid = m * new_hid + (1 - m) * hid
        outs[:, t] = hid
    if backwards:
        outs = outs[:, ::-1]
    return outs


@pytest.mark.parametrize("backwards", [False, True])
@pytest.mark.parametrize("peep", [False, True])
def test_lstm_forward_matches_reference_recurrence(backwards, peep):
    key = jax.random.PRNGKey(0)
    D, H, B, T = 6, 5, 3, 7
    params = _params(key, D, H, use_peepholes=peep)
    # non-zero learned inits to make mask-carry visible
    params["cell_init"] = jnp.asarray(np.random.RandomState(1).randn(1, H).astype(np.float32))
    params["hid_init"] = jnp.asarray(np.random.RandomState(2).randn(1, H).astype(np.float32))
    x = np.random.RandomState(3).randn(B, T, D).astype(np.float32)
    mask = np.array(
        [[1, 1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 0, 0]], dtype=np.uint8
    )
    got = np.asarray(lstm.lstm_forward(params, jnp.asarray(x), jnp.asarray(mask), backwards))
    expected = brute_force_lstm(params, x, mask, backwards)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_lstm_mask_carries_last_valid_output():
    key = jax.random.PRNGKey(1)
    params = _params(key, 4, 3)
    x = np.random.RandomState(0).randn(1, 6, 4).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0, 0]], dtype=np.uint8)
    out = np.asarray(lstm.lstm_forward(params, jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(out[0, 3], out[0, 2], atol=1e-7)
    np.testing.assert_allclose(out[0, 5], out[0, 2], atol=1e-7)


def test_backward_lstm_padded_tail_is_init_state():
    key = jax.random.PRNGKey(2)
    params = _params(key, 4, 3)
    params["hid_init"] = jnp.asarray(np.full((1, 3), 0.37, np.float32))
    x = np.random.RandomState(0).randn(1, 6, 4).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0]], dtype=np.uint8)
    out = np.asarray(lstm.lstm_forward(params, jnp.asarray(x), jnp.asarray(mask), backwards=True))
    np.testing.assert_allclose(out[0, 4], 0.37, atol=1e-6)
    np.testing.assert_allclose(out[0, 5], 0.37, atol=1e-6)


def test_grad_clip_clips_gradient_not_forward():
    x = jnp.asarray([3.0, -3.0])
    y = lstm.grad_clip(x, 1.0)
    np.testing.assert_allclose(np.asarray(y), [3.0, -3.0])
    g = jax.grad(lambda v: jnp.sum(lstm.grad_clip(v, 1.0) * 10.0))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


def test_blstm_sum_and_concat():
    key = jax.random.PRNGKey(3)
    fp, bp = lstm.init_blstm_params(key, 4, 3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4).astype(np.float32))
    mask = jnp.ones((2, 5), jnp.uint8)
    s = lstm.blstm_forward(fp, bp, x, mask, merge="sum")
    c = lstm.blstm_forward(fp, bp, x, mask, merge="concat")
    assert s.shape == (2, 5, 3)
    assert c.shape == (2, 5, 6)
    np.testing.assert_allclose(np.asarray(c[..., :3] + c[..., 3:]), np.asarray(s), atol=1e-6)


def test_lstm_gradients_flow():
    key = jax.random.PRNGKey(4)
    params = _params(key, 4, 3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4).astype(np.float32))
    mask = jnp.ones((2, 5), jnp.uint8)

    def loss(p):
        return jnp.sum(lstm.lstm_forward(p, x, mask) ** 2)

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    assert np.abs(np.asarray(grads["w_in"])).sum() > 0


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_temporal_softmax_loss_matches_reference_math():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 4, 3).astype(np.float32)  # "probabilities" as the models emit
    y = rng.randint(0, 3, (2, 4))
    mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.uint8)
    got = float(losses.temporal_softmax_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)))

    # reference computation (custom/objectives.py:26-39)
    xf = x.reshape(8, 3)
    probs = np.exp(xf - xf.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    mf = mask.reshape(8)
    expected = -np.sum(mf * np.log(probs[np.arange(8), y.reshape(8)])) / mf.sum()
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_categorical_crossentropy():
    probs = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
    y = jnp.asarray([0, 1])
    got = float(losses.categorical_crossentropy(probs, y))
    np.testing.assert_allclose(got, -(np.log(0.7) + np.log(0.8)) / 2, rtol=1e-6)


def test_l2_regularization_only_matrices():
    params = {"w": jnp.ones((2, 2)), "b": jnp.ones((4,)) * 100}
    assert float(losses.l2_regularization(params, 0.5)) == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# fusion / voting
# ---------------------------------------------------------------------------

def test_fusion_modes():
    a = jnp.ones((2, 3, 4))
    b = jnp.ones((2, 3, 4)) * 2
    np.testing.assert_allclose(np.asarray(fusion.fuse([a, b], "sum")), 3.0)
    ada = fusion.init_adasum_params(2)
    out = fusion.fuse([a, b], "adasum", ada)
    np.testing.assert_allclose(np.asarray(out), 3.0)  # coeffs init 1.0
    cat = fusion.fuse([a, b], "concat")
    assert cat.shape == (2, 3, 8)
    assert fusion.fused_dim([4, 4], "sum") == 4
    assert fusion.fused_dim([4, 4], "concat") == 8


def test_majority_voting_layer():
    # reference fixture (custom/layers.py:231-246)
    a = jnp.asarray(
        [[[1, 2, 3], [1, 2, 3], [1, 2, 3]],
         [[1, 3, 1], [1, 3, 1], [1, 3, 1]],
         [[5, 0, 0], [0, 5, 0], [0, 0, 5]],
         [[1, 0, 0], [0, 1, 0], [1, 0, 0]]],
        jnp.float32,
    )
    out = np.asarray(voting.majority_voting_layer(a, 3))
    votes = np.array([[0, 0, 3], [0, 3, 0], [1, 1, 1], [2, 1, 0]], np.float32)
    expected = np.exp(votes) / np.exp(votes).sum(axis=1, keepdims=True)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_masked_majority_vote():
    probs = np.zeros((2, 4, 3), np.float32)
    probs[0, :, 1] = 1.0  # all frames vote class 1
    probs[1, :2, 2] = 1.0  # valid frames vote class 2
    probs[1, 2:, 0] = 1.0  # pad frames (masked) vote class 0 — must be ignored
    mask = np.array([[1, 1, 1, 1], [1, 1, 0, 0]], np.uint8)
    got = voting.masked_majority_vote(probs, mask)
    np.testing.assert_array_equal(got, [1, 2])


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def test_initializer_registry():
    key = jax.random.PRNGKey(0)
    for name in ["glorot", "norm", "uniform", "ortho"]:
        fn = inits.select_weight_init(name)
        w = fn(key, (8, 8))
        assert w.shape == (8, 8)
    q = np.asarray(inits.orthogonal(key, (8, 8)))
    np.testing.assert_allclose(q @ q.T, np.eye(8), atol=1e-5)
