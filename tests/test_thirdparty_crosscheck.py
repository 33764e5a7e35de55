"""Third-party implementation agreement: optimizers vs optax, LSTM vs flax.

The model zoo is cross-checked against an independent NumPy implementation
(reference_impl.py); this file closes the same loop for the update rules in
train/optimizers.py by running multi-step trajectories against optax's
implementations of the same algorithms.

Formulation notes (why each comparison is valid):

* **adadelta** — optax.scale_by_adadelta is the identical formula (eps
  inside BOTH sqrts, E[dx^2] accumulated from the unscaled ratio update),
  so trajectories match to float-associativity noise.
* **momentum / nesterov** — Lasagne keeps the learning rate inside the
  velocity (v_t = mu v - lr g) while optax's `trace` is unitless
  (f_t = g + mu f, update = -lr * (...)); with a CONSTANT lr,
  v_t == -lr * f_t inductively, so the parameter trajectories coincide.
* **adam / adam_vlr** — Lasagne folds the bias corrections into
  a_t = lr sqrt(1-b2^t)/(1-b1^t), which makes its eps equivalent to
  optax's eps/sqrt(1-b2^t); the two agree in the small-eps limit, so the
  comparison runs both at eps=1e-12 (every denominator here is >> 1e-6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ip_avsr_tpu.train import optimizers as opt_lib


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(4, 3).astype(np.float32)),
        "b": jnp.asarray(rng.randn(3).astype(np.float32)),
        "nested": {"g": jnp.asarray(rng.randn(2, 2).astype(np.float32))},
    }


def _grad(params, k):
    """Deterministic, param-dependent gradients so the trajectory feeds
    back on itself (a fixed grad sequence would hide state bugs)."""
    noise = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            np.random.RandomState(1000 + k).randn(*p.shape).astype(np.float32)),
        params)
    return jax.tree_util.tree_map(
        lambda p, n: jnp.tanh(p) + 0.1 * n, params, noise)


def _run_ours(opt, params, steps):
    state = opt.init(params)
    for k in range(steps):
        params, state = opt.apply(params, _grad(params, k), state)
    return params


def _run_optax(tx, params, steps):
    state = tx.init(params)
    for k in range(steps):
        updates, state = tx.update(_grad(params, k), state, params)
        params = optax.apply_updates(params, updates)
    return params


def _assert_trees_close(a, b, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0, atol=atol)


def test_adadelta_trajectory_matches_optax():
    params = _tree()
    ours = _run_ours(opt_lib.adadelta(0.8, rho=0.95, epsilon=1e-6), params, 25)
    ref = _run_optax(optax.adadelta(0.8, rho=0.95, eps=1e-6), params, 25)
    _assert_trees_close(ours, ref, atol=1e-6)


@pytest.mark.parametrize("nesterov", [False, True])
def test_momentum_trajectory_matches_optax(nesterov):
    params = _tree(1)
    ours = _run_ours(opt_lib.momentum(0.05, 0.9, nesterov=nesterov),
                     params, 25)
    ref = _run_optax(optax.sgd(0.05, momentum=0.9, nesterov=nesterov),
                     params, 25)
    _assert_trees_close(ours, ref, atol=1e-5)


def test_adam_trajectory_matches_optax_small_eps():
    params = _tree(2)
    ours = _run_ours(opt_lib.adam(0.02, beta1=0.9, beta2=0.999,
                                  epsilon=1e-12), params, 25)
    ref = _run_optax(optax.adam(0.02, b1=0.9, b2=0.999, eps=1e-12,
                                eps_root=0.0), params, 25)
    _assert_trees_close(ours, ref, atol=1e-5)


def test_lstm_forward_matches_flax_lstmcell():
    """Third-party recurrence agreement: our masked LSTM (ops/lstm.py,
    Lasagne gate order i,f,c,o with a single stacked (D,4H)/(H,4H) layout)
    against flax.linen.LSTMCell with the same weights re-packed into its
    per-gate ii/if/ig/io + hi/hf/hg/ho kernels (bias carried on the h-side
    denses, matching flax's convention).  Full mask, zero initial state —
    flax has neither masking nor learned state, so those stay out of scope
    here (they are pinned against reference_impl elsewhere)."""
    import flax.linen as nn

    from ip_avsr_tpu.ops import lstm as lstm_lib

    D, H, B, T = 3, 5, 4, 7
    rng = np.random.RandomState(0)
    params = lstm_lib.init_lstm_params(jax.random.PRNGKey(1), D, H)
    params = dict(params,
                  cell_init=jnp.zeros((1, H)), hid_init=jnp.zeros((1, H)))
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    ours = lstm_lib.lstm_forward(params, x, mask=jnp.ones((B, T)))

    w_in, w_hid, b = params["w_in"], params["w_hid"], params["b"]
    gates = ["i", "f", "g", "o"]  # flax g == Lasagne cell candidate
    fparams = {"params": {}}
    for k, g in enumerate(gates):
        sl = slice(k * H, (k + 1) * H)
        fparams["params"][f"i{g}"] = {"kernel": w_in[:, sl]}
        fparams["params"][f"h{g}"] = {"kernel": w_hid[:, sl], "bias": b[sl]}

    cell = nn.LSTMCell(features=H)
    carry = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    outs = []
    for t in range(T):
        carry, h = cell.apply(fparams, carry, x[:, t])
        outs.append(h)
    ref = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_adam_vlr_trajectory_matches_optax_multi_transform():
    """Per-parameter learning rates (custom/updates.py adam_vlr) against
    optax.multi_transform routing each leaf to an adam of that rate."""
    params = _tree(3)
    lr_map = {"w": 0.02, "b": 0.005, "nested": {"g": 0.05}}
    ours = _run_ours(opt_lib.adam_vlr(
        jax.tree_util.tree_map(lambda _, r: r, params, lr_map),
        epsilon=1e-12), params, 25)

    labels = {"w": "w", "b": "b", "nested": {"g": "g"}}
    tx = optax.multi_transform(
        {"w": optax.adam(0.02, eps=1e-12, eps_root=0.0),
         "b": optax.adam(0.005, eps=1e-12, eps_root=0.0),
         "g": optax.adam(0.05, eps=1e-12, eps_root=0.0)},
        labels)
    ref = _run_optax(tx, params, 25)
    _assert_trees_close(ours, ref, atol=1e-5)
