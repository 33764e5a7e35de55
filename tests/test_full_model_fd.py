"""Autodiff-independent validation of the FULL training math.

Every other gradient test in the suite compares two autodiff paths (custom
VJP vs plain autodiff), which would agree on a shared semantic mistake in
the loss/fusion/BN wiring above the LSTM cores.  These tests can't:

* ``test_full_model_finite_differences`` — central finite differences of
  dLoss/dtheta at FLOAT64 over small composer configs covering BN-train,
  peepholes, adasum fusion, lstm_remat, dropout, and both loss heads
  (the double-softmax temporal loss, custom/objectives.py:4-39, and the
  masked last-step cross-entropy).  The model's matmul accumulation dtype
  widens to f64 automatically (ops/lstm._acc, models/encoder), so the FD
  comparison runs at ~1e-7 tolerance instead of f32 noise.

* ``test_optimizer_trajectory_vs_independent_numpy`` — an N-step update
  trajectory where the optimizer math (adam / adadelta, the reference's
  formulas from lasagne.updates via custom/updates.py:35-99) is applied by
  an INDEPENDENT NumPy loop at f64, and each point of the trajectory is
  cross-checked against (a) the Trainer's compiled train_step params and
  (b) the pure-NumPy reference_impl forward's loss — so the composed
  grad -> update -> new-params -> new-loss chain matches across three
  implementations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.ops import losses

ENC_NL = ("sigmoid", "sigmoid", "sigmoid", "linear")
ENC_SH = (14, 10, 8, 5)
K = dict(lstm_size=5, window=3, output_classes=6)


def _with(cfg, **kw):
    return adenet.AdeNetConfig(**{**cfg.__dict__, **kw})


# configs chosen to cover every semantic seam above the LSTM cores:
#   bn        — adenet_v1: encoder + BatchNorm TRAIN-mode statistics + concat
#               of delta(encoder) with the raw DCT stream + 2-layer BLSTM agg
#   peep_ada  — peepholes (the reference default) + learned adasum fusion
#   remat     — lstm_remat training residuals + sum fusion, per-step head
#   trimodal  — 3 streams with dropout (fixed rng) + last-step CE head
#   nodelta   — no DeltaLayer ablation + concat fusion
CONFIGS = {
    "bn": lambda: _shrink(zoo.adenet_v1(12, 6, **K)),
    "peep_ada": lambda: zoo.adenet_v2(12, 6, ENC_SH, ENC_NL,
                                      fusiontype="adasum",
                                      use_peepholes=True, **K),
    "remat": lambda: _with(zoo.adenet_v2(12, 6, ENC_SH, ENC_NL, **K),
                           lstm_remat=True),
    "trimodal": lambda: _shrink(zoo.adenet_v3(12, 6, 12, **K)),
    "nodelta": lambda: zoo.adenet_v2_nodelta(
        12, 8, (ENC_NL, ENC_SH), (ENC_NL, ENC_SH), lstm_size=5,
        output_classes=6),
    # r4 additions: the forward-only aggregator (the streaming head path)
    # with a NON-LSTM passthrough stream feeding concat fusion, and the
    # avnet composer (rectified encoders, no-encoder substream, peepholes)
    "fwd_agg_passthru": lambda: _with(
        zoo.adenet_v2(12, 6, ENC_SH, ENC_NL, fusiontype="concat", **K),
        agg_bidirectional=False,
        streams=tuple([
            zoo.adenet_v2(12, 6, ENC_SH, ENC_NL, **K).streams[0],
            dataclasses.replace(
                zoo.adenet_v2(12, 6, ENC_SH, ENC_NL, **K).streams[1],
                use_lstm=False),
        ])),
    "avnet": lambda: __import__(
        "ip_avsr_tpu.models.avnet", fromlist=["avnet_config"]).avnet_config(
            (12, 8), encoder_shapes=ENC_SH,
            encoder_nonlinearities=ENC_NL, lstm_size=5, window=3,
            output_classes=6, no_encoder_for=("s2",)),
}


def _shrink(cfg):
    streams = []
    for s in cfg.streams:
        if s.encoder_shapes and max(s.encoder_shapes) > 64:
            streams.append(dataclasses.replace(s, encoder_shapes=ENC_SH))
        else:
            streams.append(s)
    return adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})


def _loss_fn(cfg, params, inputs, y, mask, rng):
    """The Trainer's loss semantics (train/trainer.py _loss): per-step
    double-softmax temporal loss or masked last-step cross-entropy."""
    out = adenet.adenet_forward(params, cfg, inputs, mask, train=True,
                                dropout_rng=rng)
    if out.ndim == 3:
        y2d = jnp.repeat(y[:, None], mask.shape[1], axis=1)
        return losses.temporal_softmax_loss(out, y2d, mask)
    w = jnp.sum(mask, axis=1) > 0
    return losses.categorical_crossentropy_masked(out, y, w)


def _make_case(cfg, B=3, T=6, seed=0, dtype=np.float64):
    rng = np.random.RandomState(seed)
    params = adenet.init_adenet_params(jax.random.PRNGKey(seed), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x, dtype)), params)
    inputs = [jnp.asarray(rng.randn(B, T, s.input_dim).astype(dtype))
              for s in cfg.streams]
    lens = rng.randint(max(T // 2, 2), T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(dtype))
    y = jnp.asarray(rng.randint(0, cfg.output_classes, B).astype(np.int32))
    return params, inputs, y, mask


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_full_model_finite_differences(name):
    with jax.enable_x64(True):
        cfg = CONFIGS[name]()
        params, inputs, y, mask = _make_case(cfg)
        drop_rng = jax.random.PRNGKey(7)

        leaves, treedef = jax.tree_util.tree_flatten(params)
        sizes = [int(np.prod(l.shape)) for l in leaves]
        offsets = np.cumsum([0] + sizes)
        total = offsets[-1]

        def unflatten(vec):
            return jax.tree_util.tree_unflatten(treedef, [
                jnp.asarray(vec[offsets[i]:offsets[i + 1]])
                .reshape(leaves[i].shape).astype(jnp.float64)
                for i in range(len(leaves))])

        loss_vec = jax.jit(
            lambda vec: _loss_fn(cfg, unflatten(vec), inputs, y, mask,
                                 drop_rng))
        grad_vec = jax.jit(jax.grad(
            lambda vec: _loss_fn(cfg, unflatten(vec), inputs, y, mask,
                                 drop_rng)))

        base = np.concatenate([np.asarray(l, np.float64).ravel()
                               for l in leaves])
        g = np.asarray(grad_vec(jnp.asarray(base)), np.float64)
        assert g.shape == (total,) and np.isfinite(g).all()
        base_loss = float(loss_vec(jnp.asarray(base)))
        assert np.isfinite(base_loss)

        eps = 1e-6

        def fd_dir(d):
            fp = float(loss_vec(jnp.asarray(base + eps * d)))
            fm = float(loss_vec(jnp.asarray(base - eps * d)))
            return (fp - fm) / (2 * eps)

        # (a) random directional derivatives across the whole parameter vector
        dir_rng = np.random.RandomState(11)
        for i in range(6):
            d = dir_rng.randn(total)
            d /= np.linalg.norm(d)
            fd = fd_dir(d)
            analytic = float(np.dot(g, d))
            np.testing.assert_allclose(
                analytic, fd, rtol=5e-7, atol=1e-9,
                err_msg=f"{name}: random direction {i}")

        # (b) per-LEAF directional derivatives: a direction confined to each
        # parameter tensor (BN gamma/beta, adasum coefficients, peephole
        # vectors, every weight matrix) — so a wrong gradient in any single
        # tensor cannot hide inside a whole-vector dot product
        paths = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]]
        for i, path in enumerate(paths):
            d = np.zeros(total)
            seg = dir_rng.randn(sizes[i])
            d[offsets[i]:offsets[i + 1]] = seg / np.linalg.norm(seg)
            fd = fd_dir(d)
            analytic = float(np.dot(g, d))
            np.testing.assert_allclose(
                analytic, fd, rtol=1e-6, atol=1e-9,
                err_msg=f"{name}: leaf {path}")


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)


def _adam_np(params, grads, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """Independent NumPy Adam — the lasagne.updates.adam formulas the
    reference trains with (custom/updates.py:35-99 with a constant lr map)."""
    a_t = lr * np.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

    def upd(p, g, m_, v_):
        m_t = b1 * m_ + (1.0 - b1) * g
        v_t = b2 * v_ + (1.0 - b2) * g * g
        return p - a_t * m_t / (np.sqrt(v_t) + eps), m_t, v_t

    out = jax.tree_util.tree_map(upd, params, grads, m, v)
    pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x[i], out, is_leaf=lambda x: isinstance(x, tuple))
    return pick(0), pick(1), pick(2)


def _adadelta_np(params, grads, accu, dacc, lr=1.0, rho=0.95, eps=1e-6):
    """Independent NumPy adadelta (lasagne.updates.adadelta,
    oulu/trimodal_with_val.py:390)."""

    def upd(p, g, a, d):
        a_t = rho * a + (1.0 - rho) * g * g
        u = g * np.sqrt(d + eps) / np.sqrt(a_t + eps)
        d_t = rho * d + (1.0 - rho) * u * u
        return p - lr * u, a_t, d_t

    out = jax.tree_util.tree_map(upd, params, grads, accu, dacc)
    pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x[i], out, is_leaf=lambda x: isinstance(x, tuple))
    return pick(0), pick(1), pick(2)


def _momentum_np(params, grads, vel, lr, mu=0.9):
    """Independent NumPy momentum (lasagne.updates.momentum)."""

    def upd(p, g, v):
        v_t = mu * v - lr * g
        return p + v_t, v_t

    out = jax.tree_util.tree_map(upd, params, grads, vel)
    pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x[i], out, is_leaf=lambda x: isinstance(x, tuple))
    return pick(0), pick(1)


def _adam_vlr_np(params, grads, m, v, t, lr_map, b1=0.9, b2=0.999, eps=1e-8):
    """Independent NumPy adam with a per-parameter lr map
    (custom/updates.py:35-99 — the reference's variable-learning-rate
    adam)."""
    corr = np.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)

    def upd(p, g, m_, v_, lr):
        m_t = b1 * m_ + (1.0 - b1) * g
        v_t = b2 * v_ + (1.0 - b2) * g * g
        return p - (lr * corr) * m_t / (np.sqrt(v_t) + eps), m_t, v_t

    out = jax.tree_util.tree_map(upd, params, grads, m, v, lr_map)
    pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x[i], out, is_leaf=lambda x: isinstance(x, tuple))
    return pick(0), pick(1), pick(2)


@pytest.mark.parametrize("optname", ["adam", "adadelta", "momentum",
                                     "adam_vlr"])
def test_optimizer_trajectory_vs_independent_numpy(optname):
    """N update steps applied by an independent NumPy loop at f64 must track
    the Trainer's compiled f32 train_step trajectory, and the NumPy-updated
    params must produce the same loss through the pure-NumPy reference
    forward (reference_impl.adenet_forward_np + the reference loss formula)
    at every step."""
    from ip_avsr_tpu.reference_impl import adenet_forward_np
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    # dropout-free per-step config: the double-softmax temporal loss is the
    # head the reference trains the majority-vote zoo with
    cfg = zoo.adenet_v2(12, 6, ENC_SH, ENC_NL, **K)
    B, T = 4, 6
    params32, inputs, y, mask = _make_case(cfg, B=B, T=T, seed=3,
                                           dtype=np.float32)
    lr = 0.05 if optname == "adadelta" else 0.01
    n_steps = 5

    lr_map_config = {"output": lr * 2} if optname == "adam_vlr" else None
    trainer = Trainer(cfg, TrainOptions(optimizer=optname, learning_rate=lr,
                                        lr_map_config=lr_map_config,
                                        log_fn=lambda *_: None))
    t_params = jax.tree_util.tree_map(jnp.array, params32)
    if optname == "adam_vlr":
        trainer._finalize_optimizer(t_params)
    t_state = trainer.optimizer.init(t_params)
    rng0 = jax.random.PRNGKey(0)
    lr_arr = jnp.asarray(lr, jnp.float32)
    trainer_losses = []
    for _ in range(n_steps):
        t_params, t_state, loss = trainer.train_step(
            t_params, t_state, inputs, y, mask, rng0, lr_arr)
        trainer_losses.append(float(loss))

    # independent NumPy trajectory at f64: grads from the f64 model (FD-
    # validated above), update math and loss bookkeeping in NumPy
    def np_loss(params_np):
        out = adenet_forward_np(params_np, cfg, [np.asarray(x) for x in inputs],
                                np.asarray(mask))
        # reference temporal softmax loss (custom/objectives.py:4-39):
        # second softmax over the probability rows, masked NLL / frames
        N, TT, C = out.shape
        x2 = out.reshape(N * TT, C)
        e = np.exp(x2 - x2.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        yy = np.repeat(np.asarray(y)[:, None], TT, axis=1).reshape(N * TT)
        m = np.asarray(mask).reshape(N * TT)
        nll = -np.log(probs[np.arange(N * TT), yy])
        return float((nll * m).sum() / m.sum())

    with jax.enable_x64(True):
        grad_fn = jax.jit(jax.grad(
            lambda p: _loss_fn(cfg, p, [x.astype(jnp.float64) for x in inputs],
                               y, mask.astype(jnp.float64),
                               jax.random.PRNGKey(7))))
        n_params = _np_tree(params32)
        zeros = jax.tree_util.tree_map(np.zeros_like, n_params)
        s1, s2 = zeros, jax.tree_util.tree_map(np.zeros_like, n_params)
        if optname == "adam_vlr":
            from ip_avsr_tpu.train.optimizers import generate_lr_map

            lr_map = jax.tree_util.tree_map(
                float, generate_lr_map(n_params, lr_map_config, lr))
        numpy_losses = []
        for step in range(1, n_steps + 1):
            numpy_losses.append(np_loss(n_params))
            g = _np_tree(grad_fn(jax.tree_util.tree_map(jnp.asarray, n_params)))
            if optname == "adam":
                n_params, s1, s2 = _adam_np(n_params, g, s1, s2, step, lr)
            elif optname == "adam_vlr":
                n_params, s1, s2 = _adam_vlr_np(n_params, g, s1, s2, step,
                                                lr_map)
            elif optname == "momentum":
                n_params, s1 = _momentum_np(n_params, g, s1, lr)
            else:
                n_params, s1, s2 = _adadelta_np(n_params, g, s1, s2, lr)
        final_np_loss = np_loss(n_params)

    # loss BEFORE each update must match what the Trainer's step reported
    np.testing.assert_allclose(numpy_losses, trainer_losses, rtol=2e-4,
                               atol=1e-5)
    # final parameters must coincide leaf-wise (f32 step noise accumulates
    # over 5 steps; updates are O(lr))
    flat_t = jax.tree_util.tree_flatten_with_path(_np_tree(t_params))[0]
    flat_n = jax.tree_util.tree_flatten_with_path(n_params)[0]
    for (path, a), (_, b) in zip(flat_t, flat_n):
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=5e-5,
            err_msg=f"{optname}: {jax.tree_util.keystr(path)}")
    # and the two final models agree on the loss
    t_final_loss = float(_loss_fn(
        cfg, t_params, inputs, y, mask, jax.random.PRNGKey(7)))
    np.testing.assert_allclose(t_final_loss, final_np_loss, rtol=2e-4,
                               atol=1e-5)
