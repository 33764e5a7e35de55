"""mesh_mode='shard_map': explicit per-device data parallelism.

Contract: numerically identical to both the single-device step and the
GSPMD mesh path (for dropout-free models), while keeping every shape inside
the step body local so auto-dispatched Pallas kernels stay usable on
multi-chip TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.train.trainer import Trainer, TrainOptions


def _setup(output_mode="per_step"):
    if output_mode == "per_step":
        cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=8, output_classes=4)
    else:
        cfg = zoo.lstm_classifier_baseline(10, lstm_size=8, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 7
    x = rng.randn(B, T, 10).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)
    return cfg, params, x, mask, y


def _options(**kw):
    # equality tests use plain momentum: its update is proportional to the
    # gradient, so float tolerances compare meaningfully (adam's first step
    # is ~sign(grad)*lr, which amplifies reduction-order noise on near-zero
    # gradient components into full sign flips)
    kw.setdefault("optimizer", "momentum")
    kw.setdefault("num_epoch", 1)
    kw.setdefault("epochsize", 2)
    kw.setdefault("batchsize", 8)
    kw.setdefault("learning_rate", 1e-3)
    return TrainOptions(log_fn=lambda *_: None, **kw)


@pytest.mark.parametrize("output_mode", ["per_step", "last_step"])
def test_shard_map_step_equals_single_device(output_mode):
    cfg, params, x, mask, y = _setup(output_mode)

    single = Trainer(cfg, _options())
    sm = Trainer(cfg, _options(use_mesh=True, mesh_mode="shard_map"))

    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731
    # (train_step donates params/opt_state, so each call gets its own copy)
    args1 = single._device_batch([x], y, mask)
    p0 = fresh()
    p1, s1, l1 = single.train_step(p0, single.optimizer.init(p0),
                                   args1[0], args1[1], args1[2],
                                   jax.random.PRNGKey(3),
                                   jnp.asarray(1e-3, jnp.float32))

    args2 = sm._device_batch([x], y, mask)
    p0b = fresh()
    p2, s2, l2 = sm.train_step(p0b, sm.optimizer.init(p0b),
                               args2[0], args2[1], args2[2],
                               jax.random.PRNGKey(3),
                               jnp.asarray(1e-3, jnp.float32))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    e1 = float(single.eval_cost(params, *args1))
    e2 = float(sm.eval_cost(params, *args2))
    np.testing.assert_allclose(e1, e2, rtol=1e-5)

    pr1 = np.asarray(single.predict(params, args1[0], args1[2]))
    pr2 = np.asarray(sm.predict(params, args2[0], args2[2]))
    np.testing.assert_allclose(pr1, pr2, rtol=1e-5, atol=1e-6)


def test_shard_map_equals_gspmd_mesh():
    cfg, params, x, mask, y = _setup()
    gspmd = Trainer(cfg, _options(use_mesh=True))
    sm = Trainer(cfg, _options(use_mesh=True, mesh_mode="shard_map"))

    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731
    for tr_a, tr_b in [(gspmd, sm)]:
        a = tr_a._device_batch([x], y, mask)
        b = tr_b._device_batch([x], y, mask)
        pa0, pb0 = fresh(), fresh()
        pa, _, la = tr_a.train_step(pa0, tr_a.optimizer.init(pa0),
                                    a[0], a[1], a[2], jax.random.PRNGKey(5),
                                    jnp.asarray(1e-3, jnp.float32))
        pb, _, lb = tr_b.train_step(pb0, tr_b.optimizer.init(pb0),
                                    b[0], b[1], b[2], jax.random.PRNGKey(5),
                                    jnp.asarray(1e-3, jnp.float32))
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
        for u, v in zip(jax.tree_util.tree_leaves(pa),
                        jax.tree_util.tree_leaves(pb)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-6)


def _flat_corpus(n_videos, dim=8, classes=3, seed=1):
    rng = np.random.RandomState(seed)
    lens = rng.randint(4, 8, n_videos)
    y_video = rng.randint(0, classes, n_videos)
    frames, y_frames = [], []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    return (np.concatenate(frames).astype(np.float32),
            np.concatenate(y_frames), lens)


def test_shard_map_fit_learns():
    """Separable synthetic data: a short shard_map fit improves CR."""
    X, y, lens = _flat_corpus(48)
    Xv, yv, lensv = _flat_corpus(12, seed=2)
    cfg = zoo.lstm_classifier_majority_vote(8, lstm_size=12, output_classes=3)
    tr = Trainer(cfg, _options(num_epoch=6, epochsize=6, batchsize=16,
                               learning_rate=0.01, optimizer="adam",
                               use_mesh=True, mesh_mode="shard_map",
                               prefetch_batches=False))
    result = tr.fit(([X], y, lens), ([Xv], yv, lensv), ([Xv], yv, lensv))
    assert result.class_rate[-1] > 0.6


def _tiny_adenet_v1():
    """adenet_v1 (batch-normalized encoder stream, ref modelzoo/adenet_v1.py:82)
    shrunk to test size."""
    cfg = zoo.adenet_v1(12, 6, lstm_size=8, window=3, output_classes=4)
    s0 = adenet.StreamSpec(**{**cfg.streams[0].__dict__,
                              "encoder_shapes": (10, 8, 6, 5),
                              "encoder_nonlinearities": ("sigmoid",) * 3 + ("linear",)})
    return adenet.AdeNetConfig(**{**cfg.__dict__, "streams": [s0, cfg.streams[1]]})


def test_shard_map_synced_batchnorm_equals_gspmd_and_single():
    """Batch-norm streams train under mesh_mode='shard_map' with CROSS-SHARD
    statistics (two-pass psum'd moments): one train step produces the same
    loss, parameters, AND updated BN running averages as the GSPMD mesh path
    and the single-device step."""
    cfg = _tiny_adenet_v1()
    assert any(s.use_batchnorm for s in cfg.streams)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 6
    x1 = rng.randn(B, T, 12).astype(np.float32)
    x2 = rng.randn(B, T, 6).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)

    trainers = {
        "single": Trainer(cfg, _options()),
        "gspmd": Trainer(cfg, _options(use_mesh=True)),
        "shard_map": Trainer(cfg, _options(use_mesh=True, mesh_mode="shard_map")),
    }
    results = {}
    for name, tr in trainers.items():
        dev = tr._device_batch([x1, x2], y, mask)
        p0 = jax.tree_util.tree_map(jnp.array, params)
        p, _, loss = tr.train_step(p0, tr.optimizer.init(p0), dev[0], dev[1],
                                   dev[2], jax.random.PRNGKey(3),
                                   jnp.asarray(1e-3, jnp.float32))
        results[name] = (float(loss), jax.tree_util.tree_map(np.asarray, p))

    l_ref, p_ref = results["single"]
    for name in ("gspmd", "shard_map"):
        l, p = results[name]
        np.testing.assert_allclose(l, l_ref, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # BN running stats moved off their init (the merge actually happened)
    bn = results["shard_map"][1]["streams"]["raw"]["bn_state"]
    assert np.abs(bn["mean"]).max() > 0


def test_shard_map_adam_loss_trajectory_matches():
    """Cross-mode check for the ADAM path: adam's first-step updates are
    ~sign(grad)*lr so parameter equality is meaningless under float
    reduction-order noise, but a short fit's LOSS TRAJECTORY must agree
    within tolerance across single-device / gspmd / shard_map."""
    X, y, lens = _flat_corpus(48)
    Xv, yv, lensv = _flat_corpus(12, seed=2)
    cfg = zoo.lstm_classifier_majority_vote(8, lstm_size=12, output_classes=3)

    def run(**kw):
        tr = Trainer(cfg, _options(num_epoch=4, epochsize=4, batchsize=16,
                                   learning_rate=0.01, optimizer="adam",
                                   prefetch_batches=False, **kw))
        res = tr.fit(([X], y, lens), ([Xv], yv, lensv), ([Xv], yv, lensv))
        return np.asarray(res.cost_val)

    base = run()
    gspmd = run(use_mesh=True)
    sm = run(use_mesh=True, mesh_mode="shard_map")
    # identical data order + dropout-free model: trajectories track closely
    np.testing.assert_allclose(gspmd, base, rtol=0.05, atol=0.02)
    np.testing.assert_allclose(sm, base, rtol=0.05, atol=0.02)


def test_shard_map_with_bucketed_batches():
    """mesh_mode='shard_map' composes with length-bucketed training: each
    bucket shape compiles its own shard_map step and the run still learns."""
    X, y, lens = _flat_corpus(48)
    cfg = zoo.lstm_classifier_majority_vote(8, lstm_size=12, output_classes=3)
    tr = Trainer(cfg, _options(num_epoch=5, epochsize=6, batchsize=16,
                               learning_rate=0.01, optimizer="adam",
                               use_mesh=True, mesh_mode="shard_map",
                               bucket_boundaries="auto",
                               prefetch_batches=False))
    result = tr.fit(([X], y, lens), ([X], y, lens), ([X], y, lens))
    assert result.class_rate[-1] > 0.6


def test_synced_batchnorm_no_cancellation_on_large_mean():
    """Regression (review r3): the synced BN variance must use the two-pass
    formulation — the one-pass E[x^2]-mean^2 form catastrophically cancels
    in f32 for |mean| >> std (raw-pixel-scale activations) and NaN'd the
    sharded step while the unsharded one trained fine."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ip_avsr_tpu.ops import normalization as norm

    rng = np.random.RandomState(0)
    x = (2000.0 + 0.01 * rng.randn(32, 4)).astype(np.float32)
    params, state = norm.init_batch_norm(4)

    want, want_state = norm.batch_norm_forward(params, state,
                                               jnp.asarray(x), train=True)
    assert np.isfinite(np.asarray(want)).all()

    mesh = Mesh(np.array(jax.devices()), ("data",))
    fn = shard_map(
        lambda v: norm.batch_norm_forward(params, state, v, train=True,
                                          axis_name="data"),
        mesh=mesh, in_specs=P("data"), out_specs=(P("data"), P()),
        check_vma=False)
    got, got_state = jax.jit(fn)(jnp.asarray(x))
    assert np.isfinite(np.asarray(got)).all()
    # at this conditioning (|mean|/std = 2e5) the f32 mean itself is only
    # accurate to ~1e-4, and a ~1e-4 mean difference shifts y by ~1e-2 —
    # the guard here is finiteness and a sane variance (the one-pass form
    # produced var ~0.99 instead of ~1.5e-4, then NaN), not bit equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.15, atol=0.15)
    np.testing.assert_allclose(np.asarray(got_state["var"]),
                               np.asarray(want_state["var"]), rtol=0.05)
