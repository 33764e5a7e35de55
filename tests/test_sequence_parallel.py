"""Sequence parallelism on the 8-device virtual CPU mesh.

New capability (the reference is single-device, SURVEY.md §2.6): the time
axis shards across a ``seq`` mesh axis, the delta window is satisfied by a
ppermute halo exchange, and the recurrent head runs data-parallel over all
devices after one all-to-all.  Contract: gathered results equal the
unsharded program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.ops import losses
from ip_avsr_tpu.ops.delta import append_delta_coeff
from ip_avsr_tpu.parallel import sequence as seq_lib


def _mesh(data, seq):
    devs = np.array(jax.devices()[: data * seq]).reshape(data, seq)
    return Mesh(devs, ("data", "seq"))


@pytest.mark.parametrize("n_seq,T,window", [(2, 8, 3), (4, 16, 4), (8, 16, 2),
                                            (2, 6, 3), (4, 8, 2)])
def test_delta_sp_matches_global(n_seq, T, window):
    rng = np.random.RandomState(0)
    B, D = 4, 5
    x = rng.randn(B, T, D).astype(np.float32)
    want = np.asarray(append_delta_coeff(jnp.asarray(x), window))

    mesh = _mesh(1, n_seq)
    fn = shard_map(
        lambda x: seq_lib.append_delta_coeff_sp(x, window, "seq", n_seq),
        mesh=mesh, in_specs=P(None, "seq", None),
        out_specs=P(None, "seq", None), check_vma=False)
    got = np.asarray(jax.jit(fn)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_halo_needs_enough_local_frames():
    mesh = _mesh(1, 8)
    x = jnp.zeros((2, 16, 3))  # T_local = 2 < window = 3

    fn = shard_map(
        lambda x: seq_lib.append_delta_coeff_sp(x, 3, "seq", 8),
        mesh=mesh, in_specs=P(None, "seq", None),
        out_specs=P(None, "seq", None), check_vma=False)
    with pytest.raises(ValueError, match="T_local"):
        jax.jit(fn)(x)


def _flagship_tiny():
    enc_nl = ("sigmoid", "sigmoid", "linear")
    enc_sh = (24, 16, 8)
    cfg = zoo.adenet_v3(20, 6, 20, lstm_size=8, window=3, output_classes=5)
    streams = []
    for s in cfg.streams:
        if s.encoder_shapes:
            streams.append(adenet.StreamSpec(**{**s.__dict__, "encoder_shapes": enc_sh,
                                                "encoder_nonlinearities": enc_nl}))
        else:
            streams.append(s)
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": streams})
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    B, T = 8, 16
    inputs = [jnp.asarray(rng.randn(B, T, s.input_dim).astype(np.float32))
              for s in cfg.streams]
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    return cfg, params, inputs, mask


@pytest.mark.parametrize("data,seq", [(4, 2), (2, 4)])
def test_adenet_forward_sp_matches_unsharded(data, seq):
    cfg, params, inputs, mask = _flagship_tiny()
    want = np.asarray(jax.jit(
        lambda p, a, b, c, m: adenet.adenet_forward(p, cfg, [a, b, c], m,
                                                    train=False)
    )(params, *inputs, mask))

    mesh = _mesh(data, seq)
    sp_fn = jax.jit(lambda p, a, b, c, m: seq_lib.adenet_forward_sp(
        p, cfg, [a, b, c], m, mesh, train=False))
    in_sh = NamedSharding(mesh, P("data", "seq", None))
    args = [jax.device_put(x, in_sh) for x in inputs]
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", "seq")))
    with mesh:
        got = np.asarray(sp_fn(params, *args, mask_s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_adenet_sp_grads_match_unsharded():
    cfg, params, inputs, mask = _flagship_tiny()
    y = jnp.asarray(np.random.RandomState(2).randint(0, 5, inputs[0].shape[0])
                    .astype(np.int32))

    def loss_plain(params, a, b, c, y, mask):
        out = adenet.adenet_forward(params, cfg, [a, b, c], mask, train=False)
        w = jnp.sum(mask, axis=1) > 0
        return losses.categorical_crossentropy_masked(out, y, w)

    g_plain = jax.jit(jax.grad(loss_plain))(params, *inputs, y, mask)

    mesh = _mesh(2, 4)

    def loss_sp(params, a, b, c, y, mask):
        out = seq_lib.adenet_forward_sp(params, cfg, [a, b, c], mask, mesh,
                                        train=False)
        w = jnp.sum(mask, axis=1) > 0
        return losses.categorical_crossentropy_masked(out, y, w)

    in_sh = NamedSharding(mesh, P("data", "seq", None))
    args = [jax.device_put(x, in_sh) for x in inputs]
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", "seq")))
    with mesh:
        g_sp = jax.jit(jax.grad(loss_sp))(params, *args, y, mask_s)

    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_adenet_sp_train_step_runs():
    """A full train step (dropout on, adam update) through the sp forward
    compiles and produces finite results — the pytest twin of the dryrun's
    dp x sp validation."""
    from ip_avsr_tpu.train import optimizers as opt_lib

    cfg, params, inputs, mask = _flagship_tiny()
    y = jnp.asarray(np.random.RandomState(3).randint(0, 5, inputs[0].shape[0])
                    .astype(np.int32))
    mesh = _mesh(4, 2)
    optimizer = opt_lib.adam(1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(params, a, b, c, y, mask):
        out = seq_lib.adenet_forward_sp(params, cfg, [a, b, c], mask, mesh,
                                        train=True,
                                        dropout_rng=jax.random.PRNGKey(7))
        w = jnp.sum(mask, axis=1) > 0
        return losses.categorical_crossentropy_masked(out, y, w)

    def step(params, opt_state, a, b, c, y, mask):
        l, g = jax.value_and_grad(loss_fn)(params, a, b, c, y, mask)
        params, opt_state = optimizer.apply(params, g, opt_state)
        return params, opt_state, l

    in_sh = NamedSharding(mesh, P("data", "seq", None))
    args = [jax.device_put(x, in_sh) for x in inputs]
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", "seq")))
    with mesh:
        new_params, _, loss = jax.jit(step)(params, opt_state, *args, y, mask_s)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_sp_validation_errors():
    cfg, params, inputs, mask = _flagship_tiny()
    mesh = _mesh(2, 4)
    bad_t = [x[:, :15] for x in inputs]  # 15 % 4 != 0
    with pytest.raises(ValueError, match="not divisible by seq"):
        seq_lib.adenet_forward_sp(params, cfg, bad_t, mask[:, :15], mesh)
    bad_b = [x[:6] for x in inputs]  # 6 % 8 != 0
    with pytest.raises(ValueError, match="data\\*seq"):
        seq_lib.adenet_forward_sp(params, cfg, bad_b, mask[:6], mesh)


def test_sp_batchnorm_synced_matches_unsharded():
    """Batch-norm streams under the sp prefix: training statistics psum over
    BOTH mesh axes (batch and time are sharded; Lasagne BN pools every
    non-feature axis), so the sharded forward and the updated running
    averages match the unsharded program."""
    cfg = zoo.adenet_v1(12, 6, lstm_size=8, window=3, output_classes=4)
    s0 = adenet.StreamSpec(**{**cfg.streams[0].__dict__,
                              "encoder_shapes": (10, 8, 6, 5),
                              "encoder_nonlinearities": ("sigmoid",) * 3 + ("linear",)})
    cfg = adenet.AdeNetConfig(**{**cfg.__dict__, "streams": [s0, cfg.streams[1]]})
    assert any(s.use_batchnorm for s in cfg.streams)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(4)
    B, T = 8, 16
    inputs = [jnp.asarray(rng.randn(B, T, s.input_dim).astype(np.float32))
              for s in cfg.streams]
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))

    # train=True exercises the minibatch-statistics path (no dropout in v1)
    want, want_aux = jax.jit(
        lambda p, a, b, m: adenet.adenet_forward(p, cfg, [a, b], m, train=True,
                                                 return_aux=True)
    )(params, *inputs, mask)

    mesh = _mesh(2, 4)
    sp_fn = jax.jit(lambda p, a, b, m: seq_lib.adenet_forward_sp(
        p, cfg, [a, b], m, mesh, train=True, return_aux=True))
    in_sh = NamedSharding(mesh, P("data", "seq", None))
    args = [jax.device_put(x, in_sh) for x in inputs]
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", "seq")))
    with mesh:
        got, got_aux = sp_fn(params, *args, mask_s)
    # atol 2e-5: the synced var uses the one-pass E[x^2]-mean^2 form, which
    # rounds differently from the unsharded two-pass var
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(want_aux["bn_state"]),
                    jax.tree_util.tree_leaves(got_aux["bn_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_trainer_sequence_parallel_fit():
    """sequence_parallel as a Trainer capability: TrainOptions(
    sequence_parallel=2) builds the dp x sp mesh, pads T to an sp multiple,
    routes loss/eval/predict through adenet_forward_sp, and a short fit()
    learns; a train step on sp-divisible data matches the plain dp step."""
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    rng = np.random.RandomState(1)
    dim, classes, n_videos = 8, 3, 48
    # every length 8..16 so padded T=16 is naturally sp-divisible
    lens = rng.randint(8, 17, n_videos)
    lens[0] = 16
    y_video = rng.randint(0, classes, n_videos)
    frames, y_frames = [], []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    X = np.concatenate(frames).astype(np.float32)
    yf = np.concatenate(y_frames)

    cfg = zoo.deltanet_majority_vote(dim, [16, 8], ["sigmoid", "linear"],
                                     lstm_size=12, window=3, output_classes=classes)

    def opts(**kw):
        base = dict(num_epoch=4, epochsize=5, batchsize=16, learning_rate=0.01,
                    optimizer="adam", prefetch_batches=False,
                    log_fn=lambda *_: None)
        base.update(kw)
        return TrainOptions(**base)

    sp_tr = Trainer(cfg, opts(sequence_parallel=2))
    assert dict(zip(sp_tr.mesh.axis_names, sp_tr.mesh.devices.shape)) == \
        {"data": 4, "seq": 2}
    res = sp_tr.fit(([X], yf, lens), ([X], yf, lens), ([X], yf, lens))
    assert res.class_rate[-1] > 0.6

    # step equality vs the plain dp mesh (dropout-free model, momentum)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    x16 = np.zeros((16, 16, dim), np.float32)
    m16 = np.zeros((16, 16), np.float32)
    yv = np.zeros((16,), np.int32)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(int)
    for k in range(16):
        l = int(lens[k])
        x16[k, :l] = X[offs[k]:offs[k] + l]
        m16[k, :l] = 1.0
        yv[k] = y_video[k]

    dp_tr = Trainer(cfg, opts(optimizer="momentum", use_mesh=True))
    sp_tr2 = Trainer(cfg, opts(optimizer="momentum", sequence_parallel=2))
    outs = []
    for tr in (dp_tr, sp_tr2):
        dev = tr._device_batch([x16], yv, m16)
        p0 = jax.tree_util.tree_map(jnp.array, params)
        p, _, l = tr.train_step(p0, tr.optimizer.init(p0), dev[0], dev[1],
                                dev[2], jax.random.PRNGKey(3),
                                jnp.asarray(1e-3, jnp.float32))
        outs.append((float(l), jax.tree_util.tree_map(np.asarray, p)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_sp_no_delta_model_ignores_window_constraint():
    """A model with NO delta streams exchanges no halo, so T_local < window
    must not be rejected (over-strict rejection found by the TrainOptions
    interaction matrix, r4): the sp forward on a delta-free model with
    T_local=2 < window=9 runs and matches the unsharded forward."""
    from ip_avsr_tpu.models import zoo

    cfg = zoo.lstm_classifier_majority_vote(12, lstm_size=8, output_classes=4)
    assert not any(s.use_delta for s in cfg.streams)
    assert cfg.window > 2
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    mesh = _mesh(2, 4)
    rng = np.random.RandomState(0)
    B, T = 8, 8  # T_local = 2 < window = 9
    x = jnp.asarray(rng.randn(B, T, 12), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    got = seq_lib.adenet_forward_sp(params, cfg, [x], mask, mesh)
    want = adenet.adenet_forward(params, cfg, [x], mask, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)
