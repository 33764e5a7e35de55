"""Multi-device correctness on the 8-device virtual CPU mesh.

The reference has no distributed execution; these tests are the rebuild's
new contract: the same jitted program must produce (numerically) identical
results on 1 device and on an 8-way data-parallel mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.ops import losses
from ip_avsr_tpu.parallel import mesh as mesh_lib
from ip_avsr_tpu.train import optimizers as opt_lib


def _setup():
    cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=8, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 7
    x = rng.randn(B, T, 10).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)
    return cfg, params, x, mask, y


def _loss_fn(cfg):
    def loss(params, x, y, mask):
        out = adenet.adenet_forward(params, cfg, [x], mask, train=False)
        y2d = jnp.repeat(y[:, None], mask.shape[1], axis=1)
        return losses.temporal_softmax_loss(out, y2d, mask)

    return loss


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_forward_single_vs_sharded():
    cfg, params, x, mask, y = _setup()
    fwd = jax.jit(lambda p, x, m: adenet.adenet_forward(p, cfg, [x], m, train=False))
    out_single = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(mask)))

    m = mesh_lib.make_mesh()
    params_r = mesh_lib.replicate(m, params)
    x_s = mesh_lib.shard_batch(m, jnp.asarray(x))
    mask_s = mesh_lib.shard_batch(m, jnp.asarray(mask))
    out_sharded = np.asarray(fwd(params_r, x_s, mask_s))
    np.testing.assert_allclose(out_single, out_sharded, rtol=1e-5, atol=1e-6)


def test_grads_single_vs_sharded():
    cfg, params, x, mask, y = _setup()
    loss = _loss_fn(cfg)
    grad_fn = jax.jit(jax.grad(loss))
    g_single = grad_fn(params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))

    m = mesh_lib.make_mesh()
    params_r = mesh_lib.replicate(m, params)
    args = [mesh_lib.shard_batch(m, jnp.asarray(a)) for a in (x, y, mask)]
    g_sharded = grad_fn(params_r, *args)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_train_step_single_vs_sharded():
    cfg, params, x, mask, y = _setup()
    loss = _loss_fn(cfg)
    optimizer = opt_lib.adam(1e-3)

    def train_step(params, opt_state, x, y, mask):
        l, grads = jax.value_and_grad(loss)(params, x, y, mask)
        params, opt_state = optimizer.apply(params, grads, opt_state)
        return params, opt_state, l

    step = jax.jit(train_step)

    p1, s1, l1 = step(params, optimizer.init(params), jnp.asarray(x), jnp.asarray(y),
                      jnp.asarray(mask))

    m = mesh_lib.make_mesh()
    params_r = mesh_lib.replicate(m, params)
    state_r = mesh_lib.replicate(m, optimizer.init(params))
    args = [mesh_lib.shard_batch(m, jnp.asarray(a)) for a in (x, y, mask)]
    p2, s2, l2 = step(params_r, state_r, *args)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_cpu_mesh_ready_requires_cpu_priority():
    """Round-4 MULTICHIP regression: the driver process has
    jax_platforms == "axon,cpu" (a priority-ordered list where the axon
    plugin wins), so membership of "cpu" must NOT qualify as cpu-mesh-ready —
    only a pure-"cpu" platform list does."""
    import __graft_entry__

    flags = "--xla_force_host_platform_device_count=8"
    # the exact driver environment that broke round 4:
    assert not __graft_entry__._cpu_mesh_ready(8, platforms="axon,cpu",
                                               xla_flags=flags)
    assert not __graft_entry__._cpu_mesh_ready(8, platforms="cpu,axon",
                                               xla_flags=flags)
    assert __graft_entry__._cpu_mesh_ready(8, platforms="cpu", xla_flags=flags)
    assert __graft_entry__._cpu_mesh_ready(8, platforms=" cpu ",
                                           xla_flags=flags)
    # enough platforms but too few virtual devices
    assert not __graft_entry__._cpu_mesh_ready(
        8, platforms="cpu", xla_flags="--xla_force_host_platform_device_count=4")
    assert not __graft_entry__._cpu_mesh_ready(8, platforms="cpu", xla_flags="")
    # live config in this test session (conftest sets cpu + 8 devices)
    assert __graft_entry__._cpu_mesh_ready(8)


def test_cpu_mesh_env_replaces_stale_device_count():
    """The shared child-provisioning helper (utils/cpu_mesh.py — used by the
    dryrun re-exec, the multihost worker launcher, and scaling_pins) must
    REPLACE any pre-existing host-device-count flag (XLA takes the first
    occurrence) and force the cpu platform, without clobbering other flags."""
    from ip_avsr_tpu.utils import cpu_mesh

    base = {"XLA_FLAGS": "--xla_foo --xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "axon,cpu", "KEEP": "x"}
    env = cpu_mesh.cpu_mesh_env(8, base_env=base, CHILD_MARK="1")
    assert env["XLA_FLAGS"] == \
        "--xla_foo --xla_force_host_platform_device_count=8"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["KEEP"] == "x" and env["CHILD_MARK"] == "1"
    assert base["JAX_PLATFORMS"] == "axon,cpu"  # input not mutated
    # the preamble must set the config BEFORE anything else imports jax
    assert cpu_mesh.CPU_PREAMBLE.startswith("import jax; jax.config.update")


def test_dryrun_falls_back_to_child_on_platform_mismatch(monkeypatch):
    """Belt and braces: even if the config check passes, a live backend that
    doesn't actually expose n CPU devices (plugin platform claimed the
    process) must route to the child re-exec, never assert in-process."""
    import __graft_entry__

    called = {}
    monkeypatch.setattr(__graft_entry__, "_reexec_child",
                        lambda n: called.setdefault("n", n))
    monkeypatch.setattr(__graft_entry__, "_dryrun_multichip_impl",
                        lambda n: (_ for _ in ()).throw(
                            AssertionError("must not run in-process")))

    class _FakeTpu:
        platform = "tpu"

    # config says ready, but the live backend is one TPU
    monkeypatch.setattr(__graft_entry__, "_cpu_mesh_ready", lambda n: True)
    monkeypatch.setattr(__graft_entry__.jax, "devices", lambda: [_FakeTpu()])
    __graft_entry__.dryrun_multichip(8)
    assert called == {"n": 8}

    # config not ready at all -> child, without touching jax.devices()
    called.clear()
    monkeypatch.setattr(__graft_entry__, "_cpu_mesh_ready", lambda n: False)
    monkeypatch.setattr(
        __graft_entry__.jax, "devices",
        lambda: (_ for _ in ()).throw(AssertionError("backend touched")))
    __graft_entry__.dryrun_multichip(8)
    assert called == {"n": 8}


def test_entry_compiles_tiny():
    """entry() returns a jittable fn; compile-check on a tiny replica (the
    full-size flagship compile is the driver's job on real hardware)."""
    import __graft_entry__

    cfg, params, inputs, mask = __graft_entry__._flagship(tiny=True)
    from ip_avsr_tpu.models import adenet

    fn = jax.jit(lambda p, a, b, c, m: adenet.adenet_forward(p, cfg, [a, b, c], m))
    out = fn(params, *inputs, mask)
    assert out.shape[0] == inputs[0].shape[0]
    assert np.isfinite(np.asarray(out)).all()


def test_multihost_helper_single_process():
    """global_batch_from_local degrades to a sharded device_put on one host."""
    from ip_avsr_tpu.parallel import multihost

    m = mesh_lib.make_mesh()
    sl = multihost.process_local_slice(16)
    assert sl == slice(0, 16)  # single-process: this host owns every row
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = multihost.global_batch_from_local(m, x)
    assert arr.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 8


def test_dp_tp_grads_match_single_device():
    """2-D data x model sharding (encoder weight matrices tensor-parallel on
    their hidden axis, batch data-parallel) must reproduce single-device
    gradients — the pytest twin of __graft_entry__.dryrun_multichip."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = zoo.deltanet_majority_vote(24, [32, 16, 8], ["sigmoid", "sigmoid", "linear"],
                                     lstm_size=8, window=4, output_classes=4)
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 9
    x = rng.randn(B, T, 24).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)
    loss = _loss_fn(cfg)
    grad_fn = jax.jit(jax.grad(loss))

    g_single = grad_fn(params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))

    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))

    def param_spec(path, leaf):
        names = [str(getattr(k, "key", "")) for k in path]
        if "encoder" in names and names[-1] == "w" and leaf.ndim == 2:
            return P(None, "model")
        return P()

    param_sh = jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, param_spec(p, l)), params)
    params_s = jax.device_put(params, param_sh)
    batch_sh = NamedSharding(mesh, P("data"))
    args = [jax.device_put(jnp.asarray(a), batch_sh) for a in (x, y, mask)]
    with mesh:
        g_sharded = grad_fn(params_s, *args)

    # encoder weight grads really are tensor-parallel, not replicated
    enc_w_grad = g_sharded["streams"]["s1"]["encoder"]["fc1"]["w"]
    assert any(s.spec == P(None, "model") for s in [enc_w_grad.sharding])

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def _corpus(n_videos, dim=24, classes=4, seed=1):
    rng = np.random.RandomState(seed)
    lens = rng.randint(5, 10, n_videos)
    y_video = rng.randint(0, classes, n_videos)
    frames, y_frames = [], []
    for l, c in zip(lens, y_video):
        base = np.zeros(dim)
        base[c] = 3.0
        frames.append(base + 0.3 * rng.randn(l, dim))
        y_frames.append(np.full(l, c))
    return (np.concatenate(frames).astype(np.float32),
            np.concatenate(y_frames), lens)


def _tp_cfg():
    return zoo.deltanet_majority_vote(24, [32, 16, 8],
                                      ["sigmoid", "sigmoid", "linear"],
                                      lstm_size=8, window=4, output_classes=4)


def test_trainer_model_parallel_step_equals_single_device():
    """model_parallel=2 as a Trainer capability (not just the dryrun): one
    train step on the dp x tp mesh matches the single-device step, and the
    encoder weights/moments really are tensor-parallel."""
    from jax.sharding import PartitionSpec as P

    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    cfg = _tp_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 9
    x = rng.randn(B, T, 24).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)

    opts = lambda **kw: TrainOptions(optimizer="momentum", learning_rate=1e-3,  # noqa: E731
                                     log_fn=lambda *_: None, **kw)
    single = Trainer(cfg, opts())
    tp = Trainer(cfg, opts(model_parallel=2))
    assert dict(zip(tp.mesh.axis_names, tp.mesh.devices.shape)) == \
        {"data": 4, "model": 2}

    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731
    p0 = fresh()
    s_args = single._device_batch([x], y, mask)
    p1, _, l1 = single.train_step(p0, single.optimizer.init(p0), s_args[0],
                                  s_args[1], s_args[2], jax.random.PRNGKey(3),
                                  jnp.asarray(1e-3, jnp.float32))

    p0b = fresh()
    opt0 = tp.optimizer.init(p0b)
    p0b, opt0 = tp._setup_tensor_parallel(p0b, opt0)
    t_args = tp._device_batch([x], y, mask)
    p2, s2, l2 = tp.train_step(p0b, opt0, t_args[0], t_args[1], t_args[2],
                               jax.random.PRNGKey(3),
                               jnp.asarray(1e-3, jnp.float32))

    # encoder weights, biases AND the mirrored optimizer state are sharded
    assert p2["streams"]["s1"]["encoder"]["fc1"]["w"].sharding.spec == \
        P(None, "model")
    assert p2["streams"]["s1"]["encoder"]["fc1"]["b"].sharding.spec == P("model")
    assert s2["velocity"]["streams"]["s1"]["encoder"]["fc1"]["w"].sharding.spec \
        == P(None, "model")

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    e1 = float(single.eval_cost(params, *s_args))
    e2 = float(tp.eval_cost(params, *t_args))
    np.testing.assert_allclose(e1, e2, rtol=1e-5)


def test_trainer_model_parallel_fit_composes(tmp_path):
    """A dp x tp fit() composes with length-bucketed batches and
    checkpoint/resume, and still learns."""
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    X, y, lens = _corpus(48)
    Xv, yv, lensv = _corpus(12, seed=2)
    cfg = _tp_cfg()

    def opts(**kw):
        base = dict(num_epoch=4, epochsize=5, batchsize=16,
                    learning_rate=0.01, optimizer="adam",
                    model_parallel=2, prefetch_batches=False,
                    bucket_boundaries="auto",
                    checkpoint_dir=str(tmp_path / "ckpt"),
                    log_fn=lambda *_: None)
        base.update(kw)
        return TrainOptions(**base)

    tr = Trainer(cfg, opts())
    res = tr.fit(([X], y, lens), ([Xv], yv, lensv), ([Xv], yv, lensv))
    assert res.class_rate[-1] > 0.5

    # resume from the checkpoint and keep training a step
    tr2 = Trainer(cfg, opts(resume=True, num_epoch=5))
    res2 = tr2.fit(([X], y, lens), ([Xv], yv, lensv), ([Xv], yv, lensv))
    assert res2.epochs_run == 5
    assert np.isfinite(res2.cost_val).all()


def test_device_eval_matches_host_eval():
    """TrainOptions(device_eval=True): the on-device vote+confusion path
    returns identical CR and confusion counts to the host-gather path, for
    both head types, chunked and unchunked, with and without a mesh."""
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    rng = np.random.RandomState(0)
    n, T = 21, 7
    for output_mode in ("per_step", "last_step"):
        if output_mode == "per_step":
            cfg = zoo.lstm_classifier_majority_vote(10, lstm_size=8,
                                                    output_classes=4)
        else:
            cfg = zoo.lstm_classifier_baseline(10, lstm_size=8,
                                               output_classes=4)
        params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
        x = rng.randn(n, T, 10).astype(np.float32)
        lens = rng.randint(3, T + 1, n)
        mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
        y = rng.randint(0, 4, n).astype(np.int32)

        for mesh_kw in ({}, {"use_mesh": True}):
            host = Trainer(cfg, TrainOptions(log_fn=lambda *_: None,
                                             optimizer="momentum", **mesh_kw))
            dev = Trainer(cfg, TrainOptions(log_fn=lambda *_: None,
                                            optimizer="momentum",
                                            device_eval=True, **mesh_kw))
            cr_h, conf_h = host.evaluate(params, [x], y, mask)
            for bs in (512, 8):  # unchunked and chunked
                cr_d, conf_d = dev.evaluate(params, [x], y, mask,
                                            eval_batchsize=bs)
                assert cr_d == cr_h, (output_mode, mesh_kw, bs)
                np.testing.assert_array_equal(conf_d, conf_h)


def test_param_shardings_demote_non_divisible():
    """A rule whose sharded dim doesn't divide the model-axis size demotes
    to replicated instead of padding (parallel/mesh.param_shardings)."""
    from jax.sharding import PartitionSpec as P

    mesh = mesh_lib.make_mesh_nd({"data": 4, "model": 2})
    params = {
        "streams": {"s1": {"encoder": {
            "fc1": {"w": jnp.zeros((6, 8)), "b": jnp.zeros((8,))},
            # 7 % 2 != 0 -> both leaves demote to replicated
            "fc2": {"w": jnp.zeros((8, 7)), "b": jnp.zeros((7,))},
        }}},
        "output": {"w": jnp.zeros((7, 4)), "b": jnp.zeros((4,))},
    }
    sh = mesh_lib.param_shardings(params, mesh)
    enc = sh["streams"]["s1"]["encoder"]
    assert enc["fc1"]["w"].spec == P(None, "model")
    assert enc["fc1"]["b"].spec == P("model")
    assert enc["fc2"]["w"].spec == P()
    assert enc["fc2"]["b"].spec == P()
    assert sh["output"]["w"].spec == P()  # not an encoder leaf


def test_checkpoint_resume_across_mesh_shapes(tmp_path):
    """Cross-MESH-SHAPE resume (docs/SCALING.md claim): a checkpoint written
    under dp=8 restores and continues under dp=4 x tp=2 AND under a single
    device.  Checkpoints are stored as host numpy and re-placed with the
    restoring Trainer's own mesh (train/checkpoints.py, trainer resume
    path), so the trajectory must match a never-checkpointed straight
    run epoch for epoch."""
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    X, y, lens = _corpus(48)
    Xv, yv, lensv = _corpus(12, seed=2)
    cfg = _tp_cfg()
    train, val = ([X], y, lens), ([Xv], yv, lensv)

    def opts(**kw):
        base = dict(num_epoch=2, epochsize=3, batchsize=16,
                    learning_rate=0.01, optimizer="adam", use_mesh=True,
                    prefetch_batches=False, log_fn=lambda *_: None)
        base.update(kw)
        return TrainOptions(**base)

    # never-checkpointed straight-through reference: 4 epochs on dp=8
    ref = Trainer(cfg, opts(num_epoch=4)).fit(train, val, val)

    # phase 1: 2 epochs on dp=8, checkpointing
    ck = str(tmp_path / "ckpt")
    r1 = Trainer(cfg, opts(checkpoint_dir=ck)).fit(train, val, val)
    np.testing.assert_allclose(r1.cost_val, ref.cost_val[:2], rtol=1e-4,
                               atol=1e-6)

    # phase 2a: resume under dp=4 x tp=2 (different mesh SHAPE + sharded
    # encoder params/moments) — restored history is verbatim; the continued
    # epochs 3..4 track the straight run up to resharded-reduction-order
    # noise (tp splits the encoder matmul reductions differently, and the
    # divergence compounds over an epoch of steps)
    r_tp = Trainer(cfg, opts(model_parallel=2, checkpoint_dir=ck,
                             resume=True, num_epoch=4)).fit(train, val, val)
    assert len(r_tp.cost_val) == 4
    np.testing.assert_allclose(r_tp.cost_val[:2], ref.cost_val[:2],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(r_tp.cost_val[2:], ref.cost_val[2:],
                               rtol=5e-3, atol=1e-5)
    # (cost_train is NOT compared: it is the last-BATCH cost of each epoch,
    # and a resumed run deliberately reseeds the batch-order stream at
    # seed+start_epoch — same data per epoch, different final batch)
    assert np.isfinite(r_tp.cost_train).all()
    assert abs(r_tp.best_val - ref.best_val) < 5e-3

    # phase 2b: resume the SAME dp=8 checkpoint on a single device
    r_one = Trainer(cfg, opts(use_mesh=False, checkpoint_dir=ck,
                              resume=True, num_epoch=4)).fit(train, val, val)
    assert len(r_one.cost_val) == 4
    np.testing.assert_allclose(r_one.cost_val[:2], ref.cost_val[:2],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(r_one.cost_val[2:], ref.cost_val[2:],
                               rtol=5e-3, atol=1e-5)

    # phase 2c: a multi -> single restore must hand back best-params that
    # are FUNCTIONALLY equivalent to the straight run's (element-wise
    # equality is not expected: the reseeded post-resume batch order walks
    # a different path to the same optimum) — same test CR, same best CR
    assert abs(r_one.test_cr - ref.test_cr) < 1e-9, (r_one.test_cr,
                                                     ref.test_cr)
    assert abs(r_one.best_cr - ref.best_cr) < 1e-9


def test_param_shardings_demote_on_missing_axis():
    """The default encoder rules on a 1-D data-only mesh must demote to
    replicated (documented behavior), not KeyError on the absent 'model'
    axis (review r6)."""
    from jax.sharding import PartitionSpec as P

    from ip_avsr_tpu.models import adenet as adenet_mod
    from ip_avsr_tpu.models import zoo as zoo_mod

    cfg = zoo_mod.adenet_v2(20, 8, (16, 12, 6),
                            ("sigmoid", "sigmoid", "linear"),
                            lstm_size=6, window=3, output_classes=7)
    params = adenet_mod.init_adenet_params(jax.random.PRNGKey(0), cfg)
    sh = mesh_lib.param_shardings(params, mesh_lib.make_mesh())
    for leaf in jax.tree_util.tree_leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec")):
        assert leaf.spec == P()


def test_trainer_zero1_step_equals_single_device():
    """TrainOptions(zero1=True): adam moments shard over 'data' (largest
    divisible dim per leaf), parameters stay replicated, and the updated
    parameters match the single-device step exactly (the update math is
    elementwise on shards)."""
    from jax.sharding import PartitionSpec as P

    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    cfg = _tp_cfg()
    params = adenet.init_adenet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 16, 9
    x = rng.randn(B, T, 24).astype(np.float32)
    lens = rng.randint(3, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    y = rng.randint(0, 4, B).astype(np.int32)

    opts = lambda **kw: TrainOptions(optimizer="adam", learning_rate=1e-3,  # noqa: E731
                                     log_fn=lambda *_: None, **kw)
    single = Trainer(cfg, opts())
    z1 = Trainer(cfg, opts(zero1=True))
    assert z1.mesh is not None and z1.mesh.devices.size == 8

    fresh = lambda: jax.tree_util.tree_map(jnp.array, params)  # noqa: E731
    p0 = fresh()
    s_args = single._device_batch([x], y, mask)
    p1, _, l1 = single.train_step(p0, single.optimizer.init(p0), s_args[0],
                                  s_args[1], s_args[2], jax.random.PRNGKey(3),
                                  jnp.asarray(1e-3, jnp.float32))

    p0b = fresh()
    opt0 = z1.optimizer.init(p0b)
    p0b, opt0 = z1._setup_zero1(p0b, opt0)
    z_args = z1._device_batch([x], y, mask)
    p2, s2, l2 = z1.train_step(p0b, opt0, z_args[0], z_args[1], z_args[2],
                               jax.random.PRNGKey(3),
                               jnp.asarray(1e-3, jnp.float32))

    # moments sharded over 'data'; the matching PARAMETER stays replicated
    m_w = s2["m"]["streams"]["s1"]["encoder"]["fc1"]["w"]
    assert any(ax == "data" for ax in m_w.sharding.spec if ax is not None)
    assert p2["streams"]["s1"]["encoder"]["fc1"]["w"].sharding.spec == P()
    # leaves with no divisible axis are replicated, not padded
    m_b = s2["m"]["output"]["b"]  # (4,): 4 % 8 != 0 -> replicated
    assert m_b.sharding.spec == P()

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_zero1_fit_learns():
    """A zero1 fit() trains end to end (incl. the eval paths and NaN-free
    multi-epoch state round trip) and learns the separable corpus."""
    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    X, y, lens = _corpus(48)
    Xv, yv, lensv = _corpus(12, seed=2)
    cfg = _tp_cfg()
    tr = Trainer(cfg, TrainOptions(num_epoch=4, epochsize=5, batchsize=16,
                                   learning_rate=0.01, optimizer="adam",
                                   zero1=True, prefetch_batches=False,
                                   log_fn=lambda *_: None))
    res = tr.fit(([X], y, lens), ([Xv], yv, lensv), ([Xv], yv, lensv))
    assert res.class_rate[-1] > 0.5
    assert np.isfinite(res.cost_val).all()


def test_trainer_zero1_exclusions():
    import pytest

    from ip_avsr_tpu.train.trainer import Trainer, TrainOptions

    cfg = _tp_cfg()
    with pytest.raises(ValueError, match="gspmd"):
        Trainer(cfg, TrainOptions(zero1=True, mesh_mode="shard_map",
                                  log_fn=lambda *_: None))
    with pytest.raises(ValueError, match="redundant"):
        Trainer(cfg, TrainOptions(zero1=True, model_parallel=2,
                                  log_fn=lambda *_: None))
    with pytest.raises(ValueError, match="not supported"):
        Trainer(cfg, TrainOptions(zero1=True, sequence_parallel=2,
                                  log_fn=lambda *_: None))
