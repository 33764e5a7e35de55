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
