"""Grouped (stacked) LSTM execution must match individual scans exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_avsr_tpu.models import adenet, zoo
from ip_avsr_tpu.ops import lstm
from ip_avsr_tpu.ops import lstm as lstm_ops


@pytest.mark.parametrize("peep", [False, True])
def test_grouped_matches_individual(peep):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    H, B, T = 6, 3, 9
    dims = [5, 8, 8]  # heterogeneous input dims exercise the zero-padding
    params = [lstm.init_lstm_params(k, d, H, use_peepholes=peep)
              for k, d in zip(ks, dims)]
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(B, T, d).astype(np.float32)) for d in dims]
    mask = np.ones((B, T), np.uint8)
    mask[1, 5:] = 0
    mask = jnp.asarray(mask)
    flags = [False, True, False]

    grouped = lstm.lstm_forward_grouped(params, xs, mask, flags)
    for p, x, bwd, got in zip(params, xs, flags, grouped):
        expected = lstm.lstm_forward(p, x, mask, backwards=bwd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-6)


def test_grouped_gradients_match_individual():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 2)
    H, B, T, D = 4, 2, 6, 5
    params = [lstm.init_lstm_params(k, D, H) for k in ks]
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, D).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    def loss_grouped(ps):
        outs = lstm.lstm_forward_grouped(ps, [x, x], mask, [False, True])
        return jnp.sum((outs[0] + outs[1]) ** 2)

    def loss_individual(ps):
        a = lstm.lstm_forward(ps[0], x, mask)
        b = lstm.lstm_forward(ps[1], x, mask, backwards=True)
        return jnp.sum((a + b) ** 2)

    g1 = jax.grad(loss_grouped)(params)
    g2 = jax.grad(loss_individual)(params)
    for t1, t2 in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-4, atol=1e-5)


def test_can_group():
    key = jax.random.PRNGKey(0)
    a = lstm.init_lstm_params(key, 5, 6)
    b = lstm.init_lstm_params(key, 9, 6)
    c = lstm.init_lstm_params(key, 5, 7)
    d = lstm.init_lstm_params(key, 5, 6, use_peepholes=True)
    assert lstm.can_group_lstms([a, b])
    assert not lstm.can_group_lstms([a, c])
    assert not lstm.can_group_lstms([a, d])
    assert not lstm.can_group_lstms([a])


def test_adenet_fused_vs_unfused_forward():
    """The model must produce identical outputs with fuse_scans on/off."""
    enc = (("sigmoid", "sigmoid", "linear"), (16, 12, 6))
    base = zoo.adenet_v2(20, 8, enc[1], enc[0], lstm_size=6, window=3,
                         output_classes=7)
    # fuse_scans defaults False — set it EXPLICITLY or both configs are the
    # same program and the grouped path has zero coverage (review r5)
    cfg_on = adenet.AdeNetConfig(**{**base.__dict__, "fuse_scans": True})
    cfg_off = adenet.AdeNetConfig(**{**base.__dict__, "fuse_scans": False})
    assert cfg_on.fuse_scans and not cfg_off.fuse_scans
    params = adenet.init_adenet_params(jax.random.PRNGKey(2), cfg_on)
    rng = np.random.RandomState(0)
    B, T = 3, 8
    inputs = [jnp.asarray(rng.randn(B, T, d).astype(np.float32)) for d in (20, 8)]
    lens = rng.randint(3, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))

    out_on = adenet.adenet_forward(params, cfg_on, inputs, mask, train=False)
    out_off = adenet.adenet_forward(params, cfg_off, inputs, mask, train=False)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-6)


def test_fuse_scans_yields_to_residual_levers_under_training():
    """fuse_scans + (lstm_remat | lstm_residual_dtype) under train=True must
    warn and run the UNGROUPED cores (the grouped scan has no residual
    machinery — silently honoring fuse_scans would drop the promised memory
    savings), with gradients identical to the plain ungrouped config."""
    import warnings as warnings_mod

    enc = (("sigmoid", "sigmoid", "linear"), (16, 12, 6))
    base = zoo.adenet_v2(20, 8, enc[1], enc[0], lstm_size=6, window=3,
                         output_classes=7)
    params = adenet.init_adenet_params(
        jax.random.PRNGKey(2),
        adenet.AdeNetConfig(**{**base.__dict__, "fuse_scans": True}))
    rng = np.random.RandomState(0)
    B, T = 3, 8
    inputs = [jnp.asarray(rng.randn(B, T, d).astype(np.float32)) for d in (20, 8)]
    lens = rng.randint(3, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))

    def loss(p, cfg):
        out = adenet.adenet_forward(p, cfg, inputs, mask, train=True,
                                    dropout_rng=jax.random.PRNGKey(0))
        return jnp.sum(out * out)

    for lever in ({"lstm_remat": True}, {"lstm_residual_dtype": "bfloat16"}):
        cfg_fused = adenet.AdeNetConfig(
            **{**base.__dict__, "fuse_scans": True, **lever})
        cfg_plain = adenet.AdeNetConfig(**{**base.__dict__, **lever})
        with pytest.warns(UserWarning, match="fuse_scans is ignored"):
            g_fused = jax.grad(loss)(params, cfg_fused)
        with warnings_mod.catch_warnings():
            warnings_mod.simplefilter("error")  # plain config must NOT warn
            g_plain = jax.grad(loss)(params, cfg_plain)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), g_fused, g_plain)
        # inference is untouched by the levers: grouping stays on, no warning
        with warnings_mod.catch_warnings():
            warnings_mod.simplefilter("error")
            out_inf = adenet.adenet_forward(params, cfg_fused, inputs, mask,
                                            train=False)
        assert np.all(np.isfinite(np.asarray(out_inf)))


def test_pallas_lstm_kernel_interpret_matches_scan():
    """Pallas LSTM recurrence (interpret mode) == XLA scan, fwd and bwd."""
    from ip_avsr_tpu.ops.pallas import lstm_kernel

    key = jax.random.PRNGKey(0)
    params = lstm.init_lstm_params(key, 7, 6)
    params["cell_init"] = jnp.asarray(
        np.random.RandomState(1).randn(1, 6).astype(np.float32))
    params["hid_init"] = jnp.asarray(
        np.random.RandomState(2).randn(1, 6).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(3).randn(5, 9, 7).astype(np.float32))
    mask = np.ones((5, 9), np.float32)
    mask[2, 5:] = 0
    mask = jnp.asarray(mask)
    for bwd in (False, True):
        ref = lstm.lstm_forward(params, x, mask, backwards=bwd)
        got = lstm_kernel.lstm_forward_pallas(params, x, mask, backwards=bwd,
                                              matmul_dtype=None, block_b=5,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_lstm_batch_padding():
    """Batch sizes that don't divide block_b are padded and sliced back."""
    from ip_avsr_tpu.ops.pallas import lstm_kernel

    params = lstm.init_lstm_params(jax.random.PRNGKey(0), 4, 6)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 5, 4).astype(np.float32))
    mask = jnp.ones((3, 5), jnp.float32)
    ref = lstm.lstm_forward(params, x, mask)
    got = lstm_kernel.lstm_forward_pallas(params, x, mask, matmul_dtype=None,
                                          block_b=2, interpret=True)
    assert got.shape == (3, 5, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_grouped_lstm_with_bf16_params():
    """bf16-stored parameters must not break the scan carry dtype (regression:
    bf16 cell_init leaked into the carry and crashed the scan)."""
    key = jax.random.PRNGKey(0)
    params = [lstm.init_lstm_params(k, 5, 6) for k in jax.random.split(key, 2)]
    params16 = [jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
                for p in params]
    x = jnp.asarray(np.random.RandomState(0).randn(3, 7, 5).astype(np.float32))
    mask = jnp.ones((3, 7), jnp.float32)
    outs = lstm.lstm_forward_grouped(params16, [x, x], mask, [False, True],
                                     matmul_dtype=jnp.bfloat16)
    ref = lstm.lstm_forward_grouped(params, [x, x], mask, [False, True])
    for a, b in zip(outs, ref):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)


@pytest.mark.parametrize("backwards", [False, True])
@pytest.mark.parametrize("clip", [5.0, 0.0, 1e-3])
def test_lstm_custom_vjp_grads_match_autodiff(backwards, clip):
    """The batched-weight-gradient custom VJP (ops/lstm._lstm_core) must match
    plain XLA autodiff of the same scan — forward values and every gradient
    (weights, biases, initial states, inputs), including when grad clipping
    actually bites (clip=1e-3 with a large cotangent)."""
    rng = np.random.RandomState(0)
    B, T, D, H = 3, 7, 5, 6
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = np.array([7, 3, 5])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    scale = 1e4 if clip == 1e-3 else 1.0
    gseed = jnp.asarray(scale * rng.randn(B, T, H).astype(np.float32))

    a = lstm_ops.lstm_forward(params, x, mask, backwards=backwards,
                              grad_clipping=clip, use_custom_vjp=True)
    b = lstm_ops.lstm_forward(params, x, mask, backwards=backwards,
                              grad_clipping=clip, use_custom_vjp=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def loss(p, xx, custom):
        out = lstm_ops.lstm_forward(p, xx, mask, backwards=backwards,
                                    grad_clipping=clip, use_custom_vjp=custom)
        return jnp.sum(out * gseed)

    ga, gxa = jax.grad(loss, argnums=(0, 1))(params, x, True)
    gb, gxb = jax.grad(loss, argnums=(0, 1))(params, x, False)
    tol = dict(rtol=3e-4, atol=3e-5) if scale > 1 else dict(rtol=2e-5, atol=2e-6)
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   err_msg=f"{k}", **tol)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), **tol)


@pytest.mark.parametrize("backwards", [False, True])
@pytest.mark.parametrize("clip", [5.0, 1e-3])
def test_lstm_peephole_custom_vjp_grads_match_autodiff(backwards, clip):
    """The peephole custom VJP (ops/lstm._lstm_core_peep) must match plain
    autodiff for every gradient, including the three peephole vectors (whose
    cotangents bypass the clip node) and when clipping bites."""
    rng = np.random.RandomState(0)
    B, T, D, H = 3, 7, 5, 6
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H,
                                       use_peepholes=True)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = np.array([7, 3, 5])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    scale = 1e4 if clip == 1e-3 else 1.0
    gseed = jnp.asarray(scale * rng.randn(B, T, H).astype(np.float32))

    a = lstm_ops.lstm_forward(params, x, mask, backwards=backwards,
                              grad_clipping=clip, use_custom_vjp=True)
    b = lstm_ops.lstm_forward(params, x, mask, backwards=backwards,
                              grad_clipping=clip, use_custom_vjp=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def loss(p, xx, custom):
        out = lstm_ops.lstm_forward(p, xx, mask, backwards=backwards,
                                    grad_clipping=clip, use_custom_vjp=custom)
        return jnp.sum(out * gseed)

    ga, gxa = jax.grad(loss, argnums=(0, 1))(params, x, True)
    gb, gxb = jax.grad(loss, argnums=(0, 1))(params, x, False)
    tol = dict(rtol=3e-4, atol=3e-5) if scale > 1 else dict(rtol=2e-5, atol=2e-6)
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   err_msg=f"{k}", **tol)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), **tol)


def test_grouped_custom_vjp_grads_match_autodiff_and_individual():
    """Grouped custom VJP == grouped autodiff == per-stream scans, for both
    forward values and all parameter/input gradients (mixed directions and
    heterogeneous input dims exercise the flip and pad transposes)."""
    rng = np.random.RandomState(0)
    B, T, H = 3, 7, 6
    dims = [5, 8, 8]
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    params = [lstm_ops.init_lstm_params(k, d, H) for k, d in zip(ks, dims)]
    xs = [jnp.asarray(rng.randn(B, T, d).astype(np.float32)) for d in dims]
    lens = np.array([7, 3, 5])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    flags = [False, True, False]
    gseeds = [jnp.asarray(rng.randn(B, T, H).astype(np.float32)) for _ in dims]

    def loss_grouped(ps, xxs, custom):
        outs = lstm_ops.lstm_forward_grouped(ps, xxs, mask, flags,
                                             use_custom_vjp=custom)
        return sum(jnp.sum(o * s) for o, s in zip(outs, gseeds))

    def loss_individual(ps, xxs):
        outs = [lstm_ops.lstm_forward(p, x, mask, backwards=f)
                for p, x, f in zip(ps, xxs, flags)]
        return sum(jnp.sum(o * s) for o, s in zip(outs, gseeds))

    ga, gxa = jax.grad(loss_grouped, argnums=(0, 1))(params, xs, True)
    gb, gxb = jax.grad(loss_grouped, argnums=(0, 1))(params, xs, False)
    gi, gxi = jax.grad(loss_individual, argnums=(0, 1))(params, xs)
    for g in range(3):
        for k in ga[g]:
            np.testing.assert_allclose(np.asarray(ga[g][k]), np.asarray(gb[g][k]),
                                       rtol=3e-5, atol=3e-6, err_msg=f"g{g} {k}")
            np.testing.assert_allclose(np.asarray(ga[g][k]), np.asarray(gi[g][k]),
                                       rtol=3e-5, atol=3e-6, err_msg=f"g{g} {k} vs ind")
        np.testing.assert_allclose(np.asarray(gxa[g]), np.asarray(gxb[g]),
                                   rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("peep", [False, True])
def test_custom_vjp_grad_dtypes_match_params(peep):
    """Cotangents must carry the parameter dtype: a bf16 param tree getting
    f32 grads for b/cell_init/hid_init would be silently promoted to f32 by
    the first optimizer update (retrace + dtype-structure mismatch in any
    carried training loop)."""
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), 6, 8,
                                       use_peepholes=peep, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 6).astype(np.float32))
    mask = jnp.ones((3, 5), jnp.float32)

    g = jax.grad(lambda p: jnp.sum(lstm_ops.lstm_forward(p, x, mask)))(params)
    for k in params:
        assert g[k].dtype == params[k].dtype, (k, g[k].dtype, params[k].dtype)


def test_pallas_peep_inference_kernel_interpret_matches_scan():
    """Peephole Pallas inference recurrence (interpret mode) == XLA scan."""
    from ip_avsr_tpu.ops.pallas import lstm_kernel

    params = lstm.init_lstm_params(jax.random.PRNGKey(0), 7, 6,
                                   use_peepholes=True)
    x = jnp.asarray(np.random.RandomState(3).randn(5, 9, 7).astype(np.float32))
    mask = np.ones((5, 9), np.float32)
    mask[2, 5:] = 0
    mask = jnp.asarray(mask)
    for bwd in (False, True):
        ref = lstm.lstm_forward(params, x, mask, backwards=bwd)
        got = lstm_kernel.lstm_forward_pallas(params, x, mask, backwards=bwd,
                                              matmul_dtype=None, block_b=5,
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pallas_peep_train_kernels_interpret_match_autodiff(monkeypatch):
    """Force the peephole train/backward Pallas kernels (interpret mode)
    through the custom-VJP core; values and every gradient — including the
    three peephole vectors — must match plain autodiff."""
    import functools

    from ip_avsr_tpu.ops.pallas import lstm_kernel

    monkeypatch.setattr(lstm, "_pallas_train_ok",
                        lambda B, T, H, dtype=None: True)
    monkeypatch.setattr(
        lstm_kernel, "lstm_pallas_peep_train",
        functools.partial(lstm_kernel.lstm_pallas_peep_train, block_b=4,
                          interpret=True))
    monkeypatch.setattr(
        lstm_kernel, "lstm_pallas_peep_bwd_chain",
        functools.partial(lstm_kernel.lstm_pallas_peep_bwd_chain, block_b=4,
                          interpret=True))
    monkeypatch.setattr(
        lstm_kernel, "lstm_pallas_peep",
        functools.partial(lstm_kernel.lstm_pallas_peep, block_b=4,
                          interpret=True))
    # the non-peephole kernels get forced too by the _pallas_train_ok patch
    monkeypatch.setattr(
        lstm_kernel, "lstm_pallas_train",
        functools.partial(lstm_kernel.lstm_pallas_train, block_b=4,
                          interpret=True))
    monkeypatch.setattr(
        lstm_kernel, "lstm_pallas_bwd_chain",
        functools.partial(lstm_kernel.lstm_pallas_bwd_chain, block_b=4,
                          interpret=True))
    monkeypatch.setattr(
        lstm_kernel, "lstm_pallas",
        functools.partial(lstm_kernel.lstm_pallas, block_b=4, interpret=True))

    rng = np.random.RandomState(0)
    B, T, D, H = 6, 8, 7, 6
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    for peep in (True, False):
        params = lstm.init_lstm_params(jax.random.PRNGKey(1), D, H,
                                       use_peepholes=peep)
        for bwd in (False, True):
            a = lstm.lstm_forward(params, x, mask, backwards=bwd,
                                  use_custom_vjp=True)
            b = lstm.lstm_forward(params, x, mask, backwards=bwd,
                                  use_custom_vjp=False)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"peep={peep} bwd={bwd}")

            def loss(p, custom):
                out = lstm.lstm_forward(p, x, mask, backwards=bwd,
                                        use_custom_vjp=custom)
                return jnp.sum(out * gseed)

            ga = jax.grad(lambda p: loss(p, True))(params)
            gb = jax.grad(lambda p: loss(p, False))(params)
            for k in ga:
                np.testing.assert_allclose(
                    np.asarray(ga[k]), np.asarray(gb[k]), rtol=1e-4,
                    atol=1e-5, err_msg=f"{k} peep={peep} bwd={bwd}")


def test_lstm_remat_grads_match_and_save_memory():
    """remat=True: gradients equal the full-residual custom VJP (and plain
    autodiff) up to matmul reduction order, and the compiled backward's
    peak temp memory is smaller (the (T,B,4H) gates residual is gone)."""
    rng = np.random.RandomState(0)
    B, T, D, H = 4, 64, 12, 16
    params = lstm.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    def loss(p, remat, custom=True, bwd=False):
        out = lstm.lstm_forward(p, x, mask, backwards=bwd,
                                use_custom_vjp=custom, remat=remat)
        return jnp.sum(out * gseed)

    for bwd in (False, True):
        out_r = lstm.lstm_forward(params, x, mask, backwards=bwd, remat=True)
        out_f = lstm.lstm_forward(params, x, mask, backwards=bwd, remat=False)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_f),
                                   rtol=1e-6, atol=1e-7)
        g_r = jax.grad(lambda p: loss(p, True, bwd=bwd))(params)
        g_f = jax.grad(lambda p: loss(p, False, bwd=bwd))(params)
        g_a = jax.grad(lambda p: loss(p, False, custom=False, bwd=bwd))(params)
        for k in g_r:
            np.testing.assert_allclose(np.asarray(g_r[k]), np.asarray(g_f[k]),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{k} bwd={bwd} (vs full)")
            np.testing.assert_allclose(np.asarray(g_r[k]), np.asarray(g_a[k]),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{k} bwd={bwd} (vs autodiff)")

    # objective memory check: residual bytes held across the backward (the
    # vjp closure IS a pytree of the saved residuals).  With 5 recurrences
    # (stream LSTM + 2 BLSTM layers) dropping each layer's (T, B, 4H) gates
    # roughly halves the live residual set — the quantity that bounds how
    # long a sequence fits in HBM (XLA temp-peak accounting on CPU hides
    # this behind buffer-reuse scheduling, so measure the residuals
    # themselves).
    from ip_avsr_tpu.models import adenet as adenet_mod
    from ip_avsr_tpu.models.adenet import AdeNetConfig, StreamSpec

    def residual_bytes(remat):
        cfg = AdeNetConfig(
            streams=[StreamSpec(input_dim=12, name="s1", use_delta=False,
                                use_lstm=True)],
            output_classes=4, lstm_size=16, agg_layers=2,
            agg_bidirectional=True, output_mode="per_step",
            lstm_remat=remat)
        p = adenet_mod.init_adenet_params(jax.random.PRNGKey(1), cfg)
        _, vjp_fn = jax.vjp(
            lambda p: jnp.sum(adenet_mod.adenet_forward(p, cfg, [x], mask,
                                                        train=True)), p)
        return sum(l.nbytes for l in jax.tree_util.tree_leaves(vjp_fn)
                   if hasattr(l, "nbytes"))

    full, lean = residual_bytes(False), residual_bytes(True)
    assert lean < 0.65 * full, (lean, full)


def test_lstm_remat_peephole_grads_match():
    """Peephole remat: forward identical, gradients equal the full-residual
    peephole custom VJP AND plain autodiff (the rebuilt pre-peephole gates
    plus saved-cell peephole terms must reproduce the saved-gates math)."""
    rng = np.random.RandomState(3)
    B, T, D, H = 4, 48, 12, 16
    params = lstm.init_lstm_params(jax.random.PRNGKey(4), D, H,
                                   use_peepholes=True)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    def loss(p, remat, custom=True, bwd=False):
        out = lstm.lstm_forward(p, x, mask, backwards=bwd,
                                use_custom_vjp=custom, remat=remat)
        return jnp.sum(out * gseed)

    for bwd in (False, True):
        out_r = lstm.lstm_forward(params, x, mask, backwards=bwd, remat=True)
        out_f = lstm.lstm_forward(params, x, mask, backwards=bwd, remat=False)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_f),
                                   rtol=1e-6, atol=1e-7)
        g_r = jax.grad(lambda p: loss(p, True, bwd=bwd))(params)
        g_f = jax.grad(lambda p: loss(p, False, bwd=bwd))(params)
        g_a = jax.grad(lambda p: loss(p, False, custom=False, bwd=bwd))(params)
        for k in g_r:
            np.testing.assert_allclose(np.asarray(g_r[k]), np.asarray(g_f[k]),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{k} bwd={bwd} (vs full)")
            np.testing.assert_allclose(np.asarray(g_r[k]), np.asarray(g_a[k]),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"{k} bwd={bwd} (vs autodiff)")


@pytest.mark.parametrize("peep", [False, True])
@pytest.mark.parametrize("remat", [False, True])
def test_lstm_bf16_residuals_grad_tolerance(peep, remat):
    """residual_dtype=bfloat16: forward is UNCHANGED (outputs stay f32 from
    the same recurrence), gradients match the f32-residual gradients to
    bf16-quantization tolerance, and gradient dtypes/structure are intact.
    Composes with remat (then only hids/cells are stored, quantized)."""
    rng = np.random.RandomState(5)
    B, T, D, H = 4, 32, 12, 16
    params = lstm.init_lstm_params(jax.random.PRNGKey(6), D, H,
                                   use_peepholes=peep)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    def loss(p, resd):
        out = lstm.lstm_forward(p, x, mask, remat=remat, residual_dtype=resd)
        return jnp.sum(out * gseed)

    out_q = lstm.lstm_forward(params, x, mask, remat=remat,
                              residual_dtype=jnp.bfloat16)
    out_f = lstm.lstm_forward(params, x, mask, remat=remat)
    assert out_q.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_f))

    g_q = jax.grad(lambda p: loss(p, jnp.bfloat16))(params)
    g_f = jax.grad(lambda p: loss(p, None))(params)
    for k in g_q:
        a, b = np.asarray(g_q[k]), np.asarray(g_f[k])
        assert g_q[k].dtype == params[k].dtype, k
        # bf16 has ~3 decimal digits; compare on the scale of the gradient
        denom = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / denom, b / denom, atol=3e-2,
                                   err_msg=f"{k} peep={peep} remat={remat}")


@pytest.mark.parametrize("peep,remat", [(False, False), (True, False),
                                        (False, True), (True, True)])
def test_lstm_custom_vjp_matches_finite_differences(peep, remat):
    """Autodiff-INDEPENDENT gradient check: directional derivatives of the
    custom-VJP LSTM cores against central finite differences of the primal.
    Every other gradient test compares two autodiff paths (custom VJP vs
    plain), which would agree on a shared semantic mistake; this one can't.
    grad_clipping=0: the clip's forward is the identity, so FD measures the
    TRUE gradient, which clipping deliberately alters."""
    rng = np.random.RandomState(0)
    B, T, D, H = 2, 5, 3, 4
    params = lstm.init_lstm_params(jax.random.PRNGKey(0), D, H,
                                   use_peepholes=peep)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[1, 3:] = 0.0
    mask = jnp.asarray(mask)
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    leaves, treedef = jax.tree_util.tree_flatten(params)

    def loss_flat(flat_vals):
        p = jax.tree_util.tree_unflatten(treedef, flat_vals)
        out = lstm.lstm_forward(p, x, mask, grad_clipping=0.0, remat=remat)
        return jnp.sum(out * gseed)

    grads = jax.grad(lambda fv: loss_flat(fv))(leaves)
    g_vec = np.concatenate([np.asarray(g).ravel() for g in grads])

    sizes = [int(np.prod(l.shape)) for l in leaves]
    total = sum(sizes)
    f = lambda vec: float(loss_flat([  # noqa: E731
        jnp.asarray(vec[sum(sizes[:i]):sum(sizes[:i + 1])])
        .reshape(leaves[i].shape).astype(jnp.float32)
        for i in range(len(leaves))]))
    base = np.concatenate([np.asarray(l).ravel() for l in leaves]).astype(np.float64)

    eps = 1e-3
    dir_rng = np.random.RandomState(7)
    for _ in range(5):
        d = dir_rng.randn(total)
        d /= np.linalg.norm(d)
        fd = (f(base + eps * d) - f(base - eps * d)) / (2 * eps)
        analytic = float(np.dot(g_vec, d))
        np.testing.assert_allclose(analytic, fd, rtol=2e-2, atol=2e-3,
                                   err_msg=f"peep={peep} remat={remat}")


@pytest.mark.parametrize("peep", [False, True])
def test_lstm_chunked_state_carry_matches_one_shot(peep):
    """initial_state/return_state (the streaming plumbing): advancing the
    recurrence in chunks reproduces the one-shot hidden states exactly,
    including masked steps carrying state through."""
    key = jax.random.PRNGKey(0)
    p = lstm.init_lstm_params(key, 6, 5, use_peepholes=peep)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, 6).astype(np.float32)
    m = (np.arange(11)[None] < np.array([[11], [7]])).astype(np.float32)
    full = lstm.lstm_forward(p, jnp.asarray(x), jnp.asarray(m),
                             use_custom_vjp=False)

    outs, st, s = [], None, 0
    for n in (4, 4, 3):
        o, st = lstm.lstm_forward(p, jnp.asarray(x[:, s:s + n]),
                                  jnp.asarray(m[:, s:s + n]),
                                  initial_state=st, return_state=True)
        outs.append(np.asarray(o))
        s += n
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(full), atol=1e-6)

    with pytest.raises(ValueError, match="backwards"):
        lstm.lstm_forward(p, jnp.asarray(x), jnp.asarray(m),
                          backwards=True, return_state=True)
