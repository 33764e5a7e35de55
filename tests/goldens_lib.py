"""Golden-fixture computation: frozen (seeds -> outputs) for the zoo and the
preprocessing chain.

VERDICT r2 gap 5: accuracy parity rested on two implementations that both
live in this repo plus formula tests — nothing pinned *today's* numerics
against *tomorrow's* refactor.  These fixtures freeze the outputs of every
zoo forward, the conv-AE family, and the whole preprocessing chain under
fixed seeds; ``tests/test_goldens.py`` recomputes them each run and compares
against the committed ``tests/goldens/goldens.npz``.  A refactor that
changes numerics now fails CI on its own, without ``reference_impl.py``
having to disagree.

Regenerate (ONLY after an intentional numerics change, with the parity
suite green): ``python scripts/make_goldens.py``.
"""

from __future__ import annotations

import numpy as np

GOLDEN_PATH = __file__.rsplit("/", 1)[0] + "/goldens/goldens.npz"


def _init_pinned(init_fn, *args):
    """Run a param init on the CPU backend and transfer to the default
    device.  The 'ortho' initializer (adenet_v3/v5/v6, w_init="ortho") runs
    a QR decomposition whose numeric path differs across backends (~1e-5 in
    the factors — measured TPU vs CPU — which the recurrent chains amplify
    to ~1e-2 at the output).  Pinning init to CPU makes the golden fixtures
    compare the FORWARD/BACKWARD math across backends, with bit-identical
    parameters, instead of comparing two QR implementations."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        params = init_fn(*args)
    params = jax.tree_util.tree_map(np.asarray, params)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.devices()[0]), params)


def compute_zoo_goldens() -> dict:
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.models import adenet, convae
    from tests.zoo_cases import ZOO_CASES

    out = {}
    for name in sorted(ZOO_CASES):
        cfg = ZOO_CASES[name]()
        params = _init_pinned(adenet.init_adenet_params,
                              jax.random.PRNGKey(3), cfg)
        rng = np.random.RandomState(0)
        B, T = 3, 9
        inputs = [jnp.asarray(rng.randn(B, T, s.input_dim).astype(np.float32))
                  for s in cfg.streams]
        lens = rng.randint(4, T + 1, B)
        mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None])
                           .astype(np.float32))
        out[f"zoo/{name}"] = np.asarray(
            adenet.adenet_forward(params, cfg, inputs, mask, train=False))

    for bn, drop in ((False, False), (True, False), (False, True), (True, True)):
        cfg = convae.ConvAEConfig(bottleneck=10, dense=20, use_batchnorm=bn,
                                  use_dropout=drop)
        params = _init_pinned(convae.init_convae_params,
                              jax.random.PRNGKey(5), cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 30 * 40)
                        .astype(np.float32))
        out[f"convae/bn{int(bn)}_drop{int(drop)}"] = np.asarray(
            convae.convae_forward(params, cfg, x, train=False))
    return out


def compute_preprocessing_goldens() -> dict:
    from ip_avsr_tpu.data import preprocessing as pp

    rng = np.random.RandomState(7)
    seqlens = np.array([9, 6, 12])  # multiples of the embed step (reference factorize()-s first)
    X = rng.randn(int(seqlens.sum()), 24).astype(np.float32)
    img = (rng.rand(int(seqlens.sum()), 30 * 40) * 255).astype(np.float32)

    out = {
        "pp/deltas_python_ref": pp.deltas(X.T, 9).astype(np.float32),
        "pp/deltas_matlab": pp.deltas(X.T, 9, pad_mode="matlab").astype(np.float32),
        "pp/concat_first_second_deltas":
            pp.concat_first_second_deltas(X, seqlens, w=9).astype(np.float32),
        "pp/diff_images": pp.compute_diff_images(img, seqlens).astype(np.float32),
        "pp/normalize_input": pp.normalize_input(img).astype(np.float32),
        "pp/seqwise_mean_sub":
            pp.sequencewise_mean_image_subtraction(img, seqlens).astype(np.float32),
        "pp/zigzag": pp.zigzag(img[0].reshape(30, 40, order="F")).astype(np.float32),
        "pp/reorder_f_to_c": pp.reorder_data(img[:4], (30, 40)).astype(np.float32),
        "pp/zca": pp.zca_whiten(img[:8] / 255.0).astype(np.float32),
    }
    fn, mean, std = pp.featurewise_normalize_sequence(img)
    out["pp/featurewise_norm"] = fn.astype(np.float32)
    out["pp/featurewise_mean"] = mean.astype(np.float32)
    out["pp/featurewise_std"] = std.astype(np.float32)
    for method in ("zigzag", "rel_variance", "variance", "energy"):
        out[f"pp/dct_{method}"] = pp.compute_dct_features(
            img[:5], (30, 40), no_coeff=30, method=method).astype(np.float32)
    targets = rng.randint(0, 5, len(X)).astype(np.int64)
    emb, emb_t, emb_len = pp.embed_temporal_info(X, targets, seqlens, 3, 3)
    out["pp/embed_temporal"] = np.asarray(emb, np.float32)
    out["pp/embed_temporal_targets"] = np.asarray(emb_t)
    out["pp/embed_temporal_lens"] = np.asarray(emb_len)
    return out


def compute_gradient_goldens() -> dict:
    """Frozen GRADIENTS for representative training configurations — pins
    the training numerics (custom-VJP LSTM cores, delta VJP, fusion,
    losses, BN train stats) against refactors, complementing the forward
    goldens.  One flattened vector per case (leaf-order stable under the
    param pytree)."""
    import jax
    import jax.numpy as jnp

    from ip_avsr_tpu.models import adenet
    from ip_avsr_tpu.ops import losses
    from tests.zoo_cases import ZOO_CASES

    cases = {
        "adenet_v3": dict(train=True),            # dropout + slice head
        "adenet_v2": dict(train=True),            # per-step head + temporal loss
        "deltanet_majority_vote_peep": dict(train=True),  # peephole core
        "adenet_v1": dict(train=True),            # batch-norm train stats
    }
    out = {}
    for name, kw in cases.items():
        cfg = ZOO_CASES[name]()
        params = _init_pinned(adenet.init_adenet_params,
                              jax.random.PRNGKey(3), cfg)
        rng = np.random.RandomState(0)
        B, T = 3, 9
        inputs = [jnp.asarray(rng.randn(B, T, s.input_dim).astype(np.float32))
                  for s in cfg.streams]
        lens = rng.randint(4, T + 1, B)
        mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None])
                           .astype(np.float32))
        y = jnp.asarray(rng.randint(0, cfg.output_classes, B).astype(np.int32))
        has_bn = any(s.use_batchnorm for s in cfg.streams)

        def loss_fn(p):
            o = adenet.adenet_forward(p, cfg, inputs, mask, train=kw["train"],
                                      dropout_rng=jax.random.PRNGKey(11),
                                      return_aux=kw["train"] and has_bn)
            if isinstance(o, tuple):
                o = o[0]
            if o.ndim == 3:
                y2d = jnp.repeat(y[:, None], T, axis=1)
                return losses.temporal_softmax_loss(o, y2d, mask)
            w = jnp.sum(mask, axis=1) > 0
            return losses.categorical_crossentropy_masked(o, y, w)

        grads = jax.grad(loss_fn)(params)
        flat = np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree_util.tree_leaves(grads)])
        out[f"grad/{name}"] = flat.astype(np.float32)
    return out


def compute_all() -> dict:
    out = {}
    out.update(compute_zoo_goldens())
    out.update(compute_preprocessing_goldens())
    out.update(compute_gradient_goldens())
    return out
