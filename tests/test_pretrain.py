"""RBM/DBN pretraining: formula checks, stack shapes, unfold ABI, finetune."""

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.io import matio
from ip_avsr_tpu.pretrain import dbn as dbn_lib
from ip_avsr_tpu.pretrain import finetune, rbm, unfold


def test_activations_match_matlab_formulas():
    x = jnp.asarray([[-2.0, 0.0, 3.0]])
    np.testing.assert_allclose(np.asarray(rbm.compute_activations("sigm", x)),
                               1 / (1 + np.exp(-np.asarray(x))), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rbm.compute_activations("linear", x)),
                               np.asarray(x))
    np.testing.assert_allclose(np.asarray(rbm.compute_activations("ReLu", x)),
                               [[0, 0, 3]])
    np.testing.assert_allclose(np.asarray(rbm.compute_activations("leakyReLu", x)),
                               [[-0.02, 0, 3]], atol=1e-7)
    np.testing.assert_allclose(np.asarray(rbm.compute_activations("softsign", x)),
                               np.asarray(x) / (1 + np.abs(np.asarray(x))), rtol=1e-6)


def test_states_sampling_semantics():
    key = jax.random.PRNGKey(0)
    probs = jnp.full((2000, 4), 0.7)
    states = rbm.compute_states("sigm", probs, probs, key)
    assert set(np.unique(np.asarray(states))) <= {0.0, 1.0}
    np.testing.assert_allclose(np.asarray(states).mean(), 0.7, atol=0.05)

    x = jnp.zeros((2000, 4))
    lin = rbm.compute_states("linear", x, x, key)
    np.testing.assert_allclose(np.asarray(lin).std(), 1.0, atol=0.05)

    pre = jnp.full((2000, 4), 5.0)
    relu = rbm.compute_states("ReLu", pre, pre, key)
    assert np.asarray(relu).min() >= 0.0
    np.testing.assert_allclose(np.asarray(relu).mean(), 5.0, atol=0.1)


def test_cd1_step_deterministic_update_rule():
    """With linear vis / linear hid and zero noise keys the update must equal
    the hand-computed momentum-SGD CD-1 rule."""
    # use sigm probs (deterministic activations) but verify against a manual
    # numpy replica that uses the same sampled states.
    key = jax.random.PRNGKey(0)
    state = rbm.init_rbm(key, 6, 4, "sigm", "sigm")
    velocity = {k: jnp.zeros_like(v) for k, v in state.items()}
    data = jnp.asarray(np.random.RandomState(0).rand(8, 6).astype(np.float32))
    mask = jnp.ones((8, 1), jnp.float32)
    step_key = jax.random.PRNGKey(42)

    new_state, new_vel, err = rbm.cd1_step(
        {k: v.copy() for k, v in state.items()},
        {k: v.copy() for k, v in velocity.items()},
        data, mask, step_key, jnp.asarray(0.5), tuple(jnp.asarray(r) for r in (0.1, 0.1, 0.1)),
        vl_type="sigm", hl_type="sigm", cd_type=1, batchsize=8)

    # numpy replica with identical keys
    k1, k2, k3 = jax.random.split(step_key, 3)
    w = np.asarray(state["weights"]); hb = np.asarray(state["hidbiases"]); vb = np.asarray(state["visbiases"])
    d = np.asarray(data)
    sig = lambda v: 1 / (1 + np.exp(-v))
    pos_probs = sig(d @ w + hb)
    pos_states = (pos_probs > np.asarray(jax.random.uniform(k1, pos_probs.shape))).astype(np.float32)
    neg_vis = sig(pos_states @ w.T + vb)
    neg_hid = sig(neg_vis @ w + hb)
    gw = (d.T @ pos_probs - neg_vis.T @ neg_hid) / 8
    dw = 0.5 * 0 + 0.1 * (gw - 0.0002 * w)
    np.testing.assert_allclose(np.asarray(new_state["weights"]), w + dw, atol=1e-5)
    exp_err = np.sum((d - neg_vis) ** 2)
    np.testing.assert_allclose(float(err), exp_err, rtol=1e-4)


def test_cd1_padded_batch_equals_small_batch():
    """Zero-padded rows with mask must reproduce the plain smaller batch."""
    key = jax.random.PRNGKey(1)
    state = rbm.init_rbm(key, 5, 3, "sigm", "sigm")
    velocity = {k: jnp.zeros_like(v) for k, v in state.items()}
    data_small = np.random.RandomState(1).rand(4, 5).astype(np.float32)
    step_key = jax.random.PRNGKey(7)

    padded = np.zeros((6, 5), np.float32)
    padded[:4] = data_small
    mask = np.zeros((6, 1), np.float32)
    mask[:4] = 1.0

    out_pad, _, err_pad = rbm.cd1_step(
        {k: v.copy() for k, v in state.items()}, {k: v.copy() for k, v in velocity.items()},
        jnp.asarray(padded), jnp.asarray(mask), step_key, jnp.asarray(0.5),
        tuple(jnp.asarray(r) for r in (0.1, 0.1, 0.1)),
        vl_type="sigm", hl_type="sigm", cd_type=1, batchsize=4)

    # the masked pad rows must contribute NOTHING: fill them with garbage
    # instead of zeros — if any reduction forgot the mask, the weights or
    # the reconstruction error would shift (the previous version of this
    # test compared two byte-identical calls — review r5 finding)
    garbage = padded.copy()
    garbage[4:] = 1e3 * np.random.RandomState(9).randn(2, 5)
    out_ref, _, err_ref = rbm.cd1_step(
        {k: v.copy() for k, v in state.items()}, {k: v.copy() for k, v in velocity.items()},
        jnp.asarray(garbage), jnp.asarray(mask), step_key, jnp.asarray(0.5),
        tuple(jnp.asarray(r) for r in (0.1, 0.1, 0.1)),
        vl_type="sigm", hl_type="sigm", cd_type=1, batchsize=4)
    np.testing.assert_allclose(np.asarray(out_pad["weights"]),
                               np.asarray(out_ref["weights"]), atol=1e-6)
    np.testing.assert_allclose(float(err_pad), float(err_ref), rtol=1e-5)
    # and the step itself must have moved the weights (non-vacuous)
    assert np.abs(np.asarray(out_pad["weights"])
                  - np.asarray(state["weights"])).max() > 0


def test_train_rbm_reduces_error():
    rng = np.random.RandomState(0)
    # two binary prototype patterns + noise
    protos = rng.rand(2, 16) > 0.5
    data = np.repeat(protos, 60, axis=0).astype(np.float32)
    data = np.abs(data - (rng.rand(*data.shape) < 0.05))
    hyper = rbm.RBMHyperParams(epochs=8, batchsize=20)
    _, errors = rbm.train_rbm(jax.random.PRNGKey(0), data, 8, "sigm", "sigm", hyper,
                              log_fn=lambda s: None)
    assert errors[-1] < errors[0]


def test_dbn_stack_and_unfold_ae_abi(tmp_path):
    rng = np.random.RandomState(0)
    data = (rng.rand(80, 12) > 0.5).astype(np.float32)
    hyper = rbm.RBMHyperParams(epochs=1, batchsize=20)
    hidden = [8, 6, 4]
    acts = ["sigm", "sigm", "linear"]
    d = dbn_lib.train_dbn(jax.random.PRNGKey(0), data, hidden, acts,
                          hyper=hyper, log_fn=lambda s: None)
    assert [w.shape for w in d["W"]] == [(12, 8), (8, 6), (6, 4)]

    nn = unfold.unfold_dbn_to_nn(d, 1, hidden, acts, "sigm", output_size=12)
    # 2n-1 mirrored + output: weights count = 2n
    assert len(nn["W"]) == 6
    assert nn["W"][3].shape == (4, 6)  # W3^T
    np.testing.assert_allclose(nn["W"][3], d["W"][2].T)
    assert nn["activationFunctions"] == ["sigm", "sigm", "linear", "sigm", "sigm", "sigm"]
    assert nn["layers"] == [8, 6, 4, 6, 8, 12]

    # extractNN -> .mat ABI -> load_dbn round trip
    flat = unfold.extract_nn(nn)
    matio.save_mat(flat, tmp_path / "ae.mat")
    w, b = matio.load_dbn_mat(str(tmp_path / "ae.mat"), n_layers=6)
    np.testing.assert_allclose(w[0], d["W"][0], atol=1e-6)
    assert b[0].shape == (8,)


def test_unfold_to_classifier():
    d = {"W": [np.ones((4, 3))], "hidbiases": [np.zeros((1, 3))],
         "visbiases": [np.zeros((1, 4))]}
    nn = unfold.unfold_dbn_to_nn(d, 2, [3], ["sigm"], "sigm", output_size=5,
                                 rng=np.random.RandomState(0))
    assert nn["W"][-1].shape == (3, 5)
    assert nn["activationFunctions"] == ["sigm", "softmax"]


def test_finetune_autoencoder_improves_reconstruction():
    rng = np.random.RandomState(0)
    data = rng.rand(64, 10).astype(np.float32)
    w = [0.1 * rng.randn(10, 6).astype(np.float32), 0.1 * rng.randn(6, 10).astype(np.float32)]
    b = [np.zeros(6, np.float32), np.zeros(10, np.float32)]
    acts = ["sigm", "linear"]

    def recon_err(weights, biases):
        p = finetune.ae_params_from_lists(weights, biases)
        r = finetune.ae_forward(p, jnp.asarray(data), acts)
        return float(jnp.mean((r - data) ** 2))

    before = recon_err(w, b)
    w2, b2 = finetune.finetune_autoencoder(w, b, acts, data, epochs=20, batchsize=32,
                                           log_fn=lambda s: None)
    after = recon_err(w2, b2)
    assert after < before


def test_train_convae_runs_and_improves():
    from ip_avsr_tpu.models.convae import ConvAEConfig

    rng = np.random.RandomState(0)
    # low-rank structured images: a few prototype patterns plus noise
    protos = rng.rand(3, 1200).astype(np.float32)
    data = protos[rng.randint(0, 3, 24)] + 0.05 * rng.randn(24, 1200).astype(np.float32)
    data = (data - data.mean()) / data.std()
    cfg = ConvAEConfig(bottleneck=8, dense=16)
    params, history = finetune.train_convae(data, cfg, epochs=8, batchsize=8,
                                            log_fn=lambda s: None)
    assert min(history) < history[0]
    assert np.isfinite(history).all()
