"""Optimizer update rules vs. hand-computed Lasagne formulas."""

import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.train import optimizers as opt


def _setup():
    params = {"w": jnp.asarray([[1.0, -2.0]]), "b": jnp.asarray([0.5])}
    grads = {"w": jnp.asarray([[0.1, -0.3]]), "b": jnp.asarray([0.2])}
    return params, grads


def test_adam_matches_reference_formula():
    params, grads = _setup()
    o = opt.adam(learning_rate=0.01)
    state = o.init(params)
    new_params, state = o.apply(params, grads, state)
    # after one step: m = 0.1g, v = 0.001g^2, a = lr*sqrt(1-b2)/(1-b1)
    g = np.asarray(grads["w"])
    a_t = 0.01 * np.sqrt(1 - 0.999) / (1 - 0.9)
    step = a_t * (0.1 * g) / (np.sqrt(0.001 * g * g) + 1e-8)
    np.testing.assert_allclose(np.asarray(new_params["w"]),
                               np.asarray(params["w"]) - step, rtol=1e-6)
    assert float(state["t"]) == 1.0


def test_adam_second_step_bias_correction():
    params, grads = _setup()
    o = opt.adam(learning_rate=0.01)
    state = o.init(params)
    p1, state = o.apply(params, grads, state)
    p2, state = o.apply(p1, grads, state)
    g = np.asarray(grads["w"])
    m2 = 0.9 * 0.1 * g + 0.1 * g
    v2 = 0.999 * 0.001 * g * g + 0.001 * g * g
    a2 = 0.01 * np.sqrt(1 - 0.999 ** 2) / (1 - 0.9 ** 2)
    step2 = a2 * m2 / (np.sqrt(v2) + 1e-8)
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]) - step2, rtol=1e-6)


def test_adadelta_matches_reference_formula():
    params, grads = _setup()
    o = opt.adadelta()  # lr=1.0, rho=0.95, eps=1e-6
    state = o.init(params)
    new_params, state = o.apply(params, grads, state)
    g = np.asarray(grads["w"])
    accu = 0.05 * g * g
    update = g * np.sqrt(1e-6) / np.sqrt(accu + 1e-6)
    np.testing.assert_allclose(np.asarray(new_params["w"]),
                               np.asarray(params["w"]) - update, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state["delta_accu"]["w"]), 0.05 * update ** 2,
                               rtol=1e-6)


def test_adam_vlr_per_param_rates():
    params, grads = _setup()
    lr_map = opt.generate_lr_map(params, {"w": 0.1}, default=0.001)
    assert lr_map["w"] == 0.1 and lr_map["b"] == 0.001
    o = opt.adam_vlr(lr_map)
    state = o.init(params)
    new_params, _ = o.apply(params, grads, state)
    # w moves ~100x more than with the default rate
    dw = np.abs(np.asarray(new_params["w"] - params["w"])).max()
    db = np.abs(np.asarray(new_params["b"] - params["b"])).max()
    assert dw > db * 50


def test_momentum_and_nesterov():
    params, grads = _setup()
    o = opt.momentum(0.1, 0.9)
    state = o.init(params)
    p1, state = o.apply(params, grads, state)
    np.testing.assert_allclose(np.asarray(p1["w"]),
                               np.asarray(params["w"]) - 0.1 * np.asarray(grads["w"]),
                               rtol=1e-6)
    o = opt.nesterov_momentum(0.1, 0.9)
    state = o.init(params)
    p1, state = o.apply(params, grads, state)
    v1 = -0.1 * np.asarray(grads["w"])
    expected = np.asarray(params["w"]) + 0.9 * v1 - 0.1 * np.asarray(grads["w"])
    np.testing.assert_allclose(np.asarray(p1["w"]), expected, rtol=1e-6)


def test_learning_rate_override_is_traceable():
    import jax

    params, grads = _setup()
    o = opt.adam(learning_rate=0.01)
    state = o.init(params)

    @jax.jit
    def step(p, g, s, lr):
        return o.apply(p, g, s, learning_rate=lr)

    p1, _ = step(params, grads, state, jnp.asarray(0.01))
    p2, _ = step(params, grads, state, jnp.asarray(0.001))
    assert np.abs(np.asarray(p1["w"] - p2["w"])).max() > 0
