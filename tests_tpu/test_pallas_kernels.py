"""On-chip validation of the Pallas kernels against their XLA formulations.

The reference's equivalents are Theano-compiled scans (utils/signal.py:59-80
for the delta filter; Lasagne LSTMLayer for the recurrence); here the source
of truth is the repo's own XLA path, which the CPU suite pins to the
reference numerics.  These tests close the remaining gap: the Mosaic-lowered
kernels must match the XLA path on real hardware, forward AND backward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ip_avsr_tpu.ops import delta as delta_ops
from ip_avsr_tpu.ops import lstm as lstm_ops
from ip_avsr_tpu.ops.pallas import delta_kernel, lstm_kernel


def _delta_input(B=8, T=24, D=256, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, T, D).astype(np.float32))


def test_delta_forward_matches_xla_on_tpu():
    x = _delta_input()
    got = delta_kernel.append_delta_pallas(x, 9)
    want = delta_ops.append_delta_coeff(x, 9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_delta_grads_match_xla_on_tpu():
    """grads through the kernel's custom VJP == grads through pure XLA."""
    x = _delta_input(B=4, T=16, D=256, seed=1)
    w = jnp.asarray(np.random.RandomState(2).randn(3 * x.shape[-1]).astype(np.float32))

    def loss(fn):
        def f(v):
            y = fn(v, 9)
            return jnp.sum(jnp.tanh(y @ w))
        return f

    g_pallas = jax.grad(loss(delta_kernel.append_delta_pallas))(x)
    g_xla = jax.grad(loss(delta_ops.append_delta_coeff))(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-4)


def test_delta_dispatch_under_training_uses_pallas():
    """delta_layer's auto dispatch must pick the kernel for train-sized input
    and still differentiate (regression for the forward-only-era gating) —
    and its values AND gradients must equal the forced-XLA path (finiteness
    alone would also pass if dispatch regressed to XLA, or if the kernel's
    VJP were finite-but-wrong; review r5)."""
    x = _delta_input(B=16, T=29, D=256, seed=3)
    assert delta_kernel.should_use_pallas(x, 9)
    out_auto = delta_ops.delta_layer(x, 9)  # dispatches the kernel
    out_xla = delta_ops.delta_layer(x, 9, use_pallas="never")
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)
    g_auto = jax.grad(lambda v: jnp.sum(delta_ops.delta_layer(v, 9) ** 2))(x)
    g_xla = jax.grad(lambda v: jnp.sum(
        delta_ops.delta_layer(v, 9, use_pallas="never") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-4)


def test_lstm_kernel_matches_scan_on_tpu():
    rng = np.random.RandomState(0)
    B, T, D, H = 8, 12, 64, 128
    params = lstm_ops.init_lstm_params(
        jax.random.PRNGKey(0), D, H,
        lambda k, s, dtype=jnp.float32: 0.1 * jax.random.normal(k, s, dtype),
        use_peepholes=False)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    for bwd in (False, True):
        got = lstm_kernel.lstm_forward_pallas(params, x, mask, backwards=bwd,
                                              matmul_dtype=None)
        want = lstm_ops.lstm_forward(params, x, mask, backwards=bwd,
                                     matmul_dtype=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_lstm_custom_vjp_grads_on_tpu():
    """Batched-weight-gradient custom VJP vs plain autodiff on real hardware
    (f32 matmuls; bf16 covered by the CPU tolerance tests + bench)."""
    rng = np.random.RandomState(0)
    B, T, D, H = 8, 12, 64, 128
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    def loss(p, custom):
        out = lstm_ops.lstm_forward(p, x, mask, use_custom_vjp=custom)
        return jnp.sum(out * gseed)

    ga = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    gb = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    for k in ga:
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   rtol=5e-4, atol=5e-5, err_msg=k)


def test_lstm_train_kernels_dispatch_and_match_on_tpu():
    """At training shapes the custom-VJP core dispatches the Pallas forward
    (residual-emitting) and backward-chain kernels; values and grads must
    match the pure-XLA autodiff path."""
    from ip_avsr_tpu.ops.pallas import lstm_kernel

    rng = np.random.RandomState(0)
    B, T, D, H = 128, 16, 64, 128
    assert lstm_kernel.should_use_pallas_train(B, T, H)
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    for bwd in (False, True):
        a = lstm_ops.lstm_forward(params, x, mask, backwards=bwd,
                                  use_custom_vjp=True)
        b = lstm_ops.lstm_forward(params, x, mask, backwards=bwd,
                                  use_custom_vjp=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

        def loss(p, custom):
            out = lstm_ops.lstm_forward(p, x, mask, backwards=bwd,
                                        use_custom_vjp=custom)
            return jnp.sum(out * gseed)

        ga = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
        gb = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        for k in ga:
            a, bb = np.asarray(ga[k]), np.asarray(gb[k])
            # scale-relative bound: TPU f32 matmuls default to bf16-passes,
            # so tiny forward diffs chain into the big (T*B)-row reductions
            scale = np.max(np.abs(bb)) + 1e-12
            np.testing.assert_allclose(a / scale, bb / scale, rtol=0, atol=1e-3,
                                       err_msg=f"{k} bwd={bwd}")


def test_lstm_peep_kernel_matches_scan_on_tpu():
    """Peephole inference kernel (the reference-default configuration,
    custom/layers.py:10 use_peepholes) vs the XLA scan on real hardware."""
    rng = np.random.RandomState(0)
    B, T, D, H = 8, 12, 64, 128
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H,
                                       use_peepholes=True)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    for bwd in (False, True):
        got = lstm_kernel.lstm_forward_pallas(params, x, mask, backwards=bwd,
                                              matmul_dtype=None)
        want = lstm_ops.lstm_forward(params, x, mask, backwards=bwd,
                                     matmul_dtype=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_lstm_peep_train_kernels_dispatch_and_match_on_tpu():
    """Training-path peephole kernels (residual-emitting forward + backward
    chain with in-scratch peephole-gradient accumulators): values and every
    gradient — including w_cell_to_* — must match pure-XLA autodiff."""
    rng = np.random.RandomState(0)
    B, T, D, H = 128, 16, 64, 128
    assert lstm_kernel.should_use_pallas_train(B, T, H)
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H,
                                       use_peepholes=True)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    for bwd in (False, True):
        a = lstm_ops.lstm_forward(params, x, mask, backwards=bwd,
                                  use_custom_vjp=True)
        b = lstm_ops.lstm_forward(params, x, mask, backwards=bwd,
                                  use_custom_vjp=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

        def loss(p, custom):
            out = lstm_ops.lstm_forward(p, x, mask, backwards=bwd,
                                        use_custom_vjp=custom)
            return jnp.sum(out * gseed)

        ga = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
        gb = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        for k in ga:
            a2, b2 = np.asarray(ga[k]), np.asarray(gb[k])
            scale = np.max(np.abs(b2)) + 1e-12
            np.testing.assert_allclose(a2 / scale, b2 / scale, rtol=0,
                                       atol=1e-3, err_msg=f"{k} bwd={bwd}")


def test_lstm_remat_grads_match_on_tpu():
    """lstm_remat (gate-residual rematerialization) gradient equality on
    real hardware, against the full-residual custom VJP."""
    rng = np.random.RandomState(0)
    B, T, D, H = 128, 16, 64, 128
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    def loss(p, remat):
        return jnp.sum(lstm_ops.lstm_forward(p, x, mask, remat=remat) * gseed)

    ga = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    gb = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    for k in ga:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        scale = np.max(np.abs(b)) + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=1e-3,
                                   err_msg=k)


def test_lstm_bf16_residuals_on_tpu():
    """residual_dtype=bfloat16 at Pallas-train shapes: the quantized
    residual stacks sit BETWEEN the Pallas forward and backward kernels
    (fwd outputs cast down, bwd inputs cast back up).  Forward unchanged;
    gradients within bf16-quantization tolerance of the f32-residual path;
    same check for peephole kernels and for the remat (scan) path."""
    from ip_avsr_tpu.ops.pallas import lstm_kernel

    rng = np.random.RandomState(4)
    B, T, D, H = 128, 16, 64, 128
    assert lstm_kernel.should_use_pallas_train(B, T, H)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = rng.randint(T // 2, T + 1, B)
    mask = jnp.asarray((np.arange(T)[None, :] < lens[:, None]).astype(np.float32))
    gseed = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

    for peep, remat in ((False, False), (True, False), (False, True),
                        (True, True)):
        params = lstm_ops.init_lstm_params(jax.random.PRNGKey(6), D, H,
                                           use_peepholes=peep)

        def loss(p, resd):
            out = lstm_ops.lstm_forward(p, x, mask, remat=remat,
                                        residual_dtype=resd)
            return jnp.sum(out * gseed)

        out_q = lstm_ops.lstm_forward(params, x, mask, remat=remat,
                                      residual_dtype=jnp.bfloat16)
        out_f = lstm_ops.lstm_forward(params, x, mask, remat=remat)
        np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                                   rtol=0, atol=0,
                                   err_msg=f"peep={peep} remat={remat}")

        gq = jax.jit(jax.grad(lambda p: loss(p, jnp.bfloat16)))(params)
        gf = jax.jit(jax.grad(lambda p: loss(p, None)))(params)
        for k in gq:
            a, b = np.asarray(gq[k]), np.asarray(gf[k])
            scale = np.max(np.abs(b)) + 1e-12
            np.testing.assert_allclose(
                a / scale, b / scale, rtol=0, atol=3e-2,
                err_msg=f"{k} peep={peep} remat={remat}")
