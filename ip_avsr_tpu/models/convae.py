"""Convolutional autoencoder with tied-weight decoder (AVLetters conv-AE).

Parity target: modelzoo/avletters_convae.py:33-69 and its batchnorm/dropout
variants (avletters_convae_bn.py, avletters_convae_drop.py:33-77,
avletters_convae_bndrop.py):

  input (B, 1, 30, 40)
   -> conv 100@5x5 valid, ScaledTanh(0.5, 2.4)   -> (100, 26, 36)
   -> maxpool 2                                  -> (100, 13, 18)
   -> conv 150@5x5 valid                         -> (150, 9, 14)
   -> maxpool 2, pad (1, 0)                      -> (150, 5, 7)
   -> conv 200@3x3 valid                         -> (200, 3, 5) = 3000
   -> dense 500 (ScaledTanh) -> bottleneck E (linear)
   -> decoder mirrors with *tied* weights: dense8 uses bottleneck.W^T,
      dense9 uses dense7.W^T, and each deconv re-uses the matching conv's
      kernel (transposed convolution); decoder biases are its own params.
  The dropout variant widens layers by 1/(1-p) (drop p=0.2 input / 0.5 hidden)
  and the bn variant wraps convs/denses in batch norm.

TPU notes: convs run in NCHW/OIHW via lax.conv_general_dilated (MXU-eligible),
pooling via reduce_window, upscaling via nearest-neighbor repeat.  We use
cross-correlation in the encoder and `lax.conv_transpose` with the same
kernels in the decoder, which preserves the reference's weight tying exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ip_avsr_tpu.ops.nonlinearities import make_scaled_tanh

_DN = ("NCHW", "OIHW", "NCHW")


@dataclasses.dataclass(frozen=True)
class ConvAEConfig:
    bottleneck: int = 50
    dense: int = 500
    image_shape: tuple = (30, 40)
    use_batchnorm: bool = False
    use_dropout: bool = False
    input_dropout: float = 0.2
    hidden_dropout: float = 0.5

    def widened(self, n: int, p: float) -> int:
        return int(n / (1.0 - p)) if self.use_dropout else n

    @property
    def filters(self):
        return (
            self.widened(100, self.input_dropout),
            self.widened(150, self.hidden_dropout),
            self.widened(200, self.hidden_dropout),
        )

    @property
    def dense_mid(self):
        return self.widened(self.dense, self.hidden_dropout)

    @property
    def encode_size(self):
        return self.widened(self.bottleneck, self.hidden_dropout)

    def conv_out_shape(self):
        """Spatial dims after conv5 (static: (3, 5) for 30x40 inputs)."""
        h, w = self.image_shape
        h, w = h - 4, w - 4          # conv1 5x5 valid
        h, w = h // 2, w // 2        # pool 2
        h, w = h - 4, w - 4          # conv3 5x5 valid
        h, w = (h + 2 - 2) // 2 + 1, (w - 2) // 2 + 1  # pool 2 pad (1,0)
        h, w = h - 2, w - 2          # conv5 3x3 valid
        return h, w


def init_convae_params(key, config: ConvAEConfig = ConvAEConfig()) -> dict:
    f1, f2, f3 = config.filters
    ch, cw = config.conv_out_shape()
    flat = f3 * ch * cw
    ks = jax.random.split(key, 5)

    def glorot_conv(k, shape):
        fan_in = shape[1] * shape[2] * shape[3]
        fan_out = shape[0] * shape[2] * shape[3]
        lim = jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(k, shape, jnp.float32, -lim, lim)

    def glorot_dense(k, shape):
        lim = jnp.sqrt(6.0 / sum(shape))
        return jax.random.uniform(k, shape, jnp.float32, -lim, lim)

    params = {
        "conv1": {"w": glorot_conv(ks[0], (f1, 1, 5, 5)), "b": jnp.zeros((f1,))},
        "conv3": {"w": glorot_conv(ks[1], (f2, f1, 5, 5)), "b": jnp.zeros((f2,))},
        "conv5": {"w": glorot_conv(ks[2], (f3, f2, 3, 3)), "b": jnp.zeros((f3,))},
        "dense7": {"w": glorot_dense(ks[3], (flat, config.dense_mid)), "b": jnp.zeros((config.dense_mid,))},
        "bottleneck": {"w": glorot_dense(ks[4], (config.dense_mid, config.encode_size)),
                       "b": jnp.zeros((config.encode_size,))},
        # decoder-only biases (weights are tied to the encoder's)
        "dense8_b": jnp.zeros((config.dense_mid,)),
        "dense9_b": jnp.zeros((flat,)),
        "deconv11_b": jnp.zeros((f2,)),
        "deconv13_b": jnp.zeros((f1,)),
        "deconv15_b": jnp.zeros((1,)),
    }
    if config.use_batchnorm:
        for name, dim in (("conv1", f1), ("conv3", f2), ("conv5", f3),
                          ("dense7", config.dense_mid)):
            params[f"bn_{name}"] = {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}
    return params


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=_DN)
    return y + b[None, :, None, None]


def _maxpool(x, pad_h=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
        ((0, 0), (0, 0), (pad_h, pad_h), (0, 0)),
    )


def _deconv(x, w, b, crop_h=0):
    # transposed convolution of the encoder's cross-correlation: "full" output
    y = jax.lax.conv_transpose(x, w, (1, 1), "VALID", dimension_numbers=_DN,
                               transpose_kernel=True)
    if crop_h:
        y = y[:, :, crop_h:-crop_h, :]
    return y + b[None, :, None, None]


def _upscale(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def _bn(x, p, eps=1e-4):
    """Batch-statistics normalization over all axes but channel (axis 1 for
    conv maps, the feature axis for 2-D dense activations).

    Deliberately uses BATCH statistics in every mode: this conv-AE exists
    only for pretraining, where the reference both trains and inspects
    reconstructions on large full-set batches (avletters_convae.py:290-318),
    so there is no separate small-batch inference regime that would need
    Lasagne's running averages.  Use ops/normalization.batch_norm_forward
    (which does keep running statistics) for models that serve.
    """
    axes = tuple(i for i in range(x.ndim) if i != 1) if x.ndim > 2 else (0,)
    mean = x.mean(axes, keepdims=True)
    var = x.var(axes, keepdims=True)
    shape = [1] * x.ndim
    shape[-1 if x.ndim == 2 else 1] = -1
    return (x - mean) / jnp.sqrt(var + eps) * p["gamma"].reshape(shape) + p["beta"].reshape(shape)


def _dropout(x, rate, rng, train):
    if not train or rate <= 0:
        return x
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)


def convae_encode(params, config: ConvAEConfig, x, train=False, rng=None):
    """(B, H*W) or (B, 1, H, W) -> (B, encode_size) bottleneck codes."""
    act = make_scaled_tanh(0.5, 2.4)
    B = x.shape[0]
    x = x.reshape(B, 1, *config.image_shape)
    rngs = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0), 5)
    drop = config.use_dropout

    if drop:
        x = _dropout(x, config.input_dropout, rngs[0], train)
    h = _conv(x, params["conv1"]["w"], params["conv1"]["b"])
    if config.use_batchnorm:
        h = _bn(h, params["bn_conv1"])
    h = act(h)
    h = _maxpool(h)
    if drop:
        h = _dropout(h, config.hidden_dropout, rngs[1], train)
    h = _conv(h, params["conv3"]["w"], params["conv3"]["b"])
    if config.use_batchnorm:
        h = _bn(h, params["bn_conv3"])
    h = act(h)
    h = _maxpool(h, pad_h=1)
    if drop:
        h = _dropout(h, config.hidden_dropout, rngs[2], train)
    h = _conv(h, params["conv5"]["w"], params["conv5"]["b"])
    if config.use_batchnorm:
        h = _bn(h, params["bn_conv5"])
    h = act(h)
    h = h.reshape(B, -1)
    if drop:
        h = _dropout(h, config.hidden_dropout, rngs[3], train)
    h = h @ params["dense7"]["w"] + params["dense7"]["b"]
    if config.use_batchnorm:
        h = _bn(h, params["bn_dense7"])
    h = act(h)
    if drop:
        h = _dropout(h, config.hidden_dropout, rngs[4], train)
    return h @ params["bottleneck"]["w"] + params["bottleneck"]["b"]


def convae_forward(params, config: ConvAEConfig, x, train=False, rng=None):
    """Full autoencoder: returns (B, H*W) reconstructions."""
    act = make_scaled_tanh(0.5, 2.4)
    B = x.shape[0]
    f1, f2, f3 = config.filters
    ch, cw = config.conv_out_shape()

    code = convae_encode(params, config, x, train, rng)
    h = code @ params["bottleneck"]["w"].T + params["dense8_b"]  # linear (tied)
    h = act(h @ params["dense7"]["w"].T + params["dense9_b"])    # tied
    h = h.reshape(B, f3, ch, cw)
    h = act(_deconv(h, params["conv5"]["w"], params["deconv11_b"]))
    h = _upscale(h)
    h = act(_deconv(h, params["conv3"]["w"], params["deconv13_b"]))
    h = _upscale(h)
    h = act(_deconv(h, params["conv1"]["w"], params["deconv15_b"], crop_h=1))
    return h.reshape(B, -1)
