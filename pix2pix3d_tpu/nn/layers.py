"""Core equalized-lr layers and style-modulated convolution (NHWC).

TPU-native re-design of the reference building blocks in
`training/networks_stylegan2.py`.  Modules are plain Python objects holding
static configuration; parameters live in nested dicts (pytrees) whose keys
mirror the reference module tree (`weight`, `bias`, `affine`, ...) so the
checkpoint converter maps 1:1.

Key deviation from the reference: `modulated_conv2d` never materializes
per-sample grouped-conv weights.  Because convolution is linear, modulating
the weight by per-sample styles equals scaling the input channels before one
shared-weight conv and scaling output channels by the demodulation
coefficients after — one big batched MXU conv instead of a grouped conv with
B groups (the reference's `fused_modconv=False` path, `networks_stylegan2
.py:70-79`, which it also prefers for training).  Numerically identical for
f32; for bf16 the f32-range exponent makes the reference's fp16
pre-normalization (`:54-56`) unnecessary.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.bias_act import bias_act, activation_funcs
from ..ops.conv2d_resample import conv2d_resample


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    """PixelNorm (ref `networks_stylegan2.py:27-29`)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class FullyConnected:
    """Equalized-lr linear layer (ref `FullyConnectedLayer`, `networks_stylegan2.py:96-130`).

    Weight stored `[in, out]` (JAX-native); init is N(0,1)/lr_multiplier and
    runtime gain is lr_multiplier/sqrt(in), reproducing equalized LR.
    """

    def __init__(self, in_features, out_features, bias=True, activation="linear",
                 lr_multiplier=1.0, bias_init=0.0):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.activation = activation
        self.weight_gain = lr_multiplier / math.sqrt(in_features)
        self.bias_gain = lr_multiplier
        self.lr_multiplier = lr_multiplier
        self.bias_init = bias_init

    def init(self, key):
        params = {
            "weight": jax.random.normal(key, (self.in_features, self.out_features),
                                        dtype=jnp.float32) / self.lr_multiplier
        }
        if self.use_bias:
            params["bias"] = jnp.full((self.out_features,), float(self.bias_init),
                                      dtype=jnp.float32)
        return params

    def __call__(self, params, x):
        w = params["weight"].astype(x.dtype) * jnp.asarray(self.weight_gain, x.dtype)
        b = params.get("bias")
        if b is not None:
            b = b.astype(x.dtype)
            if self.bias_gain != 1:
                b = b * jnp.asarray(self.bias_gain, x.dtype)
        from ..ops.precision import acc_type, conv_precision
        precision = conv_precision(x.dtype)
        y = jnp.dot(x, w, precision=precision,
                    preferred_element_type=acc_type(x.dtype))
        y = y.astype(x.dtype)
        return bias_act(y, b, dim=-1, act=self.activation)


class Conv2d:
    """Equalized-lr conv with optional FIR up/down (ref `Conv2dLayer`,
    `networks_stylegan2.py:135-188`).  Weight stored HWIO."""

    def __init__(self, in_channels, out_channels, kernel_size, bias=True,
                 activation="linear", up=1, down=1, resample_filter=(1, 3, 3, 1),
                 conv_clamp=None, trainable=True):
        from ..ops.upfirdn2d import setup_filter

        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.use_bias = bias
        self.activation = activation
        self.up = up
        self.down = down
        self.conv_clamp = conv_clamp
        self.trainable = trainable
        self.resample_filter = setup_filter(list(resample_filter))
        self.padding = kernel_size // 2
        self.weight_gain = 1 / math.sqrt(in_channels * kernel_size ** 2)
        self.act_gain = activation_funcs[activation].def_gain

    def init(self, key):
        k = self.kernel_size
        params = {
            "weight": jax.random.normal(
                key, (k, k, self.in_channels, self.out_channels), dtype=jnp.float32)
        }
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype=jnp.float32)
        return params

    def __call__(self, params, x, gain=1.0):
        w = params["weight"] * self.weight_gain
        b = params.get("bias")
        flip_weight = self.up == 1
        x = conv2d_resample(x, w.astype(x.dtype), f=self.resample_filter,
                            up=self.up, down=self.down, padding=self.padding,
                            flip_weight=flip_weight)
        act_gain = self.act_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, dim=-1, act=self.activation, gain=act_gain, clamp=act_clamp)


class EqualConv2d:
    """Plain equalized conv (ref `triplane_cond.py:30-61`; encoder projector)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, bias=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.use_bias = bias
        self.scale = 1 / math.sqrt(in_channels * kernel_size ** 2)

    def init(self, key):
        k = self.kernel_size
        params = {
            "weight": jax.random.normal(
                key, (k, k, self.in_channels, self.out_channels), dtype=jnp.float32)
        }
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype=jnp.float32)
        return params

    def __call__(self, params, x):
        from ..ops.precision import acc_type
        w = (params["weight"] * self.scale).astype(x.dtype)
        precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_type(x.dtype), precision=precision,
        ).astype(x.dtype)
        if self.use_bias:
            out = out + params["bias"].astype(x.dtype)
        return out


def modulated_conv2d(x, weight, styles, noise=None, up=1, down=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True):
    """Style-modulated conv (ref `networks_stylegan2.py:34-91`), NHWC.

    Args:
        x: `[B, H, W, I]`.
        weight: `[kh, kw, I, O]`.
        styles: `[B, I]` modulation coefficients.
        noise: optional broadcastable additive noise (`[B, H', W', 1]`).

    Implementation: input-scaling formulation (see module docstring) — always
    one shared-weight conv, never per-sample grouped weights.
    """
    b = x.shape[0]
    kh, kw, in_ch, out_ch = weight.shape
    assert styles.shape == (b, in_ch)

    dcoefs = None
    if demodulate:
        # sum_{k,k,I} (w * s)^2 per (B, O) without materializing [B,O,I,k,k]:
        # = (s^2) @ (sum_kk w^2)  -> [B, O]
        w_sq = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))  # [I, O]
        s_sq = jnp.square(styles.astype(jnp.float32))  # [B, I]
        precision = jax.lax.Precision.HIGHEST
        denom = jnp.dot(s_sq, w_sq, precision=precision) + 1e-8  # [B, O]
        dcoefs = jax.lax.rsqrt(denom)

    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


def minibatch_stddev(x, group_size=4, num_channels=1):
    """Minibatch stddev feature (ref `MinibatchStdLayer`, `networks_stylegan2.py:648-672`), NHWC."""
    n, h, w, c = x.shape
    g = min(group_size, n) if group_size is not None else n
    f = num_channels
    cc = c // f

    y = x.astype(jnp.float32).reshape(g, -1, h, w, f, cc)  # [G, n, H, W, F, c]
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)  # [n, H, W, F, c]
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))  # [n, F]
    y = y.reshape(-1, 1, 1, f)
    y = jnp.tile(y, (g, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=-1)
