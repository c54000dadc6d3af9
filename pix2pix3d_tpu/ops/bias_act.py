"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference CUDA kernel
(`torch_utils/ops/bias_act.{cu,cpp,py}` in pix2pix3D).  On TPU this whole op
is a chain of elementwise VPU instructions that XLA fuses into the producing
matmul/conv automatically, so a hand-written kernel buys nothing; we express
it as plain jnp and rely on XLA fusion.  Second-order gradients (needed by R1
regularization) come for free from JAX autodiff — the reference needed an
explicit `grad=2` CUDA mode for this.

Activation table mirrors the reference (`bias_act.py:23-33`): name ->
(fn, default alpha, default gain).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class _ActSpec:
    func: Callable
    def_alpha: float
    def_gain: float


_SQRT2 = math.sqrt(2.0)

activation_funcs = {
    "linear": _ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, alpha: jax.nn.relu(x), 0.0, _SQRT2),
    "lrelu": _ActSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, _SQRT2),
    "tanh": _ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, _SQRT2),
}


def bias_act(x, b=None, dim=-1, act="linear", alpha=None, gain=None, clamp=None):
    """Add bias along `dim`, apply activation, scale by gain, clamp.

    Matches reference `_bias_act_ref` (`bias_act.py:93-122`).  Note: default
    `dim=-1` because this framework is channels-last (the reference default
    is `dim=1` for NCHW).
    """
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        if dim < 0:
            dim += x.ndim
        assert 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)

    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)

    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
