"""Inception-v3 pool3 feature extractor for exact FID (JAX/NHWC).

Standard torchvision `inception_v3` graph, consuming weights converted by
`scripts/convert_inception.py` (name scheme: state_dict keys with '.' ->
'/', convs OIHW -> HWIO).  Outputs the 2048-d average-pool features used by
FID.

NOTE: this offline container has neither torchvision nor the weights, so
this module could not be validated end-to-end here; `scripts/
validate_inception.py` cross-checks against torchvision when run in an
online environment.  The metric registry only selects this extractor when
`PIX2PIX3D_INCEPTION_NPZ` is set.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _conv_bn(params, prefix, x, stride=1, padding=0):
    w = params[f"{prefix}/conv/weight"]
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    x = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mean = params[f"{prefix}/bn/running_mean"]
    var = params[f"{prefix}/bn/running_var"]
    gamma = params[f"{prefix}/bn/weight"]
    beta = params[f"{prefix}/bn/bias"]
    x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
    return jax.nn.relu(x)


def _maxpool3(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avgpool3_same(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    ones = jnp.ones_like(x[..., :1])
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    return s / c


class InceptionV3Features:
    def __init__(self, npz_path):
        data = np.load(npz_path)
        self.params = {k: jnp.asarray(v) for k, v in data.items()}
        self._fn = jax.jit(self._features)

    def _inception_a(self, p, name, x, pool_features):
        b1 = _conv_bn(p, f"{name}/branch1x1", x)
        b5 = _conv_bn(p, f"{name}/branch5x5_1", x)
        b5 = _conv_bn(p, f"{name}/branch5x5_2", b5, padding=2)
        b3 = _conv_bn(p, f"{name}/branch3x3dbl_1", x)
        b3 = _conv_bn(p, f"{name}/branch3x3dbl_2", b3, padding=1)
        b3 = _conv_bn(p, f"{name}/branch3x3dbl_3", b3, padding=1)
        bp = _avgpool3_same(x)
        bp = _conv_bn(p, f"{name}/branch_pool", bp)
        return jnp.concatenate([b1, b5, b3, bp], -1)

    def _inception_b(self, p, name, x):
        b3 = _conv_bn(p, f"{name}/branch3x3", x, stride=2)
        bd = _conv_bn(p, f"{name}/branch3x3dbl_1", x)
        bd = _conv_bn(p, f"{name}/branch3x3dbl_2", bd, padding=1)
        bd = _conv_bn(p, f"{name}/branch3x3dbl_3", bd, stride=2)
        bp = _maxpool3(x)
        return jnp.concatenate([b3, bd, bp], -1)

    def _inception_c(self, p, name, x):
        b1 = _conv_bn(p, f"{name}/branch1x1", x)
        b7 = _conv_bn(p, f"{name}/branch7x7_1", x)
        b7 = _conv_bn(p, f"{name}/branch7x7_2", b7, padding=((0, 0), (3, 3)))
        b7 = _conv_bn(p, f"{name}/branch7x7_3", b7, padding=((3, 3), (0, 0)))
        bd = _conv_bn(p, f"{name}/branch7x7dbl_1", x)
        bd = _conv_bn(p, f"{name}/branch7x7dbl_2", bd, padding=((3, 3), (0, 0)))
        bd = _conv_bn(p, f"{name}/branch7x7dbl_3", bd, padding=((0, 0), (3, 3)))
        bd = _conv_bn(p, f"{name}/branch7x7dbl_4", bd, padding=((3, 3), (0, 0)))
        bd = _conv_bn(p, f"{name}/branch7x7dbl_5", bd, padding=((0, 0), (3, 3)))
        bp = _avgpool3_same(x)
        bp = _conv_bn(p, f"{name}/branch_pool", bp)
        return jnp.concatenate([b1, b7, bd, bp], -1)

    def _inception_d(self, p, name, x):
        b3 = _conv_bn(p, f"{name}/branch3x3_1", x)
        b3 = _conv_bn(p, f"{name}/branch3x3_2", b3, stride=2)
        b7 = _conv_bn(p, f"{name}/branch7x7x3_1", x)
        b7 = _conv_bn(p, f"{name}/branch7x7x3_2", b7, padding=((0, 0), (3, 3)))
        b7 = _conv_bn(p, f"{name}/branch7x7x3_3", b7, padding=((3, 3), (0, 0)))
        b7 = _conv_bn(p, f"{name}/branch7x7x3_4", b7, stride=2)
        bp = _maxpool3(x)
        return jnp.concatenate([b3, b7, bp], -1)

    def _inception_e(self, p, name, x):
        b1 = _conv_bn(p, f"{name}/branch1x1", x)
        b3 = _conv_bn(p, f"{name}/branch3x3_1", x)
        b3a = _conv_bn(p, f"{name}/branch3x3_2a", b3, padding=((0, 0), (1, 1)))
        b3b = _conv_bn(p, f"{name}/branch3x3_2b", b3, padding=((1, 1), (0, 0)))
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = _conv_bn(p, f"{name}/branch3x3dbl_1", x)
        bd = _conv_bn(p, f"{name}/branch3x3dbl_2", bd, padding=1)
        bda = _conv_bn(p, f"{name}/branch3x3dbl_3a", bd, padding=((0, 0), (1, 1)))
        bdb = _conv_bn(p, f"{name}/branch3x3dbl_3b", bd, padding=((1, 1), (0, 0)))
        bd = jnp.concatenate([bda, bdb], -1)
        bp = _avgpool3_same(x)
        bp = _conv_bn(p, f"{name}/branch_pool", bp)
        return jnp.concatenate([b1, b3, bd, bp], -1)

    def _features(self, x):
        """x: uint8-range float NHWC RGB -> [N, 2048]."""
        p = self.params
        # torchvision preprocessing: resize 299, scale to [-1, 1]-ish norm
        n = x.shape[0]
        x = jax.image.resize(x, (n, 299, 299, 3), "linear", antialias=True)
        x = x / 255.0
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (x - mean) / std

        x = _conv_bn(p, "Conv2d_1a_3x3", x, stride=2)
        x = _conv_bn(p, "Conv2d_2a_3x3", x)
        x = _conv_bn(p, "Conv2d_2b_3x3", x, padding=1)
        x = _maxpool3(x)
        x = _conv_bn(p, "Conv2d_3b_1x1", x)
        x = _conv_bn(p, "Conv2d_4a_3x3", x)
        x = _maxpool3(x)
        x = self._inception_a(p, "Mixed_5b", x, 32)
        x = self._inception_a(p, "Mixed_5c", x, 64)
        x = self._inception_a(p, "Mixed_5d", x, 64)
        x = self._inception_b(p, "Mixed_6a", x)
        x = self._inception_c(p, "Mixed_6b", x)
        x = self._inception_c(p, "Mixed_6c", x)
        x = self._inception_c(p, "Mixed_6d", x)
        x = self._inception_c(p, "Mixed_6e", x)
        x = self._inception_d(p, "Mixed_7a", x)
        x = self._inception_e(p, "Mixed_7b", x)
        x = self._inception_e(p, "Mixed_7c", x)
        return jnp.mean(x, axis=(1, 2))  # [N, 2048]

    def __call__(self, images_uint8):
        return np.asarray(self._fn(jnp.asarray(images_uint8, jnp.float32)))

    def logits(self, images_uint8):
        """Classifier logits [N, 1000] (for Inception Score)."""
        feats = self._fn(jnp.asarray(images_uint8, jnp.float32))
        w = self.params["fc/weight"]  # converted HWIO-agnostic: [in, out]?
        b = self.params["fc/bias"]
        if w.shape[0] != feats.shape[-1]:
            w = w.T
        return np.asarray(feats @ w + b)
