"""LPIPS perceptual distance (VGG16 backbone), JAX/NHWC.

The reference uses the `lpips` pip package (`loss.py:20,412`) with pretrained
VGG16 + learned linear heads.  This implements the same computation:

    d(x, y) = sum_l  mean_hw( || w_l * (phi_l(x)^ - phi_l(y)^) ||^2 )

where phi_l are conv-block activations (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3), ^ is channel-unit-normalization, and w_l are the 1x1 "lin" weights.

Weights: this environment has no network egress and no cached torchvision /
lpips weights, so pretrained weights must be supplied as an `.npz` via
`LPIPS(weights_path=...)` (use `scripts/convert_lpips.py` on a machine with
the pip packages to produce it).  Without a weights file the module falls
back to a fixed-seed *random* VGG — random-feature perceptual distances are
still a meaningful training signal (they correlate with perceptual
similarity far better than pixel losses) but are NOT the published LPIPS
metric; a warning is emitted once.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 feature config: (out_channels, n_convs) per block.
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# ImageNet normalization expected by the torchvision-style backbone, applied
# to inputs in [-1, 1] (the lpips package's internal scaling layer).
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class LPIPS:
    def __init__(self, weights_path=None):
        self.has_pretrained = False
        if weights_path and os.path.exists(weights_path):
            data = np.load(weights_path)
            self.params = {k: jnp.asarray(v) for k, v in data.items()}
            self.has_pretrained = True
        else:
            if weights_path:
                warnings.warn(f"LPIPS weights not found at {weights_path}; "
                              "falling back to random-feature VGG.")
            else:
                warnings.warn(
                    "LPIPS running with RANDOM VGG features (no pretrained "
                    "weights available in this environment). This is a valid "
                    "perceptual-ish loss but not the published LPIPS metric.")
            self.params = self._random_init(jax.random.PRNGKey(80085))

    @staticmethod
    def _random_init(key):
        params = {}
        in_ch = 3
        idx = 0
        for out_ch, n_convs in _VGG_BLOCKS:
            for _ in range(n_convs):
                key, k1 = jax.random.split(key)
                # He-normal init: random features with sane scale
                std = float(np.sqrt(2.0 / (3 * 3 * in_ch)))
                params[f"conv{idx}_w"] = jax.random.normal(
                    k1, (3, 3, in_ch, out_ch), dtype=jnp.float32) * std
                params[f"conv{idx}_b"] = jnp.zeros((out_ch,), jnp.float32)
                in_ch = out_ch
                idx += 1
        for i, (out_ch, _) in enumerate(_VGG_BLOCKS):
            params[f"lin{i}_w"] = jnp.ones((out_ch,), jnp.float32) / out_ch
        return params

    def features(self, x):
        """x: `[N, H, W, 3]` in [-1, 1].  Returns the 5 block activations."""
        x = (x - _SHIFT) / _SCALE
        feats = []
        idx = 0
        for block_i, (out_ch, n_convs) in enumerate(_VGG_BLOCKS):
            for _ in range(n_convs):
                w = self.params[f"conv{idx}_w"]
                b = self.params[f"conv{idx}_b"]
                x = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(x.dtype) + b
                x = jax.nn.relu(x)
                idx += 1
            feats.append(x)
            if block_i < len(_VGG_BLOCKS) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return feats

    def __call__(self, x, y):
        """Perceptual distance per batch element, `[N]`. Inputs NHWC [-1, 1]."""
        fx = self.features(x)
        fy = self.features(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(jnp.square(b), axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(a - b) * self.params[f"lin{i}_w"]
            total = total + jnp.mean(jnp.sum(diff, axis=-1), axis=(1, 2))
        return total
