"""Metric infrastructure (ref `metrics/metric_utils.py`).

`FeatureStats` accumulates streaming mean/covariance (ref `:73-149`);
`MetricOptions` carries the generator + dataset handles (ref `:25`).

Feature extractors are pluggable.  The reference downloads an Inception-v3
TorchScript model (`metric_utils.py:44-55`); this environment has no network
egress and no cached weights, so `get_feature_extractor` loads converted
weights from `PIX2PIX3D_INCEPTION_NPZ` if present and otherwise falls back
to a fixed-seed random conv feature extractor — valid for RELATIVE progress
tracking during training, but not comparable to published FID numbers (a
one-time weight conversion enables exact FID).
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import jax
import jax.numpy as jnp


class MetricOptions:
    def __init__(self, G=None, G_params=None, dataset=None, num_items=None,
                 rng_seed=0, progress=None):
        self.G = G
        self.G_params = G_params
        self.dataset = dataset
        self.num_items = num_items
        self.rng_seed = rng_seed
        self.progress = progress


class FeatureStats:
    """Streaming feature statistics (ref `metric_utils.py:73-149`)."""

    def __init__(self, capture_all=False, capture_mean_cov=False, max_items=None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = None
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features):
        if self.num_features is not None:
            assert num_features == self.num_features
            return
        self.num_features = num_features
        self.all_features = []
        self.raw_mean = np.zeros([num_features], np.float64)
        self.raw_cov = np.zeros([num_features, num_features], np.float64)

    def is_full(self):
        return (self.max_items is not None) and (self.num_items >= self.max_items)

    def append(self, x):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self):
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov


_RANDOM_FEATURES_WARNED = [False]


class RandomConvFeatures:
    """Fixed-seed random conv features (FID fallback; see module docstring)."""

    def __init__(self, dim=2048, seed=0):
        self.dim = dim
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 5)
        chans = [3, 32, 64, 128, 256]
        self.kernels = [
            jax.random.normal(ks[i], (3, 3, chans[i], chans[i + 1]),
                              dtype=jnp.float32)
            * np.sqrt(2.0 / (9 * chans[i]))
            for i in range(4)
        ]
        self.proj = jax.random.normal(ks[4], (256, dim), jnp.float32) / 16.0
        self._fn = jax.jit(self._features)

    def _features(self, x):
        # x uint8-range float NHWC
        x = x / 127.5 - 1
        for k in self.kernels:
            x = jax.lax.conv_general_dilated(
                x, k, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return x @ self.proj

    def __call__(self, images_uint8):
        return np.asarray(self._fn(jnp.asarray(images_uint8, jnp.float32)))


def get_feature_extractor():
    path = os.environ.get("PIX2PIX3D_INCEPTION_NPZ", "")
    if path and os.path.exists(path):
        from .inception import InceptionV3Features
        return InceptionV3Features(path)
    if not _RANDOM_FEATURES_WARNED[0]:
        warnings.warn(
            "FID/KID running with RANDOM conv features (no Inception weights "
            "available offline). Relative values track training progress but "
            "are not comparable to published numbers. Set "
            "PIX2PIX3D_INCEPTION_NPZ to converted weights for exact FID.")
        _RANDOM_FEATURES_WARNED[0] = True
    return RandomConvFeatures()


def iterate_real_features(opts, detector, batch_size=16, max_items=None):
    stats = FeatureStats(capture_mean_cov=True, capture_all=True,
                         max_items=max_items)
    ds = opts.dataset
    idx = 0
    while not stats.is_full() and idx < len(ds):
        imgs = []
        for _ in range(batch_size):
            if idx >= len(ds):
                break
            item = ds[idx]
            img = item["image"] if isinstance(item, dict) else item[0]
            imgs.append(img)
            idx += 1
        if not imgs:
            break
        stats.append(detector(np.stack(imgs).astype(np.float32)))
    return stats


def iterate_gen_features(opts, detector, batch_size=8, max_items=None):
    """Sample the conditional generator over dataset masks/poses
    (fixes the reference incompatibility noted in SURVEY §2j: `metric_utils
    .py:266-278` calls G(z, c) without the batch dict and crashes for the
    conditional models, forcing `--no_eval`; here the conditional signature
    is used natively)."""
    stats = FeatureStats(capture_mean_cov=True, capture_all=True,
                         max_items=max_items)
    G, params, ds = opts.G, opts.G_params, opts.dataset
    rng = np.random.RandomState(opts.rng_seed)
    key = jax.random.PRNGKey(opts.rng_seed)

    while not stats.is_full():
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (batch_size, G.z_dim))
        items = [ds[rng.randint(len(ds))] for _ in range(batch_size)]
        mask = jnp.asarray(np.stack([it["mask"] for it in items]), jnp.float32)
        if ds.data_type == "edge":
            mask = -(mask / 127.5 - 1)
        pose = jnp.asarray(np.stack([it["pose"] for it in items]), jnp.float32)
        out = G(params, z, pose, {"mask": mask, "pose": pose},
                noise_mode="const", det=True)
        imgs = (np.asarray(out["image"]) + 1) * 127.5
        stats.append(detector(np.clip(imgs, 0, 255)))
    return stats
