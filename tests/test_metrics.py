"""Metrics: math sanity + registry plumbing (random-feature extractor)."""

import numpy as np
import pytest

from pix2pix3d_tpu.metrics.frechet_inception_distance import (
    frechet_distance, frechet_lowrank)
from pix2pix3d_tpu.metrics.kernel_inception_distance import kid_from_features
from pix2pix3d_tpu.metrics.miou import confusion_matrix, miou_from_confusion
from pix2pix3d_tpu.metrics.metric_utils import FeatureStats, RandomConvFeatures
from pix2pix3d_tpu.metrics import metric_main


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    x = rng.randn(2000, 16)
    mu, cov = x.mean(0), np.cov(x, rowvar=False)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6
    y = x + 3.0
    d = frechet_distance(y.mean(0), np.cov(y, rowvar=False), mu, cov)
    assert abs(d - 16 * 9) < 1.0  # |mu diff|^2 = 16 * 3^2


def test_frechet_lowrank_matches_full():
    # frechet_lowrank (eigvals of the tiny [n, n] cross matrix) must agree
    # with the full-covariance frechet_distance for n > dim, where both are
    # exact, and stay finite/ordered in the n << dim regime it exists for.
    rng = np.random.RandomState(4)
    f1 = rng.randn(300, 16)
    f2 = rng.randn(280, 16) * 1.3 + 0.5
    full = frechet_distance(
        f1.mean(0), np.cov(f1, rowvar=False),
        f2.mean(0), np.cov(f2, rowvar=False))
    low = frechet_lowrank(f1, f2)
    assert abs(full - low) < 1e-6 * max(1.0, abs(full))
    # n << dim: near-zero for identical sets, larger for shifted ones
    g1 = rng.randn(8, 512)
    near = frechet_lowrank(g1, g1)
    far = frechet_lowrank(g1, g1 + 2.0)
    assert abs(near) < 1e-6
    assert far > 1.0


def test_kid_zero_for_same_distribution():
    rng = np.random.RandomState(1)
    x = rng.randn(800, 8).astype(np.float64)
    y = rng.randn(800, 8).astype(np.float64)
    near = kid_from_features(x, y, num_subsets=20, max_subset_size=200)
    far = kid_from_features(x, y + 2.0, num_subsets=20, max_subset_size=200)
    assert abs(near) < abs(far)


def test_miou():
    pred = np.array([[0, 1], [1, 2]])
    target = np.array([[0, 1], [2, 2]])
    cm = confusion_matrix(pred, target, 3)
    assert cm.sum() == 4
    m = miou_from_confusion(cm)
    assert 0 < m < 1
    # perfect prediction
    cm2 = confusion_matrix(target, target, 3)
    assert miou_from_confusion(cm2) == 1.0


def test_feature_stats_streaming():
    rng = np.random.RandomState(2)
    x = rng.randn(300, 5).astype(np.float32)
    stats = FeatureStats(capture_mean_cov=True, max_items=250)
    for i in range(0, 300, 64):
        stats.append(x[i:i + 64])
    assert stats.num_items == 250
    mu, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mu, x[:250].mean(0), atol=1e-5)


def test_random_feature_extractor():
    feats = RandomConvFeatures(dim=64)
    x = np.random.RandomState(3).randint(0, 255, size=(4, 64, 64, 3))
    out = feats(x.astype(np.float32))
    assert out.shape == (4, 64)
    assert np.isfinite(out).all()


def test_registry():
    assert metric_main.is_valid_metric("fid50k_full")
    assert metric_main.is_valid_metric("miou500")
    assert "kid2k" in metric_main.list_valid_metrics()
