"""Improved precision & recall (ref `metrics/precision_recall.py`, k-NN
manifold estimate, k=3 for pr50k3)."""

from __future__ import annotations

import numpy as np

from .metric_utils import (get_feature_extractor, iterate_real_features,
                           iterate_gen_features)


def _knn_radii(feats, k, batch=1024):
    n = len(feats)
    radii = np.empty(n, np.float64)
    for i in range(0, n, batch):
        d = np.linalg.norm(feats[i:i + batch, None] - feats[None], axis=-1)
        radii[i:i + batch] = np.sort(d, axis=1)[:, k]  # k-th NN (excl. self)
    return radii


def _fraction_in_manifold(query, support, radii, batch=1024):
    hits = 0
    for i in range(0, len(query), batch):
        d = np.linalg.norm(query[i:i + batch, None] - support[None], axis=-1)
        hits += int((d <= radii[None]).any(axis=1).sum())
    return hits / len(query)


def compute_pr(opts, max_real, num_gen, nhood_size=3):
    detector = get_feature_extractor()
    real = iterate_real_features(opts, detector, max_items=max_real).get_all()
    gen = iterate_gen_features(opts, detector, max_items=num_gen).get_all()
    real = real.astype(np.float64)
    gen = gen.astype(np.float64)
    precision = _fraction_in_manifold(gen, real, _knn_radii(real, nhood_size))
    recall = _fraction_in_manifold(real, gen, _knn_radii(gen, nhood_size))
    return {"precision": precision, "recall": recall}
