"""FID math (ref `metrics/frechet_inception_distance.py:22-43`).

FID = |mu_r - mu_g|^2 + Tr(C_r + C_g - 2 sqrt(C_r C_g)); matrix sqrt via
eigendecomposition of the symmetric product construction (no scipy needed).
"""

from __future__ import annotations

import numpy as np

from .metric_utils import (get_feature_extractor, iterate_real_features,
                           iterate_gen_features)


def _sqrtm_product_trace(c1, c2):
    """Tr(sqrt(C1 C2)) for PSD C1, C2 via symmetric reformulation:
    Tr(sqrt(C1 C2)) = Tr(sqrt(S C2 S)) with S = sqrt(C1)."""
    w1, v1 = np.linalg.eigh(c1)
    w1 = np.clip(w1, 0, None)
    s1 = (v1 * np.sqrt(w1)) @ v1.T
    m = s1 @ c2 @ s1
    w = np.linalg.eigvalsh((m + m.T) / 2)
    return np.sqrt(np.clip(w, 0, None)).sum()


def frechet_distance(mu1, cov1, mu2, cov2):
    diff = mu1 - mu2
    tr_sqrt = _sqrtm_product_trace(cov1, cov2)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * tr_sqrt)


def frechet_lowrank(f1, f2):
    """Frechet distance straight from two feature sets, exact for any n
    and fast when n << feature_dim (no [dim, dim] covariances formed).

    With centered, 1/sqrt(n-1)-scaled rows x_i, cov_i = x_i^T x_i and the
    nonzero eigenvalues of cov1 @ cov2 equal those of the tiny [n1, n1]
    matrix (x1 x2^T)(x2 x1^T), so Tr sqrtm(cov1 cov2) = sum sqrt(eig).
    Used by the per-snapshot real-vs-fake trend (train/loop.py) and the
    serving quality gate (scripts/eval_frustum_quality.py)."""
    f1 = np.asarray(f1, dtype=np.float64)
    f2 = np.asarray(f2, dtype=np.float64)
    mu1, mu2 = f1.mean(0), f2.mean(0)
    x1 = (f1 - mu1) / np.sqrt(max(len(f1) - 1, 1))
    x2 = (f2 - mu2) / np.sqrt(max(len(f2) - 1, 1))
    m = np.square(mu1 - mu2).sum()
    tr1 = np.square(x1).sum()
    tr2 = np.square(x2).sum()
    cross = x1 @ x2.T
    ev = np.linalg.eigvals(cross @ cross.T)
    tr_sqrt = np.sqrt(np.clip(np.real(ev), 0, None)).sum()
    return float(m + tr1 + tr2 - 2 * tr_sqrt)


def compute_fid(opts, max_real, num_gen):
    detector = get_feature_extractor()
    real = iterate_real_features(opts, detector, max_items=max_real)
    gen = iterate_gen_features(opts, detector, max_items=num_gen)
    mu_r, cov_r = real.get_mean_cov()
    mu_g, cov_g = gen.get_mean_cov()
    return frechet_distance(mu_g, cov_g, mu_r, cov_r)
