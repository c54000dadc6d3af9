"""Inception Score (ref `metrics/inception_score.py`, `is50k`).

Requires classifier logits, i.e. converted Inception weights
(PIX2PIX3D_INCEPTION_NPZ); raises a clear error otherwise.
"""

from __future__ import annotations

import os

import numpy as np

from .metric_utils import iterate_gen_features, get_feature_extractor


def compute_is(opts, num_gen, num_splits=10):
    detector = get_feature_extractor()
    if not hasattr(detector, "logits"):
        raise RuntimeError(
            "Inception Score needs classifier logits; set "
            "PIX2PIX3D_INCEPTION_NPZ to converted Inception-v3 weights "
            "(scripts/convert_inception.py).")

    # reuse the generation loop but collect logits
    import jax
    import jax.numpy as jnp
    G, params, ds = opts.G, opts.G_params, opts.dataset
    rng = np.random.RandomState(opts.rng_seed)
    key = jax.random.PRNGKey(opts.rng_seed)
    probs = []
    done = 0
    batch_size = 8
    while done < num_gen:
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (batch_size, G.z_dim))
        items = [ds[rng.randint(len(ds))] for _ in range(batch_size)]
        mask = jnp.asarray(np.stack([it["mask"] for it in items]), jnp.float32)
        if ds.data_type == "edge":
            mask = -(mask / 127.5 - 1)
        pose = jnp.asarray(np.stack([it["pose"] for it in items]), jnp.float32)
        out = G(params, z, pose, {"mask": mask, "pose": pose},
                noise_mode="const", det=True)
        imgs = np.clip((np.asarray(out["image"]) + 1) * 127.5, 0, 255)
        logit = detector.logits(imgs)
        e = np.exp(logit - logit.max(axis=1, keepdims=True))
        probs.append(e / e.sum(axis=1, keepdims=True))
        done += batch_size
    probs = np.concatenate(probs)[:num_gen]

    scores = []
    for part in np.array_split(probs, num_splits):
        kl = part * (np.log(part + 1e-12)
                     - np.log(part.mean(axis=0, keepdims=True) + 1e-12))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))
