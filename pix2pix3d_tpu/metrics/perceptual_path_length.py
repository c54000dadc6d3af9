"""Perceptual path length (ref `metrics/perceptual_path_length.py`,
`ppl2_wend`: W-space, endpoint sampling, epsilon 1e-4).

Distance uses the session's LPIPS (pretrained VGG if converted weights are
available, else the documented random-feature fallback)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..train.lpips import LPIPS


def compute_ppl(opts, num_samples=2000, epsilon=1e-4, batch_size=4,
                lpips_weights=None):
    G, params, ds = opts.G, opts.G_params, opts.dataset
    lp = LPIPS(weights_path=lpips_weights)
    rng = np.random.RandomState(opts.rng_seed)
    key = jax.random.PRNGKey(opts.rng_seed)

    dists = []
    done = 0
    while done < num_samples:
        key, k0, k1 = jax.random.split(key, 3)
        z0 = jax.random.normal(k0, (batch_size, G.z_dim))
        z1 = jax.random.normal(k1, (batch_size, G.z_dim))
        items = [ds[rng.randint(len(ds))] for _ in range(batch_size)]
        mask = jnp.asarray(np.stack([it["mask"] for it in items]), jnp.float32)
        if ds.data_type == "edge":
            mask = -(mask / 127.5 - 1)
        pose = jnp.asarray(np.stack([it["pose"] for it in items]), jnp.float32)
        batch = {"mask": mask, "pose": pose}

        # endpoint interpolation in W (lerp; 'wend' sampling)
        w0 = G.mapping(params, z0, pose, batch)
        w1 = G.mapping(params, z1, pose, batch)
        t = jax.random.uniform(key, (batch_size, 1, 1))
        wt0 = w0 + (w1 - w0) * t
        wt1 = w0 + (w1 - w0) * (t + epsilon)

        img0 = G.synthesis(params, wt0, pose, noise_mode="const", det=True)["image"]
        img1 = G.synthesis(params, wt1, pose, noise_mode="const", det=True)["image"]
        d = np.asarray(lp(img0, img1)) / (epsilon ** 2)
        dists.append(d)
        done += batch_size

    dists = np.concatenate(dists)
    # ref filters outliers to the [1%, 99%] range before averaging
    lo, hi = np.percentile(dists, [1, 99])
    return float(dists[(dists >= lo) & (dists <= hi)].mean())
