"""Ray/box geometry helpers (ref
`training/volumetric_rendering/math_utils.py`, vectorized for jit — no
data-dependent control flow)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vecs(vectors):
    return vectors / jnp.linalg.norm(vectors, axis=-1, keepdims=True)


def get_ray_limits_box(rays_o, rays_d, box_side_length):
    """Intersect rays with the centered cube of side `box_side_length`.

    Returns (t_min `[..., 1]`, t_max `[..., 1]`); invalid rays get
    (-1, -2) like the reference (`math_utils.py:46-98`).
    """
    shape = rays_o.shape
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)

    half = box_side_length / 2
    invdir = 1 / rays_d
    # For each axis: entry at the near face, exit at the far face.
    t0 = (-half - rays_o) * invdir
    t1 = (half - rays_o) * invdir
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)

    tmin = jnp.max(tsmall, axis=-1)
    tmax = jnp.min(tbig, axis=-1)
    is_valid = tmin <= tmax

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin.reshape(*shape[:-1], 1), tmax.reshape(*shape[:-1], 1)


def linspace_batched(start, stop, num):
    """[num, *start.shape] linspace inclusive (ref `math_utils.py:103-120`)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((-1,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
