"""Bilinear 2D grid sampling (feature-last).

TPU-native replacement for `torch.nn.functional.grid_sample(...,
mode='bilinear', padding_mode='zeros', align_corners=False)` as used by the
reference renderer (`volumetric_rendering/renderer.py:64`) and background
compositing (`triplane_cond.py:1222`).  Implemented as 4 gathers + lerp;
double-differentiable by construction (the reference needed
`grid_sample_gradfix` for that).

The XLA gather here is the baseline implementation; the fused Pallas
tri-plane kernel (`ops/triplane_pallas.py`) supersedes it on the renderer hot
path.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(features, coords, padding_mode="zeros"):
    """Sample `features` at normalized `coords`.

    Args:
        features: `[N, H, W, C]`.
        coords: `[N, M, 2]` in [-1, 1], last dim = (x, y); x indexes W.
        padding_mode: 'zeros' or 'border'.

    Returns:
        `[N, M, C]` bilinearly interpolated samples (align_corners=False).
    """
    n, h, w, c = features.shape
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    # align_corners=False: map [-1, 1] to pixel centers.
    ix = (x + 1.0) * (w * 0.5) - 0.5
    iy = (y + 1.0) * (h * 0.5) - 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    if padding_mode == "border":
        ix0c = jnp.clip(ix0, 0, w - 1)
        ix1c = jnp.clip(ix1, 0, w - 1)
        iy0c = jnp.clip(iy0, 0, h - 1)
        iy1c = jnp.clip(iy1, 0, h - 1)
        vx0, vx1 = jnp.ones_like(tx), jnp.ones_like(tx)
        vy0, vy1 = jnp.ones_like(ty), jnp.ones_like(ty)
    else:
        assert padding_mode == "zeros"
        ix0c = jnp.clip(ix0, 0, w - 1)
        ix1c = jnp.clip(ix1, 0, w - 1)
        iy0c = jnp.clip(iy0, 0, h - 1)
        iy1c = jnp.clip(iy1, 0, h - 1)
        vx0 = ((ix0 >= 0) & (ix0 < w)).astype(jnp.float32)
        vx1 = ((ix1 >= 0) & (ix1 < w)).astype(jnp.float32)
        vy0 = ((iy0 >= 0) & (iy0 < h)).astype(jnp.float32)
        vy1 = ((iy1 >= 0) & (iy1 < h)).astype(jnp.float32)

    flat = features.reshape(n, h * w, c)

    def gather(iy_, ix_):
        idx = iy_ * w + ix_  # [N, M]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # [N, M, C]

    f00 = gather(iy0c, ix0c)
    f01 = gather(iy0c, ix1c)
    f10 = gather(iy1c, ix0c)
    f11 = gather(iy1c, ix1c)

    w00 = ((1 - tx) * (1 - ty) * vx0 * vy0)[..., None]
    w01 = (tx * (1 - ty) * vx1 * vy0)[..., None]
    w10 = ((1 - tx) * ty * vx0 * vy1)[..., None]
    w11 = (tx * ty * vx1 * vy1)[..., None]

    out = f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11
    return out.astype(features.dtype)
