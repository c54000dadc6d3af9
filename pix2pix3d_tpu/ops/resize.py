"""Bilinear image resize (NHWC) matching torch `F.interpolate` semantics.

Used for the SR input adapters (`superresolution.py:48-52` in the reference)
and `filtered_resizing` (`dual_discriminator.py:441-457`).  Backed by
`jax.image.resize`, which uses half-pixel sample positions
(= `align_corners=False`) and, with `antialias=True`, widens the triangle
kernel by the scale factor when downsampling — the same algorithm torch's
`antialias=True` path uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, size, antialias=True):
    """Resize `[N, H, W, C]` to spatial `size` (int or (h, w))."""
    if isinstance(size, int):
        size = (size, size)
    n, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x
    out = jax.image.resize(
        x.astype(jnp.float32),
        (n, size[0], size[1], c),
        method="linear",
        antialias=antialias,
    )
    return out.astype(x.dtype)
