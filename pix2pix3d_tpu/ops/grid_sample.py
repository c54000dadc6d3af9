"""Bilinear 2D grid sampling (feature-last).

TPU-native replacement for `torch.nn.functional.grid_sample(...,
mode='bilinear', padding_mode='zeros', align_corners=False)` as used by the
reference renderer (`volumetric_rendering/renderer.py:64`) and background
compositing (`triplane_cond.py:1222`).  Implemented as 4 gathers + lerp;
double-differentiable by construction (the reference needed
`grid_sample_gradfix` for that).

The XLA gather formulations here are the production plane sampler; see
NOTES_PERF.md for the measured v5e gather-throughput analysis that shaped
them (in-kernel arbitrary VMEM gather is not expressible on this Mosaic
generation, so the fast paths are gather-shape engineering + the
regular-grid contraction sampler in `render/grid_sampler.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d_patch_rowpair(features, coords):
    """Like :func:`grid_sample_2d_patch` but fetches each point's footprint
    as a `(1, 2, 2*C)` slice from a `[N, H, W*C]` view of the plane: the
    gather output's trailing dims are `(2, 2C)`, which tile-pads 2x less
    than the 4-D patch's `(2, 2, C)` — half the HBM write traffic for the
    same slice count.  Requires 2*C <= some sane lane multiple; exact same
    math (hat weights on the clamped base)."""
    n, h, w, c = features.shape
    m = coords.shape[1]
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    ix = (x + 1.0) * (w * 0.5) - 0.5
    iy = (y + 1.0) * (h * 0.5) - 0.5
    iy0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 2)
    ix0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 2)

    flat = features.reshape(n, h, w * c)
    starts = jnp.stack([iy0, ix0 * c], axis=-1)  # [N, M, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        flat, starts, dnums, slice_sizes=(1, 2, 2 * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(n, m, 2, 2, c).astype(jnp.float32)

    tx0 = ix0.astype(jnp.float32)
    ty0 = iy0.astype(jnp.float32)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(ix - tx0))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(ix - (tx0 + 1)))
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ty0))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (ty0 + 1)))

    out = (patch[:, :, 0, 0] * (wy0 * wx0)[..., None]
           + patch[:, :, 0, 1] * (wy0 * wx1)[..., None]
           + patch[:, :, 1, 0] * (wy1 * wx0)[..., None]
           + patch[:, :, 1, 1] * (wy1 * wx1)[..., None])
    return out.astype(features.dtype)


def grid_sample_2d_patch(features, coords):
    """Bilinear sample via ONE patch-gather per point (zeros padding).

    TPU-optimized formulation: instead of 4 independent row gathers (each a
    ~128B random access, transaction-size-bound on HBM), fetch the point's
    2x2xC corner patch with a single `lax.gather` slice and blend with
    bilinear hat weights.  The hat formulation
    `w(t) = max(0, 1-|ix-tx|) * max(0, 1-|iy-ty|)` evaluated on the
    clamped patch is exact for zeros padding: texels outside the image would
    contribute 0, and clamp-shifted texels get non-positive hat arguments.

    Args / returns as :func:`grid_sample_2d` (padding_mode='zeros' only).
    """
    n, h, w, c = features.shape
    m = coords.shape[1]
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    ix = (x + 1.0) * (w * 0.5) - 0.5
    iy = (y + 1.0) * (h * 0.5) - 0.5

    iy0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 2)
    ix0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 2)

    starts = jnp.stack([iy0, ix0], axis=-1)  # [N, M, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        features, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [N, M, 2, 2, C] (leading slice dim collapsed by batching)
    patch = patch.reshape(n, m, 2, 2, c).astype(jnp.float32)

    # hat weights against the clamped base
    ty0 = iy0.astype(jnp.float32)
    tx0 = ix0.astype(jnp.float32)
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ty0))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (ty0 + 1)))
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(ix - tx0))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(ix - (tx0 + 1)))

    out = (patch[:, :, 0, 0] * (wy0 * wx0)[..., None]
           + patch[:, :, 0, 1] * (wy0 * wx1)[..., None]
           + patch[:, :, 1, 0] * (wy1 * wx0)[..., None]
           + patch[:, :, 1, 1] * (wy1 * wx1)[..., None])
    return out.astype(features.dtype)


def grid_sample_2d_blocked(features, coords):
    """Bilinear sample with PADDING-FREE gathers (zeros padding semantics).

    TPU tiling pads a gather output's last two dims to (8, 128); fetching a
    2x2xC corner patch therefore moves 16x more HBM bytes than the texels
    are worth.  This formulation makes every gathered row exactly 128 lanes:

    - texels are packed P = 128//C per block: table row = [P*C] = 128 floats;
    - a second, P//2-offset copy of each row guarantees any two x-adjacent
      texels live inside ONE block (dual-offset table);
    - per point, ONE row-gather per y-row (y0, y0+1), then the bilinear x
      weights are applied as a P-tap einsum over the block (VPU-friendly),
      and the two rows blend with the y weights.

    vs `grid_sample_2d_patch`: ~8x less gather traffic (1 KB vs 8 KB per
    point for C=32).  Exact same math (hat-weight formulation).

    Args:
        features: `[N, H, W, C]` with `W*C % 128 == 0` and `128 % C == 0`.
        coords: `[N, M, 2]` in [-1, 1], (x, y).
    Returns:
        `[N, M, C]`.
    """
    n, h, w, c = features.shape
    m = coords.shape[1]
    assert 128 % c == 0 and (w * c) % 128 == 0
    p = 128 // c  # texels per block
    assert p >= 2 and w % p == 0

    table = pack_plane_blocks(features)
    return sample_packed_planes(table, (h, w, c), coords)


def pack_plane_blocks(features):
    """Build the dual-offset 128-lane block table for
    :func:`sample_packed_planes`.  A blocks cover texels [p*k, p*k+p); B
    blocks are offset by p//2 so any two x-adjacent texels are interior to
    one block.  `[N, H, W, C]` -> `[N, H*BB, 128]`."""
    n, h, w, c = features.shape
    p = 128 // c
    half = p // 2
    k_b = (w - half) // p
    blocks_a = features.reshape(n, h, w // p, p * c)
    blocks_b = features[:, :, half:half + k_b * p, :].reshape(n, h, k_b, p * c)
    table = jnp.concatenate([blocks_a, blocks_b], axis=2)  # [N, H, BB, 128]
    return table.reshape(n, h * table.shape[2], p * c)


def sample_packed_planes(table, hwc, coords):
    """Bilinear sample from a packed block table (see
    :func:`grid_sample_2d_blocked`)."""
    h, w, c = hwc
    n, m, _ = coords.shape
    p = 128 // c
    half = p // 2
    k_b = (w - half) // p
    bb = w // p + k_b

    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)
    ix = (x + 1.0) * (w * 0.5) - 0.5
    iy = (y + 1.0) * (h * 0.5) - 0.5
    iy0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 0, h - 2)
    ix0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 0, w - 2)

    o = ix0 % p
    use_b = o == (p - 1)
    blk = jnp.where(use_b, (w // p) + (ix0 - half) // p, ix0 // p)
    off = jnp.where(use_b, ix0 - ((ix0 - half) // p * p + half), o)

    idx0 = iy0 * bb + blk          # row y0
    idx1 = (iy0 + 1) * bb + blk    # row y1
    rows = jnp.take_along_axis(
        table, jnp.concatenate([idx0, idx1], axis=1)[..., None], axis=1)
    rows = rows.reshape(n, 2, m, p, c)

    # hat weights (exact zeros-padding semantics, see grid_sample_2d_patch)
    tx0 = ix0.astype(jnp.float32)
    ty0 = iy0.astype(jnp.float32)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(ix - tx0))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(ix - (tx0 + 1)))
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - ty0))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - (ty0 + 1)))

    taps = jnp.arange(p, dtype=jnp.int32)
    w4 = (wx0[..., None] * (taps == off[..., None])
          + wx1[..., None] * (taps == off[..., None] + 1))  # [N, M, P]

    xblend0 = jnp.einsum("nmp,nmpc->nmc", w4, rows[:, 0].astype(jnp.float32))
    xblend1 = jnp.einsum("nmp,nmpc->nmc", w4, rows[:, 1].astype(jnp.float32))
    out = xblend0 * wy0[..., None] + xblend1 * wy1[..., None]
    return out.astype(table.dtype)


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
