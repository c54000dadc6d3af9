"""Two-pass importance-sampled tri-plane volume renderer.

Ref `training/volumetric_rendering/renderer.py:82-253`.  Functional: planes
and decoder params are inputs, randomness is an explicit rng key, sample
counts come from `rendering_options` and are static, so the whole renderer
jits into one fused XLA program with fixed shapes.

TPU-first redesign of the hot path (same math as the reference, reordered
for the memory system):

- plane sampling fetches each point's 2x2xC corner patch with ONE gather
  slice (`ops/grid_sample.grid_sample_2d_patch`) and is chunked over points
  so the patch tensor stays in a bounded working set;
- depths/densities ride as `[N, R, S]` with the sample axis last — trailing
  singleton dims would be tile-padded 128x;
- the coarse+fine merge never materializes merged color tensors: depths and
  densities are merged with a 3-operand `lax.sort` (vectorized sorting
  network, no gathers), compositing weights are computed on the sorted
  scalars, and each ORIGINAL sample's contribution coefficient is read back
  through its merged rank — `sum_i w_i (c_i + c_{i+1})/2` over the merged
  order is algebraically identical to `sum_j coeff_j c_j` over the original
  order, so the reference's `unify_samples` + second march
  (`renderer.py:131-135,157-167`) is reproduced exactly without sorting a
  single color value.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid_sample import (grid_sample_2d_patch,
                               grid_sample_2d_patch_rowpair,
                               pack_plane_blocks, sample_packed_planes)
from . import math_utils
from .ray_marcher import (march_rays, march_rays_3d, compute_weights_3d,
                          midpoint_coefficients, finalize_composite_3d)


def generate_plane_axes():
    """Axis matrices of the 3 canonical planes (ref `renderer.py:23-37`)."""
    return np.array(
        [
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
            [[0, 0, 1], [1, 0, 0], [0, 1, 0]],
        ],
        dtype=np.float32,
    )


_INV_PLANE_AXES = np.linalg.inv(generate_plane_axes())  # [3, 3, 3] (host const)


def project_onto_planes(coordinates):
    """[N, M, 3] world coords -> [N, 3, M, 2] per-plane 2D coords
    (ref `renderer.py:39-53`, batched matmul against inverse plane axes)."""
    inv_axes = jnp.asarray(_INV_PLANE_AXES, dtype=coordinates.dtype)
    proj = jnp.einsum("nmi,pij->npmj", coordinates, inv_axes,
                      precision=jax.lax.Precision.HIGHEST)
    return proj[..., :2]


def sample_from_planes(plane_features, coordinates, box_warp):
    """Bilinear sample the 3 planes at 3D points (ref `renderer.py:55-65`).

    Args:
        plane_features: `[N, 3, H, W, C]`.
        coordinates: `[N, M, 3]`.
    Returns:
        `[N, 3, M, C]`.
    """
    n, n_planes, h, w, c = plane_features.shape
    m = coordinates.shape[1]
    coordinates = (2 / box_warp) * coordinates
    proj = project_onto_planes(coordinates)  # [N, 3, M, 2]
    flat_planes = plane_features.reshape(n * n_planes, h, w, c)
    flat_coords = proj.reshape(n * n_planes, m, 2).astype(jnp.float32)
    # NOTE: grid_sample_2d_patch_rowpair halves the padded write traffic but
    # hit a TPU device fault on v5e in end-to-end testing (see NOTES_PERF);
    # the 4-D patch gather is the validated production path.
    out = grid_sample_2d_patch(flat_planes, flat_coords)
    return out.reshape(n, n_planes, m, c)


def make_plane_sampler(plane_features, box_warp):
    """Precompute the padding-free packed block table (once per plane set)
    and return `coords [N, M, 3] -> features [N, 3, M, C]`.  Falls back to
    the patch gather for block-incompatible shapes."""
    n, n_planes, h, w, c = plane_features.shape
    # NOTE: measured on v5e, the TPU gather unit is bound by SLICE COUNT
    # (~40M slices/s) rather than bytes, so the single-slice 2x2xC patch
    # gather beats the 2-slice padding-free block layout despite moving 16x
    # more bytes.  The block path is kept for plane shapes whose patch
    # would pad even worse; `use_blocked_sampler` opts in explicitly.
    blocked = False
    if not blocked:
        return lambda coords: sample_from_planes(plane_features, coords,
                                                 box_warp)
    table = pack_plane_blocks(plane_features.reshape(n * n_planes, h, w, c))

    def sample(coordinates):
        m = coordinates.shape[1]
        proj = project_onto_planes((2 / box_warp) * coordinates)
        flat_coords = proj.reshape(n * n_planes, m, 2).astype(jnp.float32)
        out = sample_packed_planes(table, (h, w, c), flat_coords)
        return out.reshape(n, n_planes, m, c)

    return sample


def _smooth_weights(weights):
    """max-pool(2,1,pad 1) then avg-pool(2,1) along the sample axis
    (ref `renderer.py:204-207`).  weights: `[NR, L]` -> `[NR, L]`."""
    wp = jnp.pad(weights, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    mx = jnp.maximum(wp[:, :-1], wp[:, 1:])  # [NR, L+1]
    return (mx[:, :-1] + mx[:, 1:]) / 2  # [NR, L]


def sample_pdf(rng, bins, weights, n_importance, det=False, eps=1e-5):
    """Inverse-CDF sampling (ref `renderer.py:214-253`).

    bins: `[NR, B]`, weights: `[NR, W]` with W = B - 2 (reference quirk:
    the last bin is never indexed)."""
    nr, n_weights = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [NR, W+1]

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), (nr, n_importance))
    else:
        u = jax.random.uniform(rng, (nr, n_importance), dtype=jnp.float32)

    # searchsorted(side='right') as a vectorized comparison-count: the CDF is
    # short, so a [NR, S_imp, W+1] compare+sum beats the serial binary-search
    # lowering on TPU by a wide margin.
    inds = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_weights)

    # The four bin/cdf lookups as one-hot contractions instead of lane-dim
    # take_along_axis (the slow TPU gather path); the one-hot compare fuses
    # into the dot on the VPU.
    taps_cdf = jnp.arange(cdf.shape[1], dtype=jnp.int32)
    taps_bins = jnp.arange(bins.shape[1], dtype=jnp.int32)

    def pick(idx):
        oh_c = (idx[:, :, None] == taps_cdf).astype(jnp.float32)
        oh_b = (idx[:, :, None] == taps_bins).astype(jnp.float32)
        return (jnp.einsum("rsw,rw->rs", oh_c, cdf),
                jnp.einsum("rsw,rw->rs", oh_b, bins))

    cdf_g0, bins_g0 = pick(below)
    cdf_g1, bins_g1 = pick(above)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)


def render_rays(run_model_fn, ray_origins, ray_directions, rendering_options,
                rng=None, det=False):
    """Core two-pass hierarchical renderer over an arbitrary field.

    run_model_fn(coords `[N, M, 3]`, dirs `[N, M, 3]`) ->
        {'rgb': `[N, M, C]`, 'sigma': `[N, M, 1]`}.
    Returns (features `[N, R, C]`, depth `[N, R, 1]`, weight_sum `[N, R, 1]`).
    """
    if rendering_options["ray_start"] == rendering_options["ray_end"] == "auto":
        ray_start, ray_end = math_utils.get_ray_limits_box(
            ray_origins, ray_directions,
            box_side_length=rendering_options["box_warp"])
        is_valid = ray_end > ray_start
        valid_start_min = jnp.min(jnp.where(is_valid, ray_start, jnp.inf))
        valid_start_max = jnp.max(jnp.where(is_valid, ray_start, -jnp.inf))
        ray_start = jnp.where(is_valid, ray_start, valid_start_min)
        ray_end = jnp.where(is_valid, ray_end, valid_start_max)
        ray_start = ray_start[..., 0]  # [N, R]
        ray_end = ray_end[..., 0]
    else:
        ray_start = rendering_options["ray_start"]
        ray_end = rendering_options["ray_end"]

    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    depths_coarse = ImportanceRenderer.sample_stratified(
        rngs[0], ray_origins, ray_start, ray_end,
        rendering_options["depth_resolution"],
        rendering_options.get("disparity_space_sampling", False), det=det)
    n, r, s_coarse = depths_coarse.shape

    def eval_at(depths, s):
        # Depth-major point order: consecutive points are ADJACENT RAYS at
        # the same depth, which map to adjacent plane texels — the random
        # gathers become spatially coherent and the HBM transactions batch.
        # (Ray-major order makes consecutive points span the whole plane.)
        coords = (ray_origins[:, :, None, :]
                  + depths[..., None] * ray_directions[:, :, None, :])
        coords = coords.transpose(0, 2, 1, 3).reshape(n, s * r, 3)
        dirs = jnp.broadcast_to(ray_directions[:, None, :, :],
                                (n, s, r, 3)).reshape(n, s * r, 3)
        out = run_model_fn(coords, dirs)
        colors = out["rgb"].reshape(n, s, r, -1).transpose(0, 2, 1, 3)
        densities = out["sigma"].reshape(n, s, r).transpose(0, 2, 1)
        return colors, densities

    colors_coarse, densities_coarse = eval_at(depths_coarse, s_coarse)

    n_imp = rendering_options["depth_resolution_importance"]
    if n_imp <= 0:
        rgb, depth, weights = march_rays_3d(colors_coarse, densities_coarse,
                                            depths_coarse, rendering_options)
        return rgb, depth[..., None], jnp.sum(weights, -1)[..., None]

    weights = compute_weights_3d(densities_coarse, depths_coarse,
                                 rendering_options)
    depths_fine = ImportanceRenderer.sample_importance(
        rngs[2], depths_coarse, weights, n_imp, det=det)
    colors_fine, densities_fine = eval_at(depths_fine, n_imp)

    # ---- merged compositing without materializing merged colors.
    s2 = s_coarse + n_imp
    all_depths = jnp.concatenate([depths_coarse, depths_fine], axis=-1)
    all_densities = jnp.concatenate([densities_coarse, densities_fine], axis=-1)
    iota = jnp.broadcast_to(jnp.arange(s2, dtype=jnp.int32), all_depths.shape)
    d_sorted, sig_sorted, perm = jax.lax.sort(
        (all_depths, all_densities, iota), dimension=-1, num_keys=1)

    w_merged = compute_weights_3d(sig_sorted, d_sorted, rendering_options)
    coeff_merged = midpoint_coefficients(w_merged)  # [N, R, S2], sorted order
    # Un-permute WITHOUT a gather: sorting (perm, coeff) by perm restores the
    # original sample order through another vectorized sorting network
    # (lane-dim take_along_axis is a slow path on TPU).
    _, coeff = jax.lax.sort((perm, coeff_merged), dimension=-1, num_keys=1)

    rgb = (jnp.einsum("nrs,nrsc->nrc", coeff[..., :s_coarse], colors_coarse)
           + jnp.einsum("nrs,nrsc->nrc", coeff[..., s_coarse:], colors_fine))
    weight_total = jnp.sum(w_merged, axis=-1)
    depth = jnp.sum(coeff * all_depths, axis=-1) / weight_total
    rgb, depth = finalize_composite_3d(rgb, depth, weight_total, all_depths,
                                       rendering_options)
    return rgb, depth[..., None], weight_total[..., None]


class ImportanceRenderer:
    """Coarse stratified pass -> importance resample -> merged fine pass
    (ref `renderer.py:82-253`).  Decoder is a callable
    `decoder(sampled_features [N,3,M,C], directions [N,M,3]) ->
    {'rgb': [N,M,K], 'sigma': [N,M,1]}`."""

    def __call__(self, planes, decoder, ray_origins, ray_directions,
                 rendering_options, rng=None, det=False):
        run = lambda coords, dirs: self.run_model(
            planes, decoder, coords, dirs, rendering_options, rng=rng)
        return render_rays(run, ray_origins, ray_directions, rendering_options,
                           rng=rng, det=det)

    def run_model(self, planes, decoder, sample_coordinates, sample_directions,
                  options, rng=None):
        """Point evaluation: tri-plane sample + decoder MLP.

        Memory: the patch-gather materializes a [N*3, chunk, 2, 2, C] tensor,
        so large point counts are processed in `point_chunk`-sized chunks via
        `lax.map` (serial chunks, each one big fused XLA program)."""
        chunk = int(options.get("point_chunk", 65536))
        n, m, _ = sample_coordinates.shape
        if options.get("plane_dtype") == "bfloat16":
            planes = planes.astype(jnp.bfloat16)
        # packed block table built ONCE, closed over by the chunked eval
        sampler = make_plane_sampler(planes, options["box_warp"])

        def eval_points(coords, dirs):
            feats = sampler(coords)
            return decoder(feats.astype(jnp.float32), dirs)

        if m <= chunk:
            out = eval_points(sample_coordinates, sample_directions)
        else:
            n_chunks = -(-m // chunk)
            pad = n_chunks * chunk - m
            coords = jnp.pad(sample_coordinates, ((0, 0), (0, pad), (0, 0)))
            dirs = jnp.pad(sample_directions, ((0, 0), (0, pad), (0, 0)))
            coords = coords.reshape(n, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
            dirs = dirs.reshape(n, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
            chunks = jax.lax.map(lambda cd: eval_points(cd[0], cd[1]),
                                 (coords, dirs))
            out = {k: v.transpose(1, 0, 2, 3).reshape(n, n_chunks * chunk, -1)[:, :m]
                   for k, v in chunks.items()}

        if options.get("density_noise", 0) > 0:
            assert rng is not None
            out["sigma"] = out["sigma"] + jax.random.normal(
                rng, out["sigma"].shape, out["sigma"].dtype) * options["density_noise"]
        return out

    @staticmethod
    def sample_stratified(rng, ray_origins, ray_start, ray_end, depth_resolution,
                          disparity_space_sampling=False, det=False):
        """Jittered uniform depths `[N, R, S]` (ref `renderer.py:169-192`)."""
        n, m, _ = ray_origins.shape
        if disparity_space_sampling:
            depths = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, depth_resolution).reshape(1, 1, -1),
                (n, m, depth_resolution))
            delta = 1 / (depth_resolution - 1)
            if not det:
                depths = depths + jax.random.uniform(rng, depths.shape) * delta
            return 1.0 / (1.0 / ray_start * (1.0 - depths) + 1.0 / ray_end * depths)

        if isinstance(ray_start, jnp.ndarray) and ray_start.ndim > 0:
            # Per-ray bounds from the auto box intersection, [N, M].
            steps = jnp.linspace(0.0, 1.0, depth_resolution)
            depths = ray_start[..., None] + steps * (ray_end - ray_start)[..., None]
            delta = (ray_end - ray_start)[..., None] / (depth_resolution - 1)
            if not det:
                depths = depths + jax.random.uniform(rng, depths.shape) * delta
            return depths

        depths = jnp.broadcast_to(
            jnp.linspace(float(ray_start), float(ray_end),
                         depth_resolution).reshape(1, 1, -1),
            (n, m, depth_resolution))
        delta = (ray_end - ray_start) / (depth_resolution - 1)
        if not det:
            depths = depths + jax.random.uniform(rng, depths.shape) * delta
        return depths

    @staticmethod
    def sample_importance(rng, z_vals, weights, n_importance, det=False):
        """PDF-resampled depths `[N, R, S_imp]` (ref `renderer.py:194-212`).

        z_vals `[N, R, S]`, weights `[N, R, S-1]`."""
        n, r, s = z_vals.shape
        z_flat = jax.lax.stop_gradient(z_vals).reshape(n * r, s)
        w_flat = jax.lax.stop_gradient(weights).reshape(n * r, -1)
        w_flat = _smooth_weights(w_flat) + 0.01
        z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
        samples = sample_pdf(rng, z_mid, w_flat[:, 1:-1], n_importance, det=det)
        return samples.reshape(n, r, n_importance)

    @staticmethod
    def unify_samples(depths1, colors1, densities1, depths2, colors2, densities2):
        """Reference-style merge returning sorted merged tensors
        (`renderer.py:157-167`).  Kept for parity tests; the production path
        in `render_rays` composites without materializing these."""
        all_depths = jnp.concatenate([depths1, depths2], axis=-2)
        all_colors = jnp.concatenate([colors1, colors2], axis=-2)
        all_densities = jnp.concatenate([densities1, densities2], axis=-2)

        indices = jnp.argsort(all_depths, axis=-2)
        packed = jnp.concatenate([all_depths, all_colors, all_densities], axis=-1)
        packed = jnp.take_along_axis(packed, indices, axis=-2)  # bcast on C
        c = all_colors.shape[-1]
        return (packed[..., :1], packed[..., 1:1 + c], packed[..., 1 + c:])
