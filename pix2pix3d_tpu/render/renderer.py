"""Two-pass importance-sampled tri-plane volume renderer.

Ref `training/volumetric_rendering/renderer.py:82-253`.  Functional: planes
and decoder params are inputs, randomness is an explicit rng key, sample
counts come from `rendering_options` and are static, so the whole renderer
jits into one fused XLA program with fixed shapes (the data-dependent sort /
searchsorted are fine under jit because shapes are static).

Plane layout is feature-last: `[N, 3, H, W, C]` (reference is `[N, 3, C, H,
W]`).  The XLA gather in `sample_from_planes` is the baseline; a fused
Pallas kernel for (project -> gather -> lerp -> decoder MLP) lives in
`ops/triplane_pallas.py` and is selected with `impl='pallas'`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d, grid_sample_2d_patch
from . import math_utils
from .ray_marcher import march_rays


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
    out = grid_sample_2d_patch(flat_planes, flat_coords)
    return out.reshape(n, n_planes, m, c)


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
    # short (S-2 bins), so a [NR, S_imp, S-1] compare+sum beats the serial
    # binary-search lowering on TPU by a wide margin.
    inds = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_weights)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)


class ImportanceRenderer:
    """Coarse stratified pass -> importance resample -> unified fine pass
    (ref `renderer.py:82-253`).  Decoder is a callable
    `decoder(sampled_features [N,3,M,C], directions [N,M,3]) ->
    {'rgb': [N,M,K], 'sigma': [N,M,1]}`."""

    def __call__(self, planes, decoder, ray_origins, ray_directions,
                 rendering_options, rng=None, det=False):
        if rendering_options["ray_start"] == rendering_options["ray_end"] == "auto":
            ray_start, ray_end = math_utils.get_ray_limits_box(
                ray_origins, ray_directions,
                box_side_length=rendering_options["box_warp"])
            is_valid = ray_end > ray_start
            # Invalid rays borrow the valid range (ref :94-96, vectorized).
            valid_start_min = jnp.min(jnp.where(is_valid, ray_start, jnp.inf))
            valid_start_max = jnp.max(jnp.where(is_valid, ray_start, -jnp.inf))
            ray_start = jnp.where(is_valid, ray_start, valid_start_min)
            ray_end = jnp.where(is_valid, ray_end, valid_start_max)
        else:
            ray_start = rendering_options["ray_start"]
            ray_end = rendering_options["ray_end"]

        rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
        depths_coarse = self.sample_stratified(
            rngs[0], ray_origins, ray_start, ray_end,
            rendering_options["depth_resolution"],
            rendering_options.get("disparity_space_sampling", False), det=det)

        batch_size, num_rays, s_coarse, _ = depths_coarse.shape

        coords = (ray_origins[:, :, None, :] +
                  depths_coarse * ray_directions[:, :, None, :]).reshape(batch_size, -1, 3)
        dirs = jnp.broadcast_to(
            ray_directions[:, :, None, :],
            (batch_size, num_rays, s_coarse, 3)).reshape(batch_size, -1, 3)

        out = self.run_model(planes, decoder, coords, dirs, rendering_options,
                             rng=rngs[1])
        colors_coarse = out["rgb"].reshape(batch_size, num_rays, s_coarse, -1)
        densities_coarse = out["sigma"].reshape(batch_size, num_rays, s_coarse, 1)

        n_importance = rendering_options["depth_resolution_importance"]
        if n_importance > 0:
            _, _, weights = march_rays(colors_coarse, densities_coarse,
                                       depths_coarse, rendering_options)
            depths_fine = self.sample_importance(rngs[2], depths_coarse, weights,
                                                 n_importance, det=det)

            coords = (ray_origins[:, :, None, :] +
                      depths_fine * ray_directions[:, :, None, :]).reshape(batch_size, -1, 3)
            dirs = jnp.broadcast_to(
                ray_directions[:, :, None, :],
                (batch_size, num_rays, n_importance, 3)).reshape(batch_size, -1, 3)

            out = self.run_model(planes, decoder, coords, dirs, rendering_options,
                                 rng=rngs[1])
            colors_fine = out["rgb"].reshape(batch_size, num_rays, n_importance, -1)
            densities_fine = out["sigma"].reshape(batch_size, num_rays, n_importance, 1)

            all_depths, all_colors, all_densities = self.unify_samples(
                depths_coarse, colors_coarse, densities_coarse,
                depths_fine, colors_fine, densities_fine)
            rgb_final, depth_final, weights = march_rays(
                all_colors, all_densities, all_depths, rendering_options)
        else:
            rgb_final, depth_final, weights = march_rays(
                colors_coarse, densities_coarse, depths_coarse, rendering_options)

        return rgb_final, depth_final, jnp.sum(weights, axis=2)

    def run_model(self, planes, decoder, sample_coordinates, sample_directions,
                  options, rng=None):
        """Point evaluation: tri-plane sample + decoder MLP.

        Memory: the patch-gather materializes a [N*3, chunk, 2, 2, C] tensor,
        so large point counts are processed in `point_chunk`-sized chunks via
        `lax.map` (serial chunks, each one big fused XLA program)."""
        chunk = int(options.get("point_chunk", 65536))
        n, m, _ = sample_coordinates.shape
        # bf16 planes halve the per-patch gather bytes; decoder math stays
        # f32 (features are cast back after the blend).
        if options.get("plane_dtype") == "bfloat16":
            planes = planes.astype(jnp.bfloat16)

        def eval_points(coords, dirs):
            feats = sample_from_planes(planes, coords,
                                       box_warp=options["box_warp"])
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
        """Jittered uniform depths `[N, R, S, 1]` (ref `renderer.py:169-192`)."""
        n, m, _ = ray_origins.shape
        if disparity_space_sampling:
            depths = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, depth_resolution).reshape(1, 1, -1, 1),
                (n, m, depth_resolution, 1))
            delta = 1 / (depth_resolution - 1)
            if not det:
                depths = depths + jax.random.uniform(rng, depths.shape) * delta
            return 1.0 / (1.0 / ray_start * (1.0 - depths) + 1.0 / ray_end * depths)

        if isinstance(ray_start, jnp.ndarray) and ray_start.ndim > 0:
            # Per-ray bounds from the auto box intersection, [N, M, 1].
            depths = math_utils.linspace_batched(ray_start, ray_end, depth_resolution)
            depths = jnp.transpose(depths, (1, 2, 0, 3))  # [N, M, S, 1]
            delta = (ray_end - ray_start) / (depth_resolution - 1)  # [N, M, 1]
            if not det:
                depths = depths + jax.random.uniform(rng, depths.shape) * delta[..., None]
            return depths

        depths = jnp.broadcast_to(
            jnp.linspace(float(ray_start), float(ray_end),
                         depth_resolution).reshape(1, 1, -1, 1),
            (n, m, depth_resolution, 1))
        delta = (ray_end - ray_start) / (depth_resolution - 1)
        if not det:
            depths = depths + jax.random.uniform(rng, depths.shape) * delta
        return depths

    @staticmethod
    def sample_importance(rng, z_vals, weights, n_importance, det=False):
        """PDF-resampled depths `[N, R, S_imp, 1]` (ref `renderer.py:194-212`)."""
        batch_size, num_rays, samples_per_ray, _ = z_vals.shape
        z_flat = jax.lax.stop_gradient(z_vals).reshape(batch_size * num_rays,
                                                       samples_per_ray)
        w_flat = jax.lax.stop_gradient(weights).reshape(batch_size * num_rays, -1)
        w_flat = _smooth_weights(w_flat) + 0.01
        z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
        samples = sample_pdf(rng, z_mid, w_flat[:, 1:-1], n_importance, det=det)
        return samples.reshape(batch_size, num_rays, n_importance, 1)

    @staticmethod
    def unify_samples(depths1, colors1, densities1, depths2, colors2, densities2):
        """Merge + depth-sort coarse and fine samples (ref `renderer.py:157-167`).

        TPU note: one argsort on the depth keys, then ONE gather over the
        packed [depth|color|density] rows — a single wide-row gather instead
        of three narrow ones (random-access on TPU HBM is transaction-bound,
        so fewer, wider slices win)."""
        all_depths = jnp.concatenate([depths1, depths2], axis=-2)
        all_colors = jnp.concatenate([colors1, colors2], axis=-2)
        all_densities = jnp.concatenate([densities1, densities2], axis=-2)

        indices = jnp.argsort(all_depths, axis=-2)
        packed = jnp.concatenate([all_depths, all_colors, all_densities], axis=-1)
        packed = jnp.take_along_axis(packed, indices, axis=-2)  # bcast on C
        c = all_colors.shape[-1]
        return (packed[..., :1], packed[..., 1:1 + c], packed[..., 1 + c:])
