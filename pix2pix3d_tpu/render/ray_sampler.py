"""Camera rays from cam2world + intrinsics (ref
`training/volumetric_rendering/ray_sampler.py:18-63`, OpenCV convention)."""

from __future__ import annotations

import jax.numpy as jnp


def sample_rays(cam2world_matrix, intrinsics, resolution):
    """Per-pixel ray origins and normalized world directions.

    Args:
        cam2world_matrix: `[N, 4, 4]`.
        intrinsics: `[N, 3, 3]` normalized (focal/principal in image units).
        resolution: int, rays = resolution**2 (pixel centers, row-major).

    Returns:
        ray_origins `[N, M, 3]`, ray_dirs `[N, M, 3]`.
    """
    n = cam2world_matrix.shape[0]
    m = resolution ** 2
    cam_locs_world = cam2world_matrix[:, :3, 3]
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    cx = intrinsics[:, 0, 2]
    cy = intrinsics[:, 1, 2]
    sk = intrinsics[:, 0, 1]

    # Pixel-center uv grid in [0,1]; row-major over (row, col) with
    # x = col coordinate, y = row coordinate (ref flip(0) of an ij meshgrid).
    coords = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    x_cam = jnp.broadcast_to(xx.reshape(1, m), (n, m))
    y_cam = jnp.broadcast_to(yy.reshape(1, m), (n, m))
    z_cam = jnp.ones((n, m), dtype=jnp.float32)

    fx = fx[:, None]
    fy = fy[:, None]
    cx = cx[:, None]
    cy = cy[:, None]
    sk = sk[:, None]

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel_points = jnp.stack(
        [x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)  # [N, M, 4]
    world_points = jnp.einsum(
        "nij,nmj->nmi", cam2world_matrix, cam_rel_points)[:, :, :3]

    ray_dirs = world_points - cam_locs_world[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=2, keepdims=True)
    ray_origins = jnp.broadcast_to(cam_locs_world[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs
