"""Camera pose samplers and intrinsics helpers (ref `camera_utils.py:22-154`).

y-up look-at convention; poses returned as `[N, 4, 4]` cam2world, intrinsics
normalized by image size."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .math_utils import normalize_vecs


def create_cam2world_matrix(forward_vector, origin):
    """Look-at cam2world, y-up, no roll (ref `camera_utils.py:118-137`)."""
    forward_vector = normalize_vecs(forward_vector)
    up_vector = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], dtype=forward_vector.dtype), forward_vector.shape)

    right_vector = -normalize_vecs(jnp.cross(up_vector, forward_vector))
    up_vector = normalize_vecs(jnp.cross(forward_vector, right_vector))

    rotation = jnp.stack((right_vector, up_vector, forward_vector), axis=-1)  # [N,3,3]
    n = forward_vector.shape[0]
    cam2world = jnp.tile(jnp.eye(4, dtype=forward_vector.dtype)[None], (n, 1, 1))
    cam2world = cam2world.at[:, :3, :3].set(rotation)
    cam2world = cam2world.at[:, :3, 3].set(origin)
    return cam2world


def _origins_from_angles(h, v, radius):
    """Spherical camera origin; h=azimuth sample, v in (0,1)-ish polar."""
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    theta = h
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    x = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    z = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    y = radius * jnp.cos(phi)
    return jnp.concatenate([x, y, z], axis=-1)


class GaussianCameraPoseSampler:
    """Gaussian pitch/yaw looking at origin (ref `camera_utils.py:22-55`)."""

    @staticmethod
    def sample(rng, horizontal_mean, vertical_mean, horizontal_stddev=0.0,
               vertical_stddev=0.0, radius=1.0, batch_size=1):
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
        origins = _origins_from_angles(h, v, radius)
        forward = normalize_vecs(-origins)
        return create_cam2world_matrix(forward, origins)


class LookAtPoseSampler:
    """Gaussian pitch/yaw looking at a point (ref `camera_utils.py:58-85`);
    the workhorse sampler for orbit videos and random-pose training."""

    @staticmethod
    def sample(rng, horizontal_mean, vertical_mean, lookat_position,
               horizontal_stddev=0.0, vertical_stddev=0.0, radius=1.0, batch_size=1):
        if rng is None:
            h = jnp.full((batch_size, 1), horizontal_mean, dtype=jnp.float32)
            v = jnp.full((batch_size, 1), vertical_mean, dtype=jnp.float32)
        else:
            kh, kv = jax.random.split(rng)
            h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
            v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
        origins = _origins_from_angles(h, v, radius)
        forward = normalize_vecs(jnp.asarray(lookat_position, dtype=jnp.float32) - origins)
        return create_cam2world_matrix(forward, origins)


class UniformCameraPoseSampler:
    """Uniform +-stddev pitch/yaw looking at origin (ref `camera_utils.py:88-115`)."""

    @staticmethod
    def sample(rng, horizontal_mean, vertical_mean, horizontal_stddev=0.0,
               vertical_stddev=0.0, radius=1.0, batch_size=1):
        kh, kv = jax.random.split(rng)
        h = (jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * horizontal_stddev + horizontal_mean
        v = (jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * vertical_stddev + vertical_mean
        origins = _origins_from_angles(h, v, radius)
        forward = normalize_vecs(-origins)
        return create_cam2world_matrix(forward, origins)


def fov_to_intrinsics(fov_degrees):
    """Normalized 3x3 intrinsics from FOV in degrees (ref `camera_utils.py:140-154`)."""
    focal_length = 1 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414)
    return jnp.asarray(
        [[focal_length, 0, 0.5], [0, focal_length, 0.5], [0, 0, 1]],
        dtype=jnp.float32)


def pose_to_conditioning(cam2world, intrinsics):
    """Flatten pose to the 25-float conditioning vector used everywhere."""
    n = cam2world.shape[0]
    return jnp.concatenate(
        [cam2world.reshape(n, 16), intrinsics.reshape(-1, 9) *
         jnp.ones((n, 1), cam2world.dtype)], axis=1)
