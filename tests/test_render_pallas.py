"""Fused decode+composite kernel (ops/render_pallas.py) vs the unfused
frustum composite path — identical math, so f32 agreement must be tight.

Runs through the Pallas interpreter on CPU; TPU-side timing/validation is
scripts/profile_fused_render.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.render import frustum
from pix2pix3d_tpu.render.camera import LookAtPoseSampler, fov_to_intrinsics

BW = 1.0


def _camera(yaw, pitch, batch=1):
    c2w = LookAtPoseSampler.sample(None, yaw, pitch, [0.0, 0.0, -0.06],
                                   radius=2.7, batch_size=batch)
    intr = jnp.tile(fov_to_intrinsics(18.837)[None], (batch, 1, 1))
    return c2w, intr


def _smooth_planes(key, s, c, n=1):
    base = jax.random.normal(key, (n, 3, s // 8, s // 8, c))
    return jax.image.resize(base, (n, 3, s, s, c), "bicubic")


@pytest.mark.parametrize("sem_sigmoid", [False, True])
def test_fused_composite_matches_unfused(sem_sigmoid):
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate
    from pix2pix3d_tpu.ops.render_pallas import fuse_late_separate_params_t

    key = jax.random.PRNGKey(0)
    planes = _smooth_planes(key, s=64, c=32, n=2)
    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 1.0,
             "sigmoid": sem_sigmoid})
    dp = dec.init(jax.random.PRNGKey(1))
    decoder = lambda f, d: dec(dp, f, d)

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "depth_resolution": 24, "depth_resolution_importance": 24,
            "disparity_space_sampling": False, "clamp_mode": "softplus",
            "white_back": False}
    c2w, intr = _camera(np.pi / 2 + 0.2, np.pi / 2 - 0.1, batch=2)
    nrr = 16

    ref_f, ref_d, ref_w = frustum.frustum_render(
        planes, decoder, c2w, intr, opts, nrr, depth_steps=48, chunk=8)

    fused = (*fuse_late_separate_params_t(dp, 1.0), True, sem_sigmoid)
    got_f, got_d, got_w = frustum.frustum_render(
        planes, None, c2w, intr, opts, nrr, depth_steps=48, chunk=8,
        fused_decoder=fused)

    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunk", [8, 16])
def test_chunk_grid_matches_slab_grid(chunk):
    """The chunk-blocked grid (one step per TC slabs, default) must match
    the original per-slab grid.  Same math in the same order, but the two
    compilations may fma/reassociate differently — measured max delta is
    ~1 ULP (1.2e-6), so the gate is a tight tolerance, not bit equality."""
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate
    from pix2pix3d_tpu.ops.render_pallas import (fuse_late_separate_params_t,
                                                 fused_decode_composite)

    key = jax.random.PRNGKey(2)
    planes = _smooth_planes(key, s=64, c=32, n=2)
    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 1.0,
             "sigmoid": False})
    dp = dec.init(jax.random.PRNGKey(3))
    w1t, b1, w2t, b2 = fuse_late_separate_params_t(dp, 1.0)

    T, R, N, C = 48, 256, 2, 32
    CH = T // chunk
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(CH, N, chunk, C, R).astype(np.float32))
    t_vals = jnp.asarray(
        np.sort(rng.rand(N, T).astype(np.float32) * 2 + 2, axis=1))
    dnorm = jnp.asarray(1 + 0.1 * rng.rand(N, R).astype(np.float32))

    kw = dict(rgb_sigmoid=True, sem_sigmoid=False,
              compute_dtype=jnp.float32, interpret=True)
    a = fused_decode_composite(feats, t_vals, dnorm, w1t, b1, w2t, b2,
                               chunk_grid=True, **kw)
    b = fused_decode_composite(feats, t_vals, dnorm, w1t, b1, w2t, b2,
                               chunk_grid=False, **kw)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_generator_fused_frustum_path():
    """decoder_impl='pallas' end-to-end through the generator on CPU
    (interpreter): must match the plain frustum path closely."""
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.render.camera import pose_to_conditioning

    cfg = cfg_mod.generator_config(
        cfg="afhq", resolution=128, data_type="seg", semantic_channels=6,
        cbase=1024, cmax=32, sr_num_fp16_res=0, render_mask=True,
        gen_pose_cond=True)
    cfg["mapping_kwargs"]["in_resolution"] = 128
    cfg["mapping_kwargs"]["encoder_channel_base"] = 1 / 128
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, G.z_dim).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 6, (1, 128, 128, 1)).astype(np.float32))
    c2w, intr = _camera(np.pi / 2 + 0.15, np.pi / 2 - 0.1)
    pose = pose_to_conditioning(c2w, intr[0])
    batch = {"mask": mask, "pose": pose}

    G.rendering_kwargs["sampler"] = "frustum"
    G.rendering_kwargs["frustum_depth_steps"] = 48
    G.rendering_kwargs["frustum_chunk"] = 16
    G.rendering_kwargs["frustum_bf16"] = False  # f32 for tight comparison
    out_plain = G(params, z, pose, batch, neural_rendering_resolution=32,
                  noise_mode="const", det=True)
    G.rendering_kwargs["decoder_impl"] = "pallas"
    out_fused = G(params, z, pose, batch, neural_rendering_resolution=32,
                  noise_mode="const", det=True)

    for key in ("image_raw", "semantic_raw", "image"):
        np.testing.assert_allclose(np.asarray(out_fused[key]),
                                   np.asarray(out_plain[key]),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("chunk_grid", [False, True])
def test_carry_f32_matches_baseline(chunk_grid):
    """carry_f32=True keeps per-sample colors f32 through the composite
    carry.  At compute_dtype=f32 the cast it removes is a no-op, so the
    outputs must be identical; at bf16 compute it must stay close to the
    f32 reference (it removes one of the bf16 quantization sources)."""
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate
    from pix2pix3d_tpu.ops.render_pallas import (fuse_late_separate_params_t,
                                                 fused_decode_composite)

    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 1.0,
             "sigmoid": False})
    dp = dec.init(jax.random.PRNGKey(5))
    w1t, b1, w2t, b2 = fuse_late_separate_params_t(dp, 1.0)

    T, R, N, C, chunk = 48, 256, 2, 32, 8
    CH = T // chunk
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(CH, N, chunk, C, R).astype(np.float32))
    t_vals = jnp.asarray(
        np.sort(rng.rand(N, T).astype(np.float32) * 2 + 2, axis=1))
    dnorm = jnp.asarray(1 + 0.1 * rng.rand(N, R).astype(np.float32))

    kw = dict(rgb_sigmoid=True, sem_sigmoid=False, interpret=True,
              chunk_grid=chunk_grid)
    ref = fused_decode_composite(feats, t_vals, dnorm, w1t, b1, w2t, b2,
                                 compute_dtype=jnp.float32, carry_f32=False,
                                 **kw)
    same = fused_decode_composite(feats, t_vals, dnorm, w1t, b1, w2t, b2,
                                  compute_dtype=jnp.float32, carry_f32=True,
                                  **kw)
    for x, y in zip(same, ref):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    bf16_carry = fused_decode_composite(feats, t_vals, dnorm, w1t, b1, w2t,
                                        b2, compute_dtype=jnp.bfloat16,
                                        carry_f32=True, **kw)
    for x, y in zip(bf16_carry, ref):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=0.06, atol=0.06)
