"""Smoke/shape tests for the full model stack (tiny channel counts, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pix2pix3d_tpu import config as cfg_mod
from pix2pix3d_tpu.models import build_generator
from pix2pix3d_tpu.nn import DualDiscriminator
from pix2pix3d_tpu.render.camera import LookAtPoseSampler, fov_to_intrinsics, \
    pose_to_conditioning


def tiny_generator_config(use_bg=False):
    cfg = cfg_mod.generator_config(
        cfg="afhq", resolution=128, data_type="seg", semantic_channels=6,
        cbase=2048, cmax=64, sr_num_fp16_res=0, render_mask=True, use_bg=use_bg,
    )
    cfg["rendering_kwargs"].update(depth_resolution=8, depth_resolution_importance=8)
    cfg["mapping_kwargs"]["in_resolution"] = 128
    cfg["mapping_kwargs"]["encoder_channel_base"] = 1 / 64
    return cfg


def make_inputs(batch=1, res=128, num_classes=6, seed=0):
    rng = np.random.RandomState(seed)
    z = jnp.asarray(rng.randn(batch, 512).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, num_classes, size=(batch, res, res, 1)))
    cam2world = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2,
                                         [0, 0, 0], radius=2.7, batch_size=batch)
    intrinsics = fov_to_intrinsics(18.837)
    pose = pose_to_conditioning(cam2world, intrinsics)
    return z, mask, pose


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_generator_config()
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(0))
    return G, params


def test_flagship_generator_forward(tiny_gen):
    G, params = tiny_gen
    z, mask, pose = make_inputs()
    batch = {"mask": mask, "pose": pose}
    out = G(params, z, pose, batch, neural_rendering_resolution=32,
            noise_mode="const", det=True)
    assert out["image"].shape == (1, 128, 128, 3)
    assert out["image_raw"].shape == (1, 32, 32, 3)
    assert out["image_depth"].shape == (1, 32, 32, 1)
    assert out["semantic"].shape == (1, 128, 128, 6)
    assert out["semantic_raw"].shape == (1, 32, 32, 6)
    for k in ("image", "semantic", "image_raw"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_generator_mapping_shapes(tiny_gen):
    G, params = tiny_gen
    z, mask, pose = make_inputs()
    ws = G.mapping(params, z, pose, {"mask": mask, "pose": pose})
    assert ws.shape == (1, G.backbone.num_ws, 512)
    # geometry layers come from the mask: different z, same mask -> same first 7 ws
    z2, _, _ = make_inputs(seed=1)
    ws2 = G.mapping(params, z2, pose, {"mask": mask, "pose": pose})
    np.testing.assert_allclose(np.asarray(ws[:, :7]), np.asarray(ws2[:, :7]), rtol=1e-5)
    assert not np.allclose(np.asarray(ws[:, 7:]), np.asarray(ws2[:, 7:]))


def test_sample_mixed_field_eval(tiny_gen):
    G, params = tiny_gen
    z, mask, pose = make_inputs()
    ws = G.mapping(params, z, pose, {"mask": mask, "pose": pose})
    coords = jnp.asarray(np.random.RandomState(0).uniform(
        -0.4, 0.4, size=(1, 100, 3)).astype(np.float32))
    dirs = jnp.zeros_like(coords)
    out = G.sample_mixed(params, coords, dirs, ws, noise_mode="const")
    assert out["sigma"].shape == (1, 100, 1)
    assert out["rgb"].shape == (1, 100, 64)  # 32 rgb-features + 32 semantic


def test_dual_discriminator_forward():
    D = DualDiscriminator(c_dim=25, img_resolution=128, img_channels=3,
                          channel_base=2048, channel_max=64, num_fp16_res=0)
    params = D.init(jax.random.PRNGKey(1))
    img = {
        "image": jnp.zeros((2, 128, 128, 3), jnp.float32),
        "image_raw": jnp.zeros((2, 32, 32, 3), jnp.float32),
    }
    c = jnp.zeros((2, 25), jnp.float32)
    logits = D(params, img, c)
    assert logits.shape == (2, 1)


def test_generator_with_bg():
    cfg = tiny_generator_config(use_bg=True)
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(2))
    z, mask, pose = make_inputs()
    out = G(params, z, pose, {"mask": mask, "pose": pose},
            neural_rendering_resolution=32, noise_mode="const", det=True)
    assert out["weight"].shape == (1, 32, 32, 1)
    assert out["image"].shape == (1, 128, 128, 3)
