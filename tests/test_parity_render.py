"""Parity for the volumetric rendering stack and conditional mapping vs the
reference torch code (CPU, deterministic paths)."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

from pix2pix3d_tpu.render.ray_sampler import sample_rays
from pix2pix3d_tpu.render.ray_marcher import march_rays
from pix2pix3d_tpu.render.renderer import (
    sample_from_planes, sample_pdf, _smooth_weights)
from pix2pix3d_tpu.utils.convert import convert_state_dict

torch.manual_seed(0)


def test_ray_sampler_parity():
    from training.volumetric_rendering.ray_sampler import RaySampler
    rng = np.random.RandomState(0)
    # a plausible cam2world: look-at from a ring
    from pix2pix3d_tpu.render.camera import LookAtPoseSampler, fov_to_intrinsics
    c2w = np.asarray(LookAtPoseSampler.sample(None, 0.3 + np.pi / 2, np.pi / 2,
                                              [0, 0, 0.2], radius=2.7, batch_size=2))
    intr = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (2, 1, 1))

    ref = RaySampler()
    want_o, want_d = ref(torch.from_numpy(c2w), torch.from_numpy(intr), 16)
    got_o, got_d = sample_rays(jnp.asarray(c2w), jnp.asarray(intr), 16)
    np.testing.assert_allclose(np.asarray(got_o), want_o.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), want_d.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("white_back", [False, True])
def test_ray_marcher_parity(white_back):
    from training.volumetric_rendering.ray_marcher import MipRayMarcher2
    rng = np.random.RandomState(1)
    n, r, s, c = 2, 8, 12, 5
    colors = rng.randn(n, r, s, c).astype(np.float32)
    densities = rng.randn(n, r, s, 1).astype(np.float32) * 2
    depths = np.sort(rng.rand(n, r, s, 1).astype(np.float32) * 2 + 2.0, axis=2)
    opts = {"clamp_mode": "softplus", "white_back": white_back}

    ref = MipRayMarcher2()
    want_rgb, want_depth, want_w = ref(torch.from_numpy(colors),
                                       torch.from_numpy(densities),
                                       torch.from_numpy(depths), opts)
    got_rgb, got_depth, got_w = march_rays(jnp.asarray(colors),
                                           jnp.asarray(densities),
                                           jnp.asarray(depths), opts)
    np.testing.assert_allclose(np.asarray(got_rgb), want_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_depth), want_depth.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), rtol=1e-4, atol=1e-5)


def test_sample_from_planes_parity():
    from training.volumetric_rendering import renderer as ref_renderer
    rng = np.random.RandomState(2)
    n, c, h, w, m = 2, 6, 16, 16, 37
    planes_nchw = rng.randn(n, 3, c, h, w).astype(np.float32)
    coords = rng.uniform(-0.6, 0.6, size=(n, m, 3)).astype(np.float32)
    box_warp = 1.0

    plane_axes = ref_renderer.generate_planes()
    want = ref_renderer.sample_from_planes(
        plane_axes, torch.from_numpy(planes_nchw), torch.from_numpy(coords),
        padding_mode="zeros", box_warp=box_warp).numpy()  # [N, 3, M, C]

    planes_nhwc = jnp.asarray(np.transpose(planes_nchw, (0, 1, 3, 4, 2)))
    got = np.asarray(sample_from_planes(planes_nhwc, jnp.asarray(coords), box_warp))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_weight_smoothing_parity():
    """max-pool + avg-pool smoothing matches torch pooling exactly."""
    rng = np.random.RandomState(3)
    w = np.abs(rng.randn(6, 47).astype(np.float32))
    tw = torch.from_numpy(w).unsqueeze(1)
    tw = torch.nn.functional.max_pool1d(tw, 2, 1, padding=1)
    want = torch.nn.functional.avg_pool1d(tw, 2, 1).squeeze(1).numpy()
    got = np.asarray(_smooth_weights(jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_sample_pdf_parity_det():
    from training.volumetric_rendering.renderer import ImportanceRenderer
    rng = np.random.RandomState(4)
    bins = np.sort(rng.rand(5, 13).astype(np.float32), axis=1)
    weights = np.abs(rng.randn(5, 11).astype(np.float32))

    ref = ImportanceRenderer()
    want = ref.sample_pdf(torch.from_numpy(bins), torch.from_numpy(weights),
                          16, det=True).numpy()
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                16, det=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cond_mapping_parity():
    """MaskMappingNetwork_disentangle (the seg mapping) end to end."""
    from training import triplane_cond as ref_tc
    from pix2pix3d_tpu.nn.cond_mapping import MaskMappingNetworkDisentangle

    kwargs = dict(z_dim=64, c_dim=25, in_resolution=16, in_channels=6, w_dim=64,
                  num_ws=14, num_layers=2)
    ref_map = ref_tc.MaskMappingNetwork_disentangle(**kwargs)
    ours = MaskMappingNetworkDisentangle(**kwargs)
    params = convert_state_dict(ref_map.state_dict(),
                                ours.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(5)
    z = rng.randn(2, 64).astype(np.float32)
    c = rng.randn(2, 25).astype(np.float32)
    mask = rng.randint(0, 6, size=(2, 1, 16, 16)).astype(np.float32)

    want = ref_map(torch.from_numpy(z), torch.from_numpy(c),
                   batch={"mask": torch.from_numpy(mask)}).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(z), jnp.asarray(c),
                          batch={"mask": jnp.asarray(
                              np.transpose(mask, (0, 2, 3, 1)))}))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_osg_decoder_parity():
    from training.triplane_cond import OSGDecoder_semantic_lateSeparate as RefDec
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate

    opts = {"decoder_lr_mul": 1, "decoder_output_dim": 32, "sigmoid": False,
            "semantic_channels": 6}
    ref_dec = RefDec(32, opts)
    ours = OSGDecoderSemanticLateSeparate(32, opts)
    params = convert_state_dict(ref_dec.state_dict(),
                                ours.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(6)
    feats = rng.randn(2, 3, 50, 32).astype(np.float32)
    dirs = rng.randn(2, 50, 3).astype(np.float32)

    want = ref_dec(torch.from_numpy(feats), torch.from_numpy(dirs))
    got = ours(params, jnp.asarray(feats), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(got["rgb"]), want["rgb"].detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["sigma"]), want["sigma"].detach().numpy(),
                               rtol=1e-4, atol=1e-5)
