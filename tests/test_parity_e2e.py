"""End-to-end parity: full TriPlaneSemanticEntangleGenerator vs the reference.

Randomness is pinned identically on both sides:
- stratified jitter: torch.rand_like patched to zeros == our det=True
- importance inverse-CDF u: torch.rand patched to linspace(0,1) == our det=True
- synthesis noise: noise_mode='const' with converted noise_const buffers
- fused_modconv=False on the reference == our always-unfused formulation
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

from pix2pix3d_tpu.models import build_generator
from pix2pix3d_tpu.utils.convert import convert_state_dict

torch.manual_seed(0)

Z_DIM = 64
W_DIM = 512
RES = 128
SEM = 6
NRR = 32

RENDER_KW = dict(
    image_resolution=RES,
    disparity_space_sampling=False,
    clamp_mode="softplus",
    superresolution_module="training.superresolution.SuperresolutionHybrid2X",
    superresolution_module_semantic="training.superresolution.SuperresolutionHybrid2X_semantic",
    c_gen_conditioning_zero=True,
    c_scale=1.0,
    superresolution_noise_mode="none",
    density_reg=0.25,
    density_reg_p_dist=0.004,
    reg_type="l1",
    decoder_lr_mul=1.0,
    sr_antialias=True,
    depth_resolution=8,
    depth_resolution_importance=8,
    ray_start=2.25,
    ray_end=3.3,
    box_warp=1.0,
)

COMMON = dict(z_dim=Z_DIM, c_dim=25, w_dim=W_DIM, img_resolution=RES,
              img_channels=3, semantic_channels=SEM, sr_num_fp16_res=0,
              channel_base=2048, channel_max=32, num_fp16_res=0, conv_clamp=None)


@pytest.fixture(scope="module")
def pair():
    from training import triplane_cond as ref_tc

    mapping_kwargs = dict(num_layers=2, in_resolution=16, in_channels=SEM)
    sr_kwargs = dict(channel_base=2048, channel_max=32)

    ref_g = ref_tc.TriPlaneSemanticEntangleGenerator(
        mapping_kwargs=dict(
            class_name="training.triplane_cond.MaskMappingNetwork_disentangle",
            **mapping_kwargs),
        rendering_kwargs=dict(RENDER_KW),
        sr_kwargs=dict(sr_kwargs, fused_modconv_default=False),
        fused_modconv_default=False,
        **COMMON)
    ref_g.eval()

    rk = dict(RENDER_KW)
    rk["superresolution_module"] = "SuperresolutionHybrid2X"
    rk["superresolution_module_semantic"] = "SuperresolutionHybrid2X_semantic"
    ours = build_generator(
        class_name="TriPlaneSemanticEntangleGenerator",
        mapping_kwargs=dict(class_name="MaskMappingNetwork_disentangle",
                            **mapping_kwargs),
        rendering_kwargs=rk,
        sr_kwargs=sr_kwargs,
        **COMMON)
    params = convert_state_dict(ref_g.state_dict(),
                                ours.init(jax.random.PRNGKey(0)))
    return ref_g, ours, params


def _inputs(seed=0, batch=2):
    rng = np.random.RandomState(seed)
    z = rng.randn(batch, Z_DIM).astype(np.float32)
    mask = rng.randint(0, SEM, size=(batch, 1, 16, 16)).astype(np.float32)
    # plausible pose: ~LookAt from radius 2.7
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler, fov_to_intrinsics,
                                             pose_to_conditioning)
    c2w = LookAtPoseSampler.sample(None, 0.2 + np.pi / 2, np.pi / 2 - 0.1,
                                   [0, 0, -0.06], radius=2.7, batch_size=batch)
    pose = np.asarray(pose_to_conditioning(c2w, fov_to_intrinsics(18.837)))
    return z, mask, pose


def test_mapping_parity(pair):
    ref_g, ours, params = pair
    z, mask, pose = _inputs()
    want = ref_g.mapping(torch.from_numpy(z), torch.from_numpy(pose),
                         {"mask": torch.from_numpy(mask)}).detach().numpy()
    got = np.asarray(ours.mapping(
        params, jnp.asarray(z), jnp.asarray(pose),
        {"mask": jnp.asarray(np.transpose(mask, (0, 2, 3, 1)))}))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_full_synthesis_parity(pair, monkeypatch):
    ref_g, ours, params = pair
    z, mask, pose = _inputs(seed=1)

    # Pin randomness: no stratified jitter, deterministic importance u.
    monkeypatch.setattr(torch, "rand_like", lambda t: torch.zeros_like(t))
    real_linspace = torch.linspace

    def fake_rand(*shape, **kwargs):
        if len(shape) == 1 and isinstance(shape[0], tuple):
            shape = shape[0]
        n_rays, n_imp = shape
        return real_linspace(0, 1, n_imp).expand(n_rays, n_imp).contiguous()

    monkeypatch.setattr(torch, "rand", fake_rand)

    with torch.no_grad():
        ws_t = ref_g.mapping(torch.from_numpy(z), torch.from_numpy(pose),
                             {"mask": torch.from_numpy(mask)})
        want = ref_g.synthesis(ws_t, torch.from_numpy(pose),
                               neural_rendering_resolution=NRR,
                               noise_mode="const")

    batch = {"mask": jnp.asarray(np.transpose(mask, (0, 2, 3, 1)))}
    ws = ours.mapping(params, jnp.asarray(z), jnp.asarray(pose), batch)
    np.testing.assert_allclose(np.asarray(ws), ws_t.numpy(), rtol=2e-3, atol=2e-3)
    got = ours.synthesis(params, jnp.asarray(ws_t.numpy()), jnp.asarray(pose),
                         neural_rendering_resolution=NRR, noise_mode="const",
                         det=True)

    def chk(name, ref_t, ours_a, atol):
        want_np = np.transpose(ref_t.numpy(), (0, 2, 3, 1))
        got_np = np.asarray(ours_a)
        assert got_np.shape == want_np.shape, (name, got_np.shape, want_np.shape)
        np.testing.assert_allclose(got_np, want_np, rtol=5e-3, atol=atol,
                                   err_msg=name)

    chk("image_raw", want["image_raw"], got["image_raw"], 2e-3)
    chk("semantic_raw", want["semantic_raw"], got["semantic_raw"], 2e-2)
    chk("image_depth", want["image_depth"], got["image_depth"], 2e-3)
    chk("image", want["image"], got["image"], 5e-3)
    chk("semantic", want["semantic"], got["semantic"], 5e-2)
