"""Released-checkpoint reproduction (north-star parity artifact).

The reference's reproducible output is seg2cat seed 1 / input id 1666 ->
`assets/seg2cat_1666_1_color.png` (ref README.md:69-76).  The released
`.pkl` checkpoints are not vendored in this environment (no egress), so
this test SKIPS unless a checkpoint is provided via
`PIX2PIX3D_SEG2CAT_PKL` or found under `checkpoints/`.  When present it
drives the full load -> convert -> render -> pixel-diff chain.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import PIL.Image


def _find_pkl():
    p = os.environ.get("PIX2PIX3D_SEG2CAT_PKL")
    if p and os.path.exists(p):
        return p
    for cand in ("checkpoints/pix2pix3d_seg2cat.pkl",
                 "/root/repo/checkpoints/pix2pix3d_seg2cat.pkl"):
        if os.path.exists(cand):
            return cand
    return None


@pytest.mark.skipif(_find_pkl() is None,
                    reason="released seg2cat pkl not available (no egress); "
                           "set PIX2PIX3D_SEG2CAT_PKL to enable")
def test_seg2cat_1666_seed1_reproduction():
    from pix2pix3d_tpu.apps.common import (build_app_generator,
                                           intrinsics_for)
    from pix2pix3d_tpu.apps.generate_samples import generate_sample
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             pose_to_conditioning)

    G, params, app = build_app_generator("seg2cat", checkpoint=_find_pkl())
    mask = np.array(PIL.Image.open(
        "/root/reference/assets/seg2cat_1666_input.png"))
    if mask.ndim == 3:
        mask = mask[..., 0]
    mask = mask[:, :, None]

    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, 0],
                                   radius=2.7, batch_size=1)
    pose = np.asarray(pose_to_conditioning(c2w, intrinsics_for(app)))[0]
    # torch.randn(seed=1) latent, matching the reference app's seeding
    import torch
    g = torch.Generator().manual_seed(1)
    z = jnp.asarray(torch.randn((1, G.z_dim), generator=g).numpy())

    out = generate_sample(G, params, app, mask, pose, z=z)
    got = np.asarray((out["image"][0] + 1) * 127.5)
    got = np.clip(np.rint(got), 0, 255).astype(np.uint8)

    want = np.asarray(PIL.Image.open(
        "/root/reference/assets/seg2cat_1666_1_color.png").convert("RGB"))
    # bit-comparable target: mean abs diff within a few gray levels
    mad = np.abs(got.astype(np.int32) - want.astype(np.int32)).mean()
    assert mad < 4.0, f"released-pkl render diverges: MAD {mad:.2f}"
