"""Split cross-view prep (loss.cross_view_prep + g_main(cv_aux=...)) must
equal the monolithic g_main cross-view path bit-for-bit: same renders, same
rng derivation, just a different program boundary (the v5e workaround —
see README "Known environment issue")."""

import numpy as np
import jax
import jax.numpy as jnp


def _tiny():
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.nn.discriminator import DualDiscriminator
    from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss

    res = 128
    cfg = cfg_mod.generator_config(cfg="afhq", resolution=res,
                                   data_type="seg", semantic_channels=6,
                                   cbase=512, cmax=16, sr_num_fp16_res=0,
                                   render_mask=True, gen_pose_cond=True)
    cfg["rendering_kwargs"].update(depth_resolution=4,
                                   depth_resolution_importance=4)
    cfg["mapping_kwargs"]["in_resolution"] = res
    cfg["mapping_kwargs"]["encoder_channel_base"] = 1 / 128
    G = build_generator(**cfg)
    D = DualDiscriminator(c_dim=25, img_resolution=res, img_channels=3,
                          channel_base=512, channel_max=16, num_fp16_res=0,
                          epilogue_kwargs={"mbstd_group_size": 2})
    loss = Pix2Pix3DLoss(G, D, D_semantic=None, lpips=None, r1_gamma=5.0,
                         random_c_prob=0.5, lambda_l1=1.0, lambda_lpips=0.0,
                         only_raw_recons=True, lambda_cross_view=1e-2,
                         neural_rendering_resolution_initial=16)
    return G, D, loss, res


def test_split_cross_view_matches_monolithic():
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)
    G, D, loss, res = _tiny()
    pg = G.init(jax.random.PRNGKey(0))
    pd = D.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    b = 2
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2,
                                   [0, 0, -0.06], radius=2.7, batch_size=b)
    pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
    batch = {"image": jnp.asarray(
                 rng.rand(b, res, res, 3).astype(np.float32) * 2 - 1),
             "mask": jnp.asarray(
                 rng.randint(0, 6, (b, res, res, 1)).astype(np.float32)),
             "pose": pose}
    z = jnp.asarray(rng.randn(b, 512).astype(np.float32))
    key = jax.random.PRNGKey(7)

    l_mono, s_mono = loss.g_main(pg, pd, None, batch, z, pose, key, 0.0, 16)
    cv_aux = loss.cross_view_prep(pg, z, batch, pose, key, 16)
    l_split, s_split = loss.g_main(pg, pd, None, batch, z, pose, key, 0.0,
                                   16, cv_aux=cv_aux)

    np.testing.assert_allclose(np.asarray(l_split), np.asarray(l_mono),
                               rtol=0, atol=0)
    for k in s_mono:
        np.testing.assert_allclose(np.asarray(s_split[k]),
                                   np.asarray(s_mono[k]), rtol=0, atol=0,
                                   err_msg=k)
    # the prep really is stop-grad: cv_aux carries no tangents
    g = jax.grad(lambda p: loss.g_main(p, pd, None, batch, z, pose, key,
                                       0.0, 16,
                                       cv_aux=cv_aux)[0])(pg)
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert np.isfinite(np.asarray(leaf)).all()
