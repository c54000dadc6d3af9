"""Per-phase on-device timing of the 6-phase training step (v5e).

Round-3 item 1: where do the 46 s/batch-8 go?  Each phase is jitted as its
OWN grad program (same math as parallel/trainer.py composes into one) and
timed with a trailing value fetch (block_until_ready alone can return
early over the axon tunnel).  Selectable sampler to A/B the gather parity
renderer vs the frustum training mode.

Usage:
    python scripts/profile_train_phases.py [gather|frustum] [batch] [res]

Run ONE instance at a time (single TPU; killed clients wedge the chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    sampler = sys.argv[1] if len(sys.argv) > 1 else "gather"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    nrr = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.nn.discriminator import DualDiscriminator
    from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    # mirror the round-2 sanity-run config (.runs/00016 training_options)
    cfg = cfg_mod.generator_config(cfg="afhq", resolution=res,
                                   data_type="seg", semantic_channels=6,
                                   sr_num_fp16_res=4, render_mask=True,
                                   gen_pose_cond=True)
    cfg["rendering_kwargs"]["point_chunk"] = 16384
    cfg["mapping_kwargs"]["in_resolution"] = res
    if sampler == "frustum":
        cfg["rendering_kwargs"]["sampler"] = "frustum"
        cfg["rendering_kwargs"]["frustum_depth_steps"] = 96
        cfg["rendering_kwargs"]["frustum_chunk"] = 8
    G = build_generator(**cfg)
    D = DualDiscriminator(c_dim=25, img_resolution=res, img_channels=3,
                          num_fp16_res=4, conv_clamp=256,
                          epilogue_kwargs={"mbstd_group_size": 4})
    D_sem = DualDiscriminator(c_dim=25, img_resolution=res,
                              img_channels=3 + 6, num_fp16_res=4,
                              conv_clamp=256,
                              epilogue_kwargs={"mbstd_group_size": 4})
    loss = Pix2Pix3DLoss(G, D, D_semantic=D_sem, lpips=None, r1_gamma=5.0,
                         random_c_prob=0.5, lambda_l1=1.0, lambda_lpips=0.0,
                         lambda_D_semantic=0.1, only_raw_recons=True,
                         lambda_cross_view=0.0, remat=True,
                         neural_rendering_resolution_initial=nrr)
    pg = G.init(jax.random.PRNGKey(0))
    pd = D.init(jax.random.PRNGKey(1))
    pds = D_sem.init(jax.random.PRNGKey(2))

    rng = np.random.RandomState(0)
    b = batch
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=b)
    pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
    batch_d = {"image": jnp.asarray(rng.rand(b, res, res, 3)
                                    .astype(np.float32) * 2 - 1),
               "mask": jnp.asarray(rng.randint(0, 6, (b, res, res, 1))
                                   .astype(np.float32)),
               "pose": pose}
    z = jnp.asarray(rng.randn(b, 512).astype(np.float32))
    blur = 0.0

    def g_main(p):
        l, _ = loss.g_main(p, pd, pds, batch_d, z, pose,
                           jax.random.PRNGKey(3), blur, nrr)
        return l

    def g_fwd(p):
        out, _ = loss.run_G(p, z, batch_d, pose, nrr, jax.random.PRNGKey(4))
        return jnp.sum(out["image"]) + jnp.sum(out["image_raw"])

    def g_reg(p):
        l, _ = loss.g_reg(p, batch_d, z, jax.random.PRNGKey(5))
        return l

    def d_main(p):
        l, _ = loss.d_main(p, pg, batch_d, z, pose, jax.random.PRNGKey(6),
                           blur, nrr)
        return l

    def d_r1(p):
        l, _ = loss.d_r1(p, batch_d, jax.random.PRNGKey(7), blur, nrr)
        return l

    def ds_main(p):
        l, _ = loss.d_semantic_main(p, pg, batch_d, z, pose,
                                    jax.random.PRNGKey(8), blur, nrr)
        return l

    def ds_r1(p):
        l, _ = loss.d_semantic_r1(p, batch_d, jax.random.PRNGKey(9), blur, nrr)
        return l

    cases = [
        ("g_fwd_only", jax.jit(g_fwd), pg),
        ("g_fwd_grad", jax.jit(jax.grad(g_fwd)), pg),
        ("g_main_grad", jax.jit(jax.grad(g_main)), pg),
        ("g_reg_grad", jax.jit(jax.grad(g_reg)), pg),
        ("d_main_grad", jax.jit(jax.grad(d_main)), pd),
        ("d_r1_grad", jax.jit(jax.grad(d_r1)), pd),
        ("ds_main_grad", jax.jit(jax.grad(ds_main)), pds),
        ("ds_r1_grad", jax.jit(jax.grad(ds_r1)), pds),
    ]

    print(f"sampler={sampler} batch={b} res={res} nrr={nrr}")
    total = 0.0
    for name, fn, p in cases:
        t0 = time.perf_counter()
        out = fn(p)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        compile_s = time.perf_counter() - t0

        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(p)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        total += dt
        print(f"  {name:<14s} {dt * 1e3:9.1f} ms   (first call {compile_s:.0f}s)",
              flush=True)
    print(f"  sum of grad phases ~ {total:.2f}s (excl. optimizer/EMA/stats)")


if __name__ == "__main__":
    main()
