"""Round-3 per-stage profile of the SERVING pipeline at bench.py's config.

Stages (each its own jitted program, fed by the previous stage's output):
  mapping      conditional mapping net (mask encoder + FC stack)
  backbone     256^2 StyleGAN2 synthesis -> 3x32 tri-planes
  shear_prep   frustum texture shears (once per image, shared by slabs)
  render       full frustum_render (incl. shear prep — subtract to get the
               slab+fused-decode/composite residue)
  sr_rgb/sem   dual 128->512 super-resolution
  full         the whole generator in ONE program (what bench.py times);
               the gap vs the stage sum is XLA's cross-stage overlap

Usage: python scripts/profile_serving_r3.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PIX2PIX3D_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def timeit(name, fn, *args, n=6, batch=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # final value fetch: block_until_ready over the tunnel can read early
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    extra = f"  ({dt / batch * 1000:6.2f} ms/img)" if batch else ""
    print(f"{name:24s} {dt * 1000:9.2f} ms/batch{extra}", flush=True)
    return out, dt


def main():
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.models.triplane import _reshape_planes
    from pix2pix3d_tpu.ops import precision
    from pix2pix3d_tpu.render import frustum
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    smoke = bool(os.environ.get("PIX2PIX3D_SMOKE"))
    if smoke:
        B = 1
    precision.fast_f32(True)

    # Match bench.py's experiment knobs so the stage budget can be profiled
    # at the candidate serving default (PIX2PIX3D_PROF_GFP16=7
    # PIX2PIX3D_PROF_DEPTH=64 mirrors `bench.py --g-fp16 7 --depth 64`).
    gfp16 = int(os.environ.get("PIX2PIX3D_PROF_GFP16", "0"))
    depth = int(os.environ.get("PIX2PIX3D_PROF_DEPTH", "96"))
    cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4,
                                          g_num_fp16_res=gfp16)
    if gfp16:
        cfg["mapping_kwargs"]["encoder_num_fp16_res"] = gfp16
    G = build_generator(**cfg)
    G.rendering_kwargs.update(sampler="frustum", frustum_depth_steps=depth,
                              frustum_chunk=8, decoder_impl="pallas")
    if os.environ.get("PIX2PIX3D_PROF_CHUNK_GRID"):
        # chunk-blocked fused-kernel grid (bench.py --chunk-grid)
        G.rendering_kwargs["fused_chunk_grid"] = True
    params = G.init(jax.random.PRNGKey(0))
    nrr = 64 if smoke else 128

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B, G.z_dim).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 6, size=(B, 512, 512, 1))
                       .astype(np.float32))
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=B)
    intr = fov_to_intrinsics(18.837)
    pose = pose_to_conditioning(c2w, intr)
    batch = {"mask": mask, "pose": pose}
    c2w_j = jnp.asarray(np.tile(np.asarray(c2w), (1, 1, 1)))
    intr_j = jnp.asarray(np.tile(np.asarray(intr)[None], (B, 1, 1)))

    print(f"== serving profile, batch {B}, frustum+pallas+bf16, "
          f"g_fp16={gfp16}, depth={depth} ==", flush=True)

    mapping = jax.jit(lambda p, z, c: G.mapping(p, z, c, batch))
    ws, t_map = timeit("mapping(+encoder)", mapping, params, z, pose, batch=B)

    backbone = jax.jit(lambda p, ws: G.backbone.synthesis(
        p["backbone"]["synthesis"], ws, noise_mode="const"))
    planes_img, t_bb = timeit("backbone 256^2", backbone, params, ws, batch=B)
    planes = _reshape_planes(planes_img)

    def prep(planes):
        coeffs = frustum.frustum_coeffs(c2w_j, intr_j, nrr, planes.shape[2],
                                        G.rendering_kwargs["box_warp"])
        return frustum.prepare_textures(planes, coeffs, jnp.bfloat16)

    _, t_prep = timeit("shear_prep x3 planes", jax.jit(prep), planes, batch=B)

    def render(p, planes, c):
        feats, depths, w, _, _ = G._render_planes(p, planes, c, nrr,
                                                  rng=None, det=True)
        return feats, depths, w

    (feats, _, _), t_rend = timeit("render (frustum total)", jax.jit(render),
                                   params, planes, pose, batch=B)

    # mirror TriPlaneSemanticEntangleGenerator.synthesis exactly
    feat_img = feats.reshape(B, nrr, nrr, -1)
    noise_mode = G.rendering_kwargs["superresolution_noise_mode"]

    def sr_rgb(p, feat_img, ws):
        rgb_feat = feat_img[..., :32]
        return G.superresolution(p["superresolution"], rgb_feat[..., :3],
                                 rgb_feat, ws, noise_mode=noise_mode)

    _, t_sr = timeit("SR rgb 128->512", jax.jit(sr_rgb), params, feat_img,
                     ws, batch=B)

    def sr_sem(p, feat_img, ws):
        sem_feat = feat_img[..., 32:]
        return G.superresolution_semantic(
            p["superresolution_semantic"], sem_feat[..., :G.semantic_channels],
            sem_feat, ws, noise_mode=noise_mode)

    _, t_srs = timeit("SR semantic", jax.jit(sr_sem), params, feat_img,
                      ws, batch=B)

    fwd = jax.jit(lambda p, z, mask, pose: G(
        p, z, pose, {"mask": mask, "pose": pose},
        neural_rendering_resolution=nrr, noise_mode="const", det=True)
        ["image"])
    _, t_full = timeit("FULL generator", fwd, params, z, mask, pose, batch=B)

    parts = t_map + t_bb + t_rend + t_sr + t_srs
    print(f"\nstage sum {parts*1000:.1f} ms vs full {t_full*1000:.1f} ms "
          f"(render residue after shear prep: {(t_rend-t_prep)*1000:.1f} ms)",
          flush=True)
    print(f"throughput (full): {B / t_full:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
