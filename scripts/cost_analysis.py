"""XLA cost analysis of the serving forward program (roofline check).

Prints the compiler-reported FLOPs and bytes-accessed for bench.py's full
generator program, plus the implied MXU/HBM roofline times on a v5e
(197 TFLOP/s bf16, 819 GB/s HBM) — tells us whether the measured serving
time is compute-bound, bandwidth-bound, or neither (= scheduling/overhead),
without needing profiler support over the axon tunnel.

Usage: python scripts/cost_analysis.py [batch] (env PIX2PIX3D_PROF_GFP16 /
PIX2PIX3D_PROF_DEPTH as in profile_serving_r3.py; PIX2PIX3D_CPU=1 for a
CPU-backend smoke).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PIX2PIX3D_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def main():
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.ops import precision
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    precision.fast_f32(True)
    gfp16 = int(os.environ.get("PIX2PIX3D_PROF_GFP16", "0"))
    depth = int(os.environ.get("PIX2PIX3D_PROF_DEPTH", "96"))
    cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4,
                                          g_num_fp16_res=gfp16)
    if gfp16:
        cfg["mapping_kwargs"]["encoder_num_fp16_res"] = gfp16
    G = build_generator(**cfg)
    G.rendering_kwargs.update(sampler="frustum", frustum_depth_steps=depth,
                              frustum_chunk=8, decoder_impl="pallas")
    params = G.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(B, G.z_dim).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 6, size=(B, 512, 512, 1))
                       .astype(np.float32))
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=B)
    pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))

    def fwd(params, z, mask, pose):
        out = G(params, z, pose, {"mask": mask, "pose": pose},
                neural_rendering_resolution=128, noise_mode="const", det=True)
        return out["image"], out["semantic"]

    compiled = jax.jit(fwd).lower(params, z, mask, pose).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"batch {B}, g_fp16={gfp16}, depth={depth}")
    print(f"flops          {flops:.3e}  ({flops / B:.3e}/img)")
    print(f"bytes accessed {bytes_:.3e}  ({bytes_ / B:.3e}/img)")
    print(f"MXU roofline   {flops / V5E_BF16_FLOPS * 1e3:8.2f} ms/batch "
          f"({flops / B / V5E_BF16_FLOPS * 1e3:6.2f} ms/img)")
    print(f"HBM roofline   {bytes_ / V5E_HBM_BPS * 1e3:8.2f} ms/batch "
          f"({bytes_ / B / V5E_HBM_BPS * 1e3:6.2f} ms/img)")
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                print(f"{k:28s} {v / 1e9:8.3f} GB")


if __name__ == "__main__":
    main()
