"""Validate + time the fused decode+composite frustum path on the real TPU.

Compares frustum_render with fused_decoder (ops/render_pallas.py) against
the unfused chunked composite at f32 (same math -> tight tolerance), then
times both at the serving configuration (batch 16, nrr 128, T=96, bf16).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate
    from pix2pix3d_tpu.ops.render_pallas import fuse_late_separate_params_t
    from pix2pix3d_tpu.render import frustum
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics)

    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 1.0,
             "sigmoid": False})
    dp = dec.init(jax.random.PRNGKey(0))
    decoder = lambda f, d: dec(dp, f, d)
    fused = (*fuse_late_separate_params_t(dp, 1.0), True, False)

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": 1.0,
            "depth_resolution": 48, "depth_resolution_importance": 48,
            "disparity_space_sampling": False, "clamp_mode": "softplus",
            "white_back": False}

    def planes_for(n, s, key):
        base = jax.random.normal(key, (n, 3, s // 8, s // 8, 32))
        return jax.image.resize(base, (n, 3, s, s, 32), "bicubic")

    # ---- correctness (small, f32)
    n_small = 2
    planes = planes_for(n_small, 64, jax.random.PRNGKey(1))
    c2w = LookAtPoseSampler.sample(None, np.pi / 2 + 0.2, np.pi / 2 - 0.1,
                                   [0, 0, -0.06], radius=2.7,
                                   batch_size=n_small)
    intr = jnp.tile(fov_to_intrinsics(18.837)[None], (n_small, 1, 1))
    ref = jax.jit(lambda: frustum.frustum_render(
        planes, decoder, c2w, intr, opts, 32, depth_steps=48, chunk=8))()
    got = jax.jit(lambda: frustum.frustum_render(
        planes, None, c2w, intr, opts, 32, depth_steps=48, chunk=8,
        fused_decoder=fused))()
    for name, a, b in zip(("feats", "depth", "weights"), ref, got):
        err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        print(f"f32 {name:8s} max err {err:.3e}")
        assert err < 5e-4, name

    # ---- timing at serving size (batch 16, nrr 128, bf16)
    n = 16
    planes = planes_for(n, 256, jax.random.PRNGKey(2)).astype(jnp.bfloat16)
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=n)
    intr = jnp.tile(fov_to_intrinsics(18.837)[None], (n, 1, 1))

    run_fused = jax.jit(lambda p: frustum.frustum_render(
        p, None, c2w, intr, opts, 128, depth_steps=96, chunk=8,
        compute_dtype=jnp.bfloat16, fused_decoder=fused))
    run_plain = jax.jit(lambda p: frustum.frustum_render(
        p, decoder, c2w, intr, opts, 128, depth_steps=96, chunk=8,
        compute_dtype=jnp.bfloat16))

    for name, fn in (("fused", run_fused), ("plain", run_plain)):
        out = fn(planes)
        _ = float(np.asarray(out[0][0, 0, 0], np.float32))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(planes)
        _ = float(np.asarray(out[0][0, 0, 0], np.float32))
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:6s} render stage: {dt * 1e3:7.1f} ms/batch16 "
              f"({n / dt:.1f} img/s)")


if __name__ == "__main__":
    main()
