import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.render.renderer import ImportanceRenderer
from pix2pix3d_tpu.render.ray_sampler import sample_rays
from pix2pix3d_tpu.render.camera import (LookAtPoseSampler, fov_to_intrinsics,
                                         pose_to_conditioning)
from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate

B = 4
NRR = 128
rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 256, 256, 32).astype(np.float32) * 0.1)
c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                               radius=2.7, batch_size=B)
pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
ro, rd = sample_rays(pose[:, :16].reshape(-1, 4, 4),
                     pose[:, 16:25].reshape(-1, 3, 3), NRR)

dec = OSGDecoderSemanticLateSeparate(
    32, {"decoder_lr_mul": 1, "decoder_output_dim": 32, "sigmoid": False,
         "semantic_channels": 6})
dp = dec.init(jax.random.PRNGKey(0))
renderer = ImportanceRenderer()


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:9.1f} ms/batch", flush=True)
    return out


def run(opts_extra, name):
    opts = dict(depth_resolution=48, depth_resolution_importance=48,
                ray_start=2.25, ray_end=3.3, box_warp=1.0,
                clamp_mode="softplus", disparity_space_sampling=False)
    opts.update(opts_extra)

    @jax.jit
    def f(planes, ro, rd):
        return renderer(planes, lambda ft, d: dec(dp, ft, d), ro, rd, opts,
                        rng=None, det=True)[0]
    timeit(name, f, planes, ro, rd)


run({}, "full renderer 48+48")
run({"depth_resolution_importance": 0}, "coarse only (no sort/pdf)")
run({"depth_resolution": 96, "depth_resolution_importance": 0},
    "coarse96 only (same pts)")

# run_model alone at full point count (2 passes equivalent)
coords = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, NRR * NRR * 96, 3)).astype(np.float32))
dirs = jnp.zeros_like(coords)
opts = dict(box_warp=1.0)


@jax.jit
def rm(planes, coords, dirs):
    return renderer.run_model(planes, lambda ft, d: dec(dp, ft, d), coords,
                              dirs, opts)["rgb"]
timeit("run_model 96spp points", rm, planes, coords, dirs)
