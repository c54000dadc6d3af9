"""Stage costs of the frustum serving pipeline (bench.py configuration).

Times mapping / backbone / texture-shear prep / slab+decode+composite /
dual SR separately at the headline config (batch 16, nrr 128, 96 slabs,
bf16 compute) so NOTES_PERF can rank the remaining headroom.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu import config as cfg_mod
from pix2pix3d_tpu.models import build_generator
from pix2pix3d_tpu.models.triplane import _reshape_planes, _parse_pose
from pix2pix3d_tpu.ops.precision import fast_f32
from pix2pix3d_tpu.render import frustum as fr
from pix2pix3d_tpu.render.camera import (LookAtPoseSampler, fov_to_intrinsics,
                                         pose_to_conditioning)

fast_f32(True)

B = int(os.environ.get("B", 16))
NRR = 128
T = 96
CHUNK = 16

cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4)
G = build_generator(**cfg)
G.rendering_kwargs["sampler"] = "frustum"
G.rendering_kwargs["frustum_depth_steps"] = T
G.rendering_kwargs["frustum_chunk"] = CHUNK
params = G.init(jax.random.PRNGKey(0))

rng = np.random.RandomState(0)
z = jnp.asarray(rng.randn(B, G.z_dim).astype(np.float32))
mask = jnp.asarray(rng.randint(0, 6, size=(B, 512, 512, 1)).astype(np.float32))
c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                               radius=2.7, batch_size=B)
pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
batch = {"mask": mask, "pose": pose}
cam2world, intrinsics = _parse_pose(pose)
opts = G.rendering_kwargs
bf16 = jnp.bfloat16


def timeit(name, fn, *args, n=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} compile+1st {time.perf_counter()-t0:7.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1000:9.1f} ms/batch  ({dt/B*1000:6.2f} ms/img)",
          flush=True)
    return out


mapping = jax.jit(lambda p, z, c: G.mapping(p, z, c, batch))
ws = timeit("mapping(+encoder)", mapping, params, z, pose)

backbone = jax.jit(lambda p, ws: G.backbone.synthesis(
    p["backbone"]["synthesis"], ws, noise_mode="const"))
planes_img = timeit("backbone 256^2", backbone, params, ws)
planes = _reshape_planes(planes_img)


@jax.jit
def prep_fn(planes):
    coeffs = fr.frustum_coeffs(cam2world, intrinsics, NRR, planes.shape[2],
                               opts["box_warp"])
    return fr.prepare_textures(planes, coeffs, bf16)


prep = timeit("texture shears (prep)", prep_fn, planes)


@jax.jit
def render_fn(params, planes):
    decoder = lambda f, d: G.decoder(params["decoder"], f, d)
    return fr.frustum_render(planes, decoder, cam2world, intrinsics, opts,
                             NRR, depth_steps=T, chunk=CHUNK,
                             compute_dtype=bf16)[0]


feats = timeit("frustum render (all)", render_fn, params, planes)


@jax.jit
def slab_only(prep):
    tv = jnp.broadcast_to(jnp.linspace(0.8, 1.2, CHUNK)[None], (B, CHUNK))
    return fr.sample_slabs_prepared(prep, tv, NRR, bf16)


timeit(f"slab resample x1 chunk({CHUNK})", slab_only, prep)


def sr(p, feats):
    fi = feats.reshape(B, NRR, NRR, 64)
    rgbf = fi[..., :32]
    semf = fi[..., 32:]
    a = G.superresolution(p["superresolution"], rgbf[..., :3], rgbf, ws,
                          noise_mode="none")
    b = G.superresolution_semantic(p["superresolution_semantic"],
                                   semf[..., :6], semf, ws, noise_mode="none")
    return a, b


timeit("dual SR 128->512", jax.jit(sr), params, feats)
