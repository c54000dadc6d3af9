"""Fine-grained A/B of the frustum render stages (TPU)."""
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
B, NRR, T, CHUNK = 16, 128, 96, 8
WIN = (256, 384)

cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4)
G = build_generator(**cfg)
params = G.init(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                               radius=2.7, batch_size=B)
pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
cam2world, intrinsics = _parse_pose(pose)
opts = G.rendering_kwargs
planes = _reshape_planes(jnp.asarray(
    rng.randn(B, 256, 256, 96).astype(np.float32)))
bf16 = jnp.bfloat16


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.1f} ms/batch",
          flush=True)
    return out


@jax.jit
def prep_fn(planes):
    coeffs = fr.frustum_coeffs(cam2world, intrinsics, NRR, planes.shape[2],
                               opts["box_warp"])
    return fr.prepare_textures(planes, coeffs, bf16)


prep = timeit("prep (shears)", prep_fn, planes)


@jax.jit
def slabs_only(prep_arrays):
    prep = dict(prep_arrays, n=B, q=3)
    t_lo = jnp.full((B,), 2.23)
    t_hi = jnp.full((B,), 3.29)
    steps = jnp.linspace(0.0, 1.0, T)
    t_vals = t_lo[:, None] + steps[None, :] * (t_hi - t_lo)[:, None]
    acc = jnp.zeros((B, NRR, NRR, 32), jnp.float32)

    def body(acc, tc):
        f = fr.sample_slabs_prepared(prep, tc, NRR, bf16, win=WIN)
        return acc + f.sum(1), None

    tv = t_vals.reshape(B, T // CHUNK, CHUNK).transpose(1, 0, 2)
    acc, _ = jax.lax.scan(body, acc, tv)
    return acc


prep_arrays = {k: v for k, v in prep.items() if k not in ("n", "q")}
timeit("slabs only (12 chunks, no dec)", slabs_only, prep_arrays)


@jax.jit
def render_fn(params, planes):
    decoder = lambda f, d: G.decoder(params["decoder"], f, d)
    return fr.frustum_render(planes, decoder, cam2world, intrinsics, opts,
                             NRR, depth_steps=T, chunk=CHUNK, window=WIN,
                             compute_dtype=bf16)[0]


timeit("full render (prep+slab+dec+comp)", render_fn, params, planes)
