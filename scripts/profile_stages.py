import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from pix2pix3d_tpu import config as cfg_mod
from pix2pix3d_tpu.models import build_generator
from pix2pix3d_tpu.models.triplane import _reshape_planes
from pix2pix3d_tpu.render.camera import LookAtPoseSampler, fov_to_intrinsics, pose_to_conditioning

cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4)
G = build_generator(**cfg)
params = G.init(jax.random.PRNGKey(0))
B = 8
rng = np.random.RandomState(0)
z = jnp.asarray(rng.randn(B, G.z_dim).astype(np.float32))
mask = jnp.asarray(rng.randint(0,6,size=(B,512,512,1)).astype(np.float32))
c2w = LookAtPoseSampler.sample(None, np.pi/2, np.pi/2, [0,0,-0.06], radius=2.7, batch_size=B)
pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
batch = {"mask": mask, "pose": pose}

def timeit(name, fn, *args, n=5):
    t0 = time.perf_counter()
    out = fn(*args); jax.block_until_ready(out)
    print(f"{name:28s} compile+1st {time.perf_counter()-t0:6.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f"{name:28s} {dt*1000:9.1f} ms/batch  ({dt/B*1000:6.1f} ms/img)", flush=True)
    return out

mapping = jax.jit(lambda p, z, c: G.mapping(p, z, c, batch))
ws = timeit("mapping(+encoder)", mapping, params, z, pose)

backbone = jax.jit(lambda p, ws: G.backbone.synthesis(p["backbone"]["synthesis"], ws, noise_mode="const"))
planes_img = timeit("backbone 256^2", backbone, params, ws)
planes = _reshape_planes(planes_img)

def render(p, planes, c):
    feats, depths, w, _, _ = G._render_planes(p, planes, c, 128, rng=None, det=True)
    return feats
feats = timeit("renderer 128^2 x 96", jax.jit(render), params, planes, pose)

def sr(p, feats):
    fi = feats.reshape(B, 128, 128, 64)
    rgbf = fi[..., :32]; semf = fi[..., 32:]
    a = G.superresolution(p["superresolution"], rgbf[..., :3], rgbf, ws, noise_mode="none")
    b = G.superresolution_semantic(p["superresolution_semantic"], semf[..., :6], semf, ws, noise_mode="none")
    return a, b
timeit("dual SR 128->512", jax.jit(sr), params, feats)
