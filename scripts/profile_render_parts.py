import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.render.renderer import (ImportanceRenderer,
                                           sample_from_planes)
from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate

B, R, S2 = 4, 128 * 128, 96
M = R * S2
rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 256, 256, 32).astype(np.float32) * 0.1)
coords = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, M, 3)).astype(np.float32))

dec = OSGDecoderSemanticLateSeparate(
    32, {"decoder_lr_mul": 1, "decoder_output_dim": 32, "sigmoid": False,
         "semantic_channels": 6})
dp = dec.init(jax.random.PRNGKey(0))


def timeit(name, fn, *args, n=3):
    v = float(fn(*args))  # compile + force
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1000:9.1f} ms  (v={v:.2f})", flush=True)


@jax.jit
def fetch_overhead(planes):
    return jnp.sum(planes[0, 0, 0, 0])
timeit("fetch overhead (tiny)", fetch_overhead, planes)


def sample_chunked(planes, coords, chunk):
    n = coords.shape[0]
    m = coords.shape[1]
    n_chunks = m // chunk
    cr = coords.reshape(n, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    out = jax.lax.map(
        lambda c: jnp.sum(sample_from_planes(planes, c, 1.0)), cr)
    return jnp.sum(out)


for chunk in (65536, 262144):
    timeit(f"plane sample chunk={chunk}",
           jax.jit(lambda p, c, ck=chunk: sample_chunked(p, c, ck)),
           planes, coords)

pb = planes.astype(jnp.bfloat16)
timeit("plane sample bf16 chunk=65536",
       jax.jit(lambda p, c: sample_chunked(p, c, 65536)), pb, coords)

feats = jnp.asarray(rng.randn(B, 3, M, 32).astype(np.float32))


@jax.jit
def decoder_only(feats):
    out = dec(dp, feats, None)
    return jnp.sum(out["rgb"]) + jnp.sum(out["sigma"])
timeit("decoder (mean + 2 MLPs)", decoder_only, feats)

# importance machinery
depths = jnp.asarray(np.sort(rng.rand(B, R, 48, 1), axis=2).astype(np.float32) + 2)
colors = jnp.asarray(rng.randn(B, R, 48, 64).astype(np.float32))
dens = jnp.asarray(rng.randn(B, R, 48, 1).astype(np.float32))
weights = jnp.abs(jnp.asarray(rng.randn(B, R, 47, 1).astype(np.float32)))


@jax.jit
def imp_only(z, w):
    return jnp.sum(ImportanceRenderer.sample_importance(
        jax.random.PRNGKey(0), z, w, 48))
timeit("sample_importance (pdf)", imp_only, depths, weights)

d2, c2, s2 = depths + 0.01, colors * 0.5, dens * 0.5


@jax.jit
def unify_only(a, b, c, d, e, f):
    z, col, dn = ImportanceRenderer.unify_samples(a, b, c, d, e, f)
    return jnp.sum(z) + jnp.sum(col) + jnp.sum(dn)
timeit("unify (argsort + 3 gathers)", unify_only, depths, colors, dens, d2, c2, s2)

from pix2pix3d_tpu.render.ray_marcher import march_rays
opts = {"clamp_mode": "softplus"}
dep96 = jnp.asarray(np.sort(rng.rand(B, R, S2, 1), axis=2).astype(np.float32) + 2)
col96 = jnp.asarray(rng.randn(B, R, S2, 64).astype(np.float32))
den96 = jnp.asarray(rng.randn(B, R, S2, 1).astype(np.float32))


@jax.jit
def march_only(c, d, z):
    rgb, dep, w = march_rays(c, d, z, opts)
    return jnp.sum(rgb) + jnp.sum(dep) + jnp.sum(w)
timeit("march 96spp", march_only, col96, den96, dep96)
