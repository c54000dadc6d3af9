import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.render.renderer import (
    ImportanceRenderer, sample_from_planes, sample_pdf, _smooth_weights)
from pix2pix3d_tpu.render.ray_marcher import march_rays
from pix2pix3d_tpu.ops.grid_sample import grid_sample_2d

B, R, S = 8, 128 * 128, 48
C = 32

rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 256, 256, C).astype(np.float32))
coords = jnp.asarray(rng.uniform(-1, 1, size=(B, R * S, 3)).astype(np.float32))
depths = jnp.asarray(np.sort(rng.rand(B, R, S, 1), axis=2).astype(np.float32) + 2)
colors = jnp.asarray(rng.randn(B, R, S, 64).astype(np.float32))
dens = jnp.asarray(rng.randn(B, R, S, 1).astype(np.float32))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1000:9.1f} ms", flush=True)
    return out


# 1. plane sampling (the gather)
timeit("sample_from_planes", jax.jit(lambda p, c: sample_from_planes(p, c, 1.0)),
       planes, coords)

# 2. raw grid_sample on flattened planes
flat = planes.reshape(B * 3, 256, 256, C)
pcoords = jnp.asarray(rng.uniform(-1, 1, size=(B * 3, R * S, 2)).astype(np.float32))
timeit("grid_sample_2d", jax.jit(grid_sample_2d), flat, pcoords)

# 3. decoder MLP cost (2x [B, M, 32] -> 64 -> 33)
w1 = jnp.asarray(rng.randn(32, 64).astype(np.float32))
w2 = jnp.asarray(rng.randn(64, 33).astype(np.float32))
feats = jnp.asarray(rng.randn(B, R * S, 32).astype(np.float32))


def mlp(x):
    h = jax.nn.softplus(x @ w1)
    return h @ w2


timeit("decoder MLP x2", jax.jit(lambda x: (mlp(x), mlp(x))), feats)

# 4. march
opts = {"clamp_mode": "softplus"}
timeit("march_rays", jax.jit(lambda c, d, z: march_rays(c, d, z, opts)),
       colors, dens, depths)

# 5. importance sampling (smooth + searchsorted)
weights = jnp.abs(jnp.asarray(rng.randn(B, R, S - 1, 1).astype(np.float32)))
timeit("sample_importance",
       jax.jit(lambda z, w: ImportanceRenderer.sample_importance(
           jax.random.PRNGKey(0), z, w, 48)), depths, weights)

# 6. unify/sort
d2 = jnp.asarray(np.sort(rng.rand(B, R, S, 1), axis=2).astype(np.float32) + 2)
c2 = jnp.asarray(rng.randn(B, R, S, 64).astype(np.float32))
s2 = jnp.asarray(rng.randn(B, R, S, 1).astype(np.float32))
timeit("unify_samples (sort+gather)",
       jax.jit(ImportanceRenderer.unify_samples),
       depths, colors, dens, d2, c2, s2)
