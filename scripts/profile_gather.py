import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

B3, H, W, C = 12, 256, 256, 32
M = 786432  # 128^2 * 48

rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B3, H, W, C).astype(np.float32))
iy = jnp.asarray(rng.randint(0, H, size=(B3, M)).astype(np.int32))
ix = jnp.asarray(rng.randint(0, W, size=(B3, M)).astype(np.int32))
# coherent variant: ray-ordered indices (sorted-ish)
iy_c = jnp.sort(iy, axis=1)


def timeit(name, fn, *args, n=3):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:9.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}", flush=True)


@jax.jit
def take_along(planes, iy, ix):
    flat = planes.reshape(B3, H * W, C)
    idx = iy * W + ix
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


@jax.jit
def flat_take(planes, iy, ix):
    flat = planes.reshape(B3 * H * W, C)
    base = (jnp.arange(B3, dtype=jnp.int32) * (H * W))[:, None]
    idx = (base + iy * W + ix).reshape(-1)
    return jnp.take(flat, idx, axis=0).reshape(B3, M, C)


@jax.jit
def vmap_take(planes, iy, ix):
    def one(p, y, x):
        return jnp.take(p.reshape(H * W, C), y * W + x, axis=0)
    return jax.vmap(one)(planes, iy, ix)


@jax.jit
def full_bilinear4(planes, iy, ix):
    # 4 gathers like the real grid_sample
    flat = planes.reshape(B3, H * W, C)
    out = 0.
    for dy in (0, 1):
        for dx in (0, 1):
            idx = jnp.clip(iy + dy, 0, H - 1) * W + jnp.clip(ix + dx, 0, W - 1)
            out = out + jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out


timeit("take_along_axis (1 gather)", take_along, planes, iy, ix)
timeit("flat global take (1 gather)", flat_take, planes, iy, ix)
timeit("vmap take (1 gather)", vmap_take, planes, iy, ix)
timeit("take_along coherent idx", take_along, planes, iy_c, ix)
timeit("4-corner bilinear gathers", full_bilinear4, planes, iy, ix)

pb = planes.astype(jnp.bfloat16)
timeit("take_along bf16", take_along, pb, iy, ix)
