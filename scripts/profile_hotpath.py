import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.render import renderer as R
from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate

B, RAYS, S = 8, 128 * 128, 48
M = RAYS * S
rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(B, 3, 256, 256, 32).astype(np.float32) * 0.1)
coords = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, M, 3)).astype(np.float32))
dirs = jnp.zeros_like(coords)
dec = OSGDecoderSemanticLateSeparate(
    32, {"decoder_lr_mul": 1, "decoder_output_dim": 32, "sigmoid": False,
         "semantic_channels": 6})
dp = dec.init(jax.random.PRNGKey(0))
OPTS = dict(box_warp=1.0, clamp_mode="softplus", depth_resolution=S,
            depth_resolution_importance=S, ray_start=2.25, ray_end=3.3)
ir = R.ImportanceRenderer()


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    _ = float(jnp.sum(out)) if hasattr(out, 'dtype') else float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    s = float(jnp.sum(out)) if hasattr(out, 'dtype') else float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt*1000:9.1f} ms/batch8", flush=True)


def chunked(fn, coords, chunk=65536):
    n, m, _ = coords.shape
    n_chunks = m // chunk
    cr = coords.reshape(n, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    return jax.lax.map(fn, cr)


@jax.jit
def gather_sum(planes, coords):
    return jnp.sum(chunked(
        lambda c: jnp.sum(R.sample_from_planes(planes, c, 1.0),
                          axis=(1, 3)), coords))
timeit("patch gather (chunked, sum)", gather_sum, planes, coords)


@jax.jit
def runmodel_sum(planes, coords):
    out = ir.run_model(planes, lambda f, d: dec(dp, f, d), coords, dirs, OPTS)
    return jnp.sum(out["rgb"]) + jnp.sum(out["sigma"])
timeit("run_model (gather+MLP)", runmodel_sum, planes, coords)


# decoder alone on in-VMEMable chunks
feats = jnp.asarray(rng.randn(8, 3, 65536, 32).astype(np.float32))
@jax.jit
def dec_sum(feats):
    out = dec(dp, feats, None)
    return jnp.sum(out["rgb"])
timeit("decoder alone (65k pts x8)", dec_sum, feats, n=10)

# merge machinery at true shapes
d1 = jnp.asarray(np.sort(rng.rand(B, RAYS, S).astype(np.float32), -1) + 2.25)
d2 = jnp.asarray(np.sort(rng.rand(B, RAYS, S).astype(np.float32), -1) + 2.25)
s1 = jnp.asarray(rng.randn(B, RAYS, S).astype(np.float32))
s2 = jnp.asarray(rng.randn(B, RAYS, S).astype(np.float32))
c1 = jnp.asarray(rng.randn(B, RAYS, S, 64).astype(np.float32))
c2 = jnp.asarray(rng.randn(B, RAYS, S, 64).astype(np.float32))


@jax.jit
def merge_sum(d1, d2, s1, s2, c1, c2):
    s_coarse = S
    all_d = jnp.concatenate([d1, d2], -1)
    all_s = jnp.concatenate([s1, s2], -1)
    iota = jnp.broadcast_to(jnp.arange(2 * S, dtype=jnp.int32), all_d.shape)
    ds, ss, perm = jax.lax.sort((all_d, all_s, iota), dimension=-1, num_keys=1)
    _, rank = jax.lax.sort((perm, iota), dimension=-1, num_keys=1)
    w = R.compute_weights_3d(ss, ds, OPTS)
    coeff_m = R.midpoint_coefficients(w)
    coeff = jnp.take_along_axis(coeff_m, rank, axis=-1)
    rgb = (jnp.einsum("nrs,nrsc->nrc", coeff[..., :s_coarse], c1)
           + jnp.einsum("nrs,nrsc->nrc", coeff[..., s_coarse:], c2))
    return jnp.sum(rgb)
timeit("merge+composite", merge_sum, d1, d2, s1, s2, c1, c2)

# importance sampling at true shapes
w = jnp.abs(jnp.asarray(rng.randn(B, RAYS, S - 1).astype(np.float32)))
@jax.jit
def imp_sum(d, w):
    return jnp.sum(R.ImportanceRenderer.sample_importance(
        jax.random.PRNGKey(0), d, w, S))
timeit("sample_importance", imp_sum, d1, w)
