"""Validate + time the fused Pallas lateSeparate decoder on the real TPU.

Compares `ops/decoder_pallas.late_separate_decode` against the reference-path
decoder (`OSGDecoderSemanticLateSeparate.__call__(impl="ref")`) at the
serving working set (batch 8, 128^2 rays, 96 slabs -> 12.6M points), then
times both.  Run on the TPU (JAX_PLATFORMS=axon, the default).
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
    from pix2pix3d_tpu.ops.decoder_pallas import (fuse_late_separate_params,
                                                  late_separate_decode)

    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 1.0,
             "sigmoid": False})
    params = dec.init(jax.random.PRNGKey(0))

    # correctness at a modest size first (f32 compute -> tight tolerance)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4096, 32))
    ref = dec(params, feats, None)
    w1, b1, w2, b2 = fuse_late_separate_params(params, 1.0)
    x = jnp.mean(feats, axis=1).reshape(-1, 32)
    colors, sigma = late_separate_decode(x, w1, b1, w2, b2, rgb_sigmoid=True,
                                         sem_sigmoid=False,
                                         compute_dtype=jnp.float32)
    err_c = np.max(np.abs(np.asarray(colors).reshape(2, 4096, 64)
                          - np.asarray(ref["rgb"])))
    err_s = np.max(np.abs(np.asarray(sigma).reshape(2, 4096, 1)
                          - np.asarray(ref["sigma"])))
    print(f"f32 max err: colors {err_c:.3e}  sigma {err_s:.3e}")
    assert err_c < 1e-4 and err_s < 1e-4, "TPU kernel mismatch"

    # bf16 drift report (serving dtype)
    colors16, sigma16 = late_separate_decode(x, w1, b1, w2, b2,
                                             rgb_sigmoid=True,
                                             sem_sigmoid=False,
                                             compute_dtype=jnp.bfloat16)
    drift = np.max(np.abs(np.asarray(colors16, np.float32).reshape(2, 4096, 64)
                          - np.asarray(ref["rgb"])))
    print(f"bf16 color drift vs f32 ref: {drift:.3e}")

    # timing at the serving working set (the XLA ref path OOMs above ~3M
    # points — its f32 hiddens/outputs are the HBM problem the kernel
    # removes — so it is timed at 1/8 size and compared by rate)
    m = 8 * 128 * 128 * 96  # 12.58M points
    big = jax.random.normal(jax.random.PRNGKey(2), (m, 32), jnp.bfloat16)
    small = big[:m // 8]

    @jax.jit
    def run_pallas(x):
        return late_separate_decode(x, w1, b1, w2, b2, rgb_sigmoid=True,
                                    sem_sigmoid=False,
                                    compute_dtype=jnp.bfloat16)

    @jax.jit
    def run_xla(x):
        out = dec(params, x[:, None].astype(jnp.float32), None)
        return out["rgb"].astype(jnp.bfloat16), out["sigma"]

    for name, fn, arg in (("pallas", run_pallas, big),
                          ("xla-ref", run_xla, small)):
        n_pts = arg.shape[0]
        out = fn(arg)
        jax.block_until_ready(out)
        n_iter = 20
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn(arg)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:8s} {n_pts} pts: {dt * 1e3:8.2f} ms "
              f"({n_pts / dt / 1e9:.2f} Gpts/s)")


if __name__ == "__main__":
    main()
