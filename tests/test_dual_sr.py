"""dual_superresolution (the serving fast path running the rgb + semantic
SR stacks as one vmapped/grouped program) must EQUAL the two separate
module calls — the ToRGB zero-padding trick is exact, not approximate.

Uses the 2X pair (64->128) to keep CPU cost small; semantic_channels is
parametrized 6 (pad rgb's ToRGB up) and 1 (pad the SEMANTIC ToRGB up —
the edge2car-shaped case) to exercise both padding directions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.nn.superresolution import (
    SuperresolutionHybrid2X, SuperresolutionHybrid2XSemantic,
    dual_sr_compatible, dual_superresolution)

B, RES_IN = 2, 64


def _setup(sem_ch, sr_num_fp16_res=0):
    sr_rgb = SuperresolutionHybrid2X(channels=32, img_resolution=128,
                                     sr_num_fp16_res=sr_num_fp16_res,
                                     sr_antialias=True)
    sr_sem = SuperresolutionHybrid2XSemantic(channels=32, img_resolution=128,
                                             sr_num_fp16_res=sr_num_fp16_res,
                                             sr_antialias=True,
                                             semantic_channels=sem_ch)
    p_rgb = sr_rgb.init(jax.random.PRNGKey(0))
    p_sem = sr_sem.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(B, RES_IN, RES_IN, 3).astype(np.float32))
    x_rgb = jnp.asarray(rng.randn(B, RES_IN, RES_IN, 32).astype(np.float32))
    sem = jnp.asarray(rng.randn(B, RES_IN, RES_IN, sem_ch).astype(np.float32))
    x_sem = jnp.asarray(rng.randn(B, RES_IN, RES_IN, 32).astype(np.float32))
    ws = jnp.asarray(rng.randn(B, 14, 512).astype(np.float32))
    return sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws


@pytest.mark.parametrize("sem_ch", [6, 1])
def test_dual_sr_matches_separate(sem_ch):
    sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws = _setup(sem_ch)
    assert dual_sr_compatible(sr_rgb, sr_sem)

    ref_rgb = sr_rgb(p_rgb, rgb, x_rgb, ws, noise_mode="none")
    ref_sem = sr_sem(p_sem, sem, x_sem, ws, noise_mode="none")
    out_rgb, out_sem = dual_superresolution(
        sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws,
        noise_mode="none")

    assert out_rgb.shape == ref_rgb.shape == (B, 128, 128, 3)
    assert out_sem.shape == ref_sem.shape == (B, 128, 128, sem_ch)
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sem), np.asarray(ref_sem),
                               rtol=1e-5, atol=1e-5)


def test_dual_sr_const_noise_and_rng():
    """noise_mode='const' (stored per-layer noise) and noise_mode='random'
    (per-branch rng keys) both route through the stacked tree correctly."""
    sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws = _setup(6)

    ref_rgb = sr_rgb(p_rgb, rgb, x_rgb, ws, noise_mode="const")
    ref_sem = sr_sem(p_sem, sem, x_sem, ws, noise_mode="const")
    out_rgb, out_sem = dual_superresolution(
        sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws,
        noise_mode="const")
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sem), np.asarray(ref_sem),
                               rtol=1e-5, atol=1e-5)

    k2, k3 = jax.random.PRNGKey(2), jax.random.PRNGKey(3)
    ref_rgb = sr_rgb(p_rgb, rgb, x_rgb, ws, noise_mode="random", rng=k2)
    ref_sem = sr_sem(p_sem, sem, x_sem, ws, noise_mode="random", rng=k3)
    out_rgb, out_sem = dual_superresolution(
        sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws,
        noise_mode="random", rngs=(k2, k3))
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sem), np.asarray(ref_sem),
                               rtol=1e-5, atol=1e-5)


def test_dual_sr_bf16_path():
    """sr_num_fp16_res>0 (the serving config): bf16 block compute must
    still agree between fused and separate paths at bf16 tolerance."""
    sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws = _setup(
        6, sr_num_fp16_res=4)
    ref_rgb = sr_rgb(p_rgb, rgb, x_rgb, ws, noise_mode="none")
    ref_sem = sr_sem(p_sem, sem, x_sem, ws, noise_mode="none")
    out_rgb, out_sem = dual_superresolution(
        sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem, ws,
        noise_mode="none")
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(ref_rgb),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_sem), np.asarray(ref_sem),
                               rtol=2e-2, atol=2e-2)
