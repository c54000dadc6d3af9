"""Fused Pallas lateSeparate decoder vs the reference-path decoder.

Runs the kernel through the Pallas interpreter on CPU (bit-level Mosaic
behavior is exercised separately on the TPU by scripts/profile_decoder.py);
the math must match `OSGDecoderSemanticLateSeparate.__call__(impl="ref")`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.mark.parametrize("sem_sigmoid", [False, True])
def test_fused_decoder_matches_ref(sem_sigmoid):
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate
    from pix2pix3d_tpu.ops.decoder_pallas import (fuse_late_separate_params,
                                                  late_separate_decode)

    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 1.0,
             "sigmoid": sem_sigmoid})
    params = dec.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 300, 32))

    ref = dec(params, feats, None)
    w1, b1, w2, b2 = fuse_late_separate_params(params, 1.0)
    colors, sigma = late_separate_decode(
        feats.reshape(600, 32), w1, b1, w2, b2, rgb_sigmoid=True,
        sem_sigmoid=sem_sigmoid, compute_dtype=jnp.float32, interpret=True)

    np.testing.assert_allclose(np.asarray(colors).reshape(2, 300, 64),
                               np.asarray(ref["rgb"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma).reshape(2, 300, 1),
                               np.asarray(ref["sigma"]), rtol=2e-5, atol=2e-5)


def test_fused_decoder_lr_mul():
    from pix2pix3d_tpu.models.triplane import OSGDecoderSemanticLateSeparate
    from pix2pix3d_tpu.ops.decoder_pallas import (fuse_late_separate_params,
                                                  late_separate_decode)

    dec = OSGDecoderSemanticLateSeparate(
        32, {"decoder_output_dim": 32, "decoder_lr_mul": 0.5,
             "sigmoid": False})
    params = dec.init(jax.random.PRNGKey(2))
    feats = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 128, 32))
    ref = dec(params, feats, None)
    w1, b1, w2, b2 = fuse_late_separate_params(params, 0.5)
    colors, sigma = late_separate_decode(
        feats.reshape(128, 32), w1, b1, w2, b2, rgb_sigmoid=True,
        sem_sigmoid=False, compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(colors).reshape(1, 128, 64),
                               np.asarray(ref["rgb"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma).reshape(1, 128, 1),
                               np.asarray(ref["sigma"]), rtol=2e-5, atol=2e-5)
