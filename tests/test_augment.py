"""AugmentPipe behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.train.augment import AugmentPipe, ada_update_p


def _pipe():
    return AugmentPipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                       aniso=1, xfrac=1, brightness=1, contrast=1,
                       lumaflip=1, hue=1, saturation=1)


def test_p_zero_is_near_identity():
    pipe = _pipe()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    y = pipe(jax.random.PRNGKey(0), x, 0.0)
    # p=0 must be (near-)exact identity: sample points land on pixel centers
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_p_one_changes_images():
    pipe = _pipe()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32) * 2 - 1)
    y = pipe(jax.random.PRNGKey(1), x, 1.0)
    assert not np.allclose(np.asarray(x), np.asarray(y), atol=0.05)
    assert np.isfinite(np.asarray(y)).all()


def test_p_is_traceable():
    pipe = _pipe()
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    f = jax.jit(lambda p: pipe(jax.random.PRNGKey(0), x, p))
    y0 = f(0.0)
    y1 = f(0.7)  # no recompile needed for a different p
    assert y0.shape == y1.shape


def test_ada_update_direction():
    p = 0.5
    assert ada_update_p(p, 0.9, 32) > p    # overfit -> more aug
    assert ada_update_p(p, 0.1, 32) < p    # underfit -> less aug
    assert ada_update_p(0.0, 0.0, 32) == 0.0  # clipped


def test_loss_phases_trace_with_augment():
    """The ADA-threaded loss phases trace (shape-level) with a pipe + p."""
    import jax
    import jax.numpy as jnp
    from tests.test_train_step import tiny_setup, make_batch, B
    from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss

    G, D, D_sem, base = tiny_setup()
    pipe = _pipe()
    loss = Pix2Pix3DLoss(G, D, D_semantic=D_sem, lpips=None,
                         augment_pipe=pipe, r1_gamma=1.0, lambda_lpips=0.0,
                         neural_rendering_resolution_initial=16)
    batch, gen_z, gen_c = make_batch()
    params_g = G.init(jax.random.PRNGKey(0))
    params_d = D.init(jax.random.PRNGKey(1))
    params_ds = D_sem.init(jax.random.PRNGKey(2))

    out = jax.eval_shape(
        lambda pg: loss.g_main(pg, params_d, params_ds, batch, gen_z[0],
                               gen_c[0], jax.random.PRNGKey(3), 0.0, 16,
                               aug_p=jnp.float32(0.5)),
        params_g)
    assert out[0].shape == ()  # scalar loss

    out = jax.eval_shape(
        lambda pd: loss.d_r1(pd, batch, jax.random.PRNGKey(4), 0.0, 16,
                             aug_p=jnp.float32(0.5)),
        params_d)
    assert out[0].shape == ()
