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


def test_hue_rotation_matches_reference_rodrigues():
    """Our hue 3x3 block must equal the reference rotate3d about the unit
    luma axis (ref `training/augment.py:96-105`); in particular it must fix
    gray pixels and preserve norms (a prior bug amplified luma 5x at pi)."""
    v = np.ones(3) / np.sqrt(3)

    def ref_rotate3d(theta):
        c, s, cc = np.cos(theta), np.sin(theta), 1 - np.cos(theta)
        vx, vy, vz = v
        return np.array([
            [vx*vx*cc + c,    vx*vy*cc - vz*s, vx*vz*cc + vy*s],
            [vy*vx*cc + vz*s, vy*vy*cc + c,    vy*vz*cc - vx*s],
            [vz*vx*cc - vy*s, vz*vy*cc + vx*s, vz*vz*cc + c]])

    # drive the pipe's hue-only path on gray + colored pixels
    pipe = AugmentPipe(hue=1)
    gray = jnp.full((4, 8, 8, 3), 0.37, jnp.float32)
    out = np.asarray(pipe(jax.random.PRNGKey(5), gray, 1.0))
    np.testing.assert_allclose(out, np.asarray(gray), atol=1e-5)

    # norm preservation on random colors (rotation = orthogonal)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(8, 4, 4, 3).astype(np.float32) * 2 - 1)
    y = np.asarray(pipe(jax.random.PRNGKey(6), x, 1.0))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               atol=1e-4)

    # direct matrix check against the reference formula
    from pix2pix3d_tpu.train import augment as aug_mod
    for theta in [0.3, -1.2, np.pi]:
        c, s = np.cos(theta), np.sin(theta)
        K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        ours = np.eye(3) * c + K * s + (1 - c) * np.outer(v, v)
        np.testing.assert_allclose(ours, ref_rotate3d(theta), atol=1e-12)
    assert aug_mod  # formula inlined above mirrors _color_matrix's hue block


def test_freq_bank_matches_reference_construction():
    """_make_freq_bank must reproduce the reference Hz_fbank (scipy oracle,
    ref `training/augment.py:177-186`)."""
    import scipy.signal
    from pix2pix3d_tpu.train.augment import _make_freq_bank, _SYM2

    Hz_lo = np.asarray(_SYM2, np.float64)
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    ref = np.eye(4, 1)
    for i in range(1, 4):
        ref = np.dstack([ref, np.zeros_like(ref)]).reshape(4, -1)[:, :-1]
        ref = scipy.signal.convolve(ref, [Hz_lo2])
        ref[i, (ref.shape[1] - Hz_hi2.size) // 2:
               (ref.shape[1] + Hz_hi2.size) // 2] += Hz_hi2

    np.testing.assert_allclose(_make_freq_bank(), ref, atol=1e-7)
    # perfect reconstruction: the 4 bands sum to a (near-)delta, so the
    # p=0 imgfilter path is identity
    total = _make_freq_bank().sum(0)
    delta = np.zeros_like(total)
    delta[total.size // 2] = 1
    np.testing.assert_allclose(total, delta, atol=1e-6)


def test_imgfilter_identity_at_p0_and_active_at_p1():
    pipe = AugmentPipe(imgfilter=1)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    y0 = np.asarray(pipe(jax.random.PRNGKey(7), x, 0.0))
    np.testing.assert_allclose(y0, np.asarray(x), atol=1e-4)
    y1 = np.asarray(pipe(jax.random.PRNGKey(8), x, 1.0))
    assert not np.allclose(y1, np.asarray(x), atol=0.02)
    assert np.isfinite(y1).all()


def test_noise_statistics():
    pipe = AugmentPipe(noise=1, noise_std=0.1)
    x = jnp.zeros((64, 16, 16, 3), jnp.float32)
    y = np.asarray(pipe(jax.random.PRNGKey(9), x, 1.0))
    # additive noise with sigma = |N(0,1)|*0.1 per image: E[std] ~ 0.08
    per_img_std = y.reshape(64, -1).std(1)
    assert 0.03 < per_img_std.mean() < 0.15
    y0 = np.asarray(pipe(jax.random.PRNGKey(10), x, 0.0))
    np.testing.assert_allclose(y0, 0, atol=1e-7)


def test_cutout_zeroes_expected_area():
    pipe = AugmentPipe(cutout=1, cutout_size=0.5)
    x = jnp.ones((32, 32, 32, 1), jnp.float32)
    y = np.asarray(pipe(jax.random.PRNGKey(11), x, 1.0))
    zero_frac = (y == 0).mean()
    # 0.5x0.5 rectangle, centers uniform (partially off-image): between
    # ~12% and 25% of pixels zeroed on average
    assert 0.08 < zero_frac < 0.3
    y0 = np.asarray(pipe(jax.random.PRNGKey(12), x, 0.0))
    np.testing.assert_allclose(y0, 1, atol=1e-7)


def test_gate_and_parameter_keys_independent():
    """Firing must not correlate with parameter magnitude: at small p, the
    images that DID get augmented should show the full parameter
    distribution (regression test for shared gate/param keys)."""
    pipe = AugmentPipe(brightness=1, brightness_std=0.2)
    x = jnp.zeros((512, 4, 4, 3), jnp.float32)
    y = np.asarray(pipe(jax.random.PRNGKey(13), x, 0.3))
    fired = np.abs(y.reshape(512, -1)).max(1) > 1e-6
    assert 0.15 < fired.mean() < 0.45
    b = y[fired].reshape(fired.sum(), -1).mean(1)
    # brightness draws are N(0, 0.2): the fired subset must keep a ~zero
    # mean (correlated keys skewed it systematically)
    assert abs(b.mean()) < 3 * 0.2 / np.sqrt(max(fired.sum(), 1))


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
