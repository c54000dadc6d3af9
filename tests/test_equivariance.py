"""Equivariance metric operators vs the reference implementation (torch CPU
oracle), plus an end-to-end metric smoke test on a tiny alias-free G."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from pix2pix3d_tpu.metrics import equivariance as eq


def _rand_img(n=2, h=24, w=24, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, h, w, c).astype(np.float32)


@pytest.fixture(scope="module")
def ref_eq():
    from metrics import equivariance as ref
    return ref


def _nchw(x):
    import torch
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_integer_translation_matches_reference(ref_eq):
    x = _rand_img()
    for tx, ty in [(0.1, -0.05), (0.0, 0.0), (-0.2, 0.15)]:
        z, m = eq.apply_integer_translation(x, tx, ty)
        import torch
        z_r, m_r = ref_eq.apply_integer_translation(
            _nchw(x), torch.tensor(tx), torch.tensor(ty))
        np.testing.assert_allclose(z, _nhwc(z_r), atol=1e-6)
        np.testing.assert_allclose(m, _nhwc(m_r), atol=1e-6)


def test_fractional_translation_matches_reference(ref_eq):
    x = _rand_img(seed=1)
    import torch
    for tx, ty in [(0.07, -0.033), (-0.11, 0.021)]:
        z, m = eq.apply_fractional_translation(x, tx, ty)
        z_r, m_r = ref_eq.apply_fractional_translation(
            _nchw(x), torch.tensor(tx), torch.tensor(ty))
        np.testing.assert_allclose(z, _nhwc(z_r), atol=1e-4)
        np.testing.assert_allclose(m, _nhwc(m_r), atol=1e-6)


def test_bandlimit_filter_matches_reference(ref_eq):
    for angle in (0.3, -1.1):
        f = eq.construct_affine_bandlimit_filter(
            eq.rotation_matrix(angle), a=3, amax=6, aflt=16, up=2)
        f_r = ref_eq.construct_affine_bandlimit_filter(
            __import__("torch").as_tensor(eq.rotation_matrix(angle)),
            a=3, amax=6, aflt=16, up=2).numpy()
        np.testing.assert_allclose(f, f_r, atol=1e-5)


def test_fractional_rotation_matches_reference(ref_eq):
    x = _rand_img(n=1, h=16, w=16, seed=2)
    import torch
    angle = 0.4
    kw = dict(amax=6, aflt=16, up=2)
    z, m = eq.apply_affine_transformation(
        x, eq.rotation_matrix(angle), a=3, **kw)
    z_r, m_r = ref_eq.apply_affine_transformation(
        _nchw(x), torch.as_tensor(eq.rotation_matrix(angle)), a=3,
        amax=6, aflt=16, up=2)
    np.testing.assert_allclose(z, _nhwc(z_r), atol=1e-3)
    np.testing.assert_allclose(m, _nhwc(m_r), atol=1e-5)


def test_pseudo_rotation_matches_reference(ref_eq):
    x = _rand_img(n=1, h=16, w=16, seed=3)
    import torch
    z, m = eq.apply_fractional_pseudo_rotation(x, 0.5, a=3, aflt=16)
    z_r, m_r = ref_eq.apply_fractional_pseudo_rotation(
        _nchw(x), torch.tensor(0.5), a=3, aflt=16)
    np.testing.assert_allclose(z, _nhwc(z_r), atol=1e-4)
    np.testing.assert_allclose(m, _nhwc(m_r), atol=1e-6)


def test_equivariance_metric_on_tiny_stylegan3():
    """eq metrics run end-to-end on a tiny GeneratorS3 and an ideal
    equivariance sanity: translating the input transform of an alias-free
    G yields high PSNR (not -inf / nan)."""
    from pix2pix3d_tpu.nn.stylegan3 import GeneratorS3
    from pix2pix3d_tpu.metrics.metric_utils import MetricOptions
    from pix2pix3d_tpu.metrics.equivariance import \
        compute_equivariance_metrics

    G = GeneratorS3(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                    img_channels=3, channel_base=1024, channel_max=16,
                    mapping_kwargs=dict(num_layers=1))
    params = G.init(jax.random.PRNGKey(0))
    opts = MetricOptions(G=G, G_params=params, rng_seed=0)
    out = compute_equivariance_metrics(opts, num_samples=4, batch_size=2,
                                       compute_eqt_int=True,
                                       compute_eqt_frac=True)
    assert np.isfinite(out["eqt_int"]) and out["eqt_int"] > 10
    assert np.isfinite(out["eqt_frac"]) and out["eqt_frac"] > 10
