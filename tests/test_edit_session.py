"""EditSession (headless Qt-demo equivalent) smoke test."""

import numpy as np
import jax
import pytest


@pytest.mark.slow
def test_edit_session_flow():
    from tests.test_models import tiny_generator_config
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.apps.edit import EditSession

    cfg = tiny_generator_config()
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(0))
    app = {"neural_rendering_resolution": 32, "focal_length": 4.2647}

    rng = np.random.RandomState(0)
    mask = rng.randint(0, 6, size=(128, 128)).astype(np.float32)
    sess = EditSession(G, params, app, mask, seed=0, radius=2.7,
                       pivot=(0, 0, -0.06))

    img0, sem0, depth0 = sess.render(yaw=0.0)
    assert img0.shape == (128, 128, 3)
    assert sem0.shape == (128, 128, 6)
    assert np.isfinite(img0).all()

    # camera slider: different yaw, same ws/planes (no reconstruct)
    ws_before = sess._ws
    img1, _, _ = sess.render(yaw=0.3)
    assert sess._ws is ws_before
    assert not np.allclose(img0, img1)

    # brush edit invalidates the cache; reconstruct changes the render
    sess.paint(slice(30, 60), slice(30, 60), 3)
    assert sess._ws is None
    img2, _, _ = sess.render(yaw=0.0)
    assert not np.allclose(img0, img2)
