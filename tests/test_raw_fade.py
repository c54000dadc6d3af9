"""DummyDualDiscriminator subsumption: scheduled raw-branch fade.

The reference ships a separate `DummyDualDiscriminator` whose raw branch
decays 1 -> 0 via a stateful per-forward counter (ref
`dual_discriminator.py:180-248`); here the same behavior is an explicit
`raw_fade` schedule on the one DualDiscriminator."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.nn import DualDiscriminator
from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss


def test_raw_fade_scales_raw_branch():
    D = DualDiscriminator(c_dim=0, img_resolution=32, img_channels=3,
                          channel_base=1024, channel_max=32, num_fp16_res=0)
    params = D.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = {"image": jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32)),
           "image_raw": jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))}
    c = jnp.zeros((2, 0), jnp.float32)

    out_full = D(params, img, c, raw_fade=1.0)
    out_none = D(params, img, c)  # no fade arg = raw branch untouched
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_none),
                               rtol=1e-5)

    # raw_fade=0 must equal zeroing the raw input entirely
    out_zero = D(params, img, c, raw_fade=0.0)
    img0 = dict(img, image_raw=jnp.zeros_like(img["image_raw"]))
    out_zeroed = D(params, img0, c)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_zeroed),
                               rtol=1e-5)

    # traced scalar works (the trainer passes it dynamically)
    f = jax.jit(lambda fade: D(params, img, c, raw_fade=fade))
    np.testing.assert_allclose(np.asarray(f(1.0)), np.asarray(out_full),
                               rtol=1e-4, atol=1e-5)


def test_schedule_emits_raw_fade():
    class _G:
        pass

    loss = Pix2Pix3DLoss(_G(), _G(), lpips=None, raw_fade_kimg=500)
    s0 = loss.schedule(0)
    s_mid = loss.schedule(250_000)
    s_end = loss.schedule(600_000)
    assert s0["raw_fade"] == 1.0
    assert abs(s_mid["raw_fade"] - 0.5) < 1e-6
    assert s_end["raw_fade"] == 0.0
    # default: no fade scheduled
    loss2 = Pix2Pix3DLoss(_G(), _G(), lpips=None)
    assert loss2.schedule(0)["raw_fade"] is None
