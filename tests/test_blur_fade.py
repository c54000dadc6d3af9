"""Blur-fade compile behavior: one compiled step per kernel-width bucket.

The reference passes blur σ dynamically every step (`loss.py:516-517`);
the trainer must NOT recompile per σ — only the kernel width floor(3σ) is
shape-bearing.  A seg2cat-style fade (blur_init=10) must compile O(30)
step variants over the whole fade, not one per step.  Uses a stub loss so
compiles are milliseconds, and checks the traced σ actually reaches the
loss (values differ across steps that share one program).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.parallel.trainer import Trainer, make_mesh
from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss


class _StubNet:
    class _Backbone:
        mapping = object()
    backbone = _Backbone()

    def init(self, rng):
        return {"backbone": {"mapping": {}},
                "w": jnp.zeros((4,), jnp.float32)}


class _StubD:
    def init(self, rng):
        return {"w": jnp.zeros((4,), jnp.float32)}


class _StubLoss:
    """Minimal loss with the real blur schedule; counts traces and surfaces
    the σ it received so cache reuse is observable."""

    def __init__(self, blur_init_sigma=10.0, blur_fade_kimg=200):
        self.G = _StubNet()
        self.D = _StubD()
        self.D_semantic = None
        self.r1_gamma = 0.0
        self.augment_pipe = None
        self.blur_init_sigma = blur_init_sigma
        self.blur_fade_kimg = blur_fade_kimg
        self.raw_fade_kimg = None
        self.traces = 0
        # borrow the real schedule formula
        self.schedule = lambda cur_nimg: Pix2Pix3DLoss.schedule(self, cur_nimg)
        self.nrr_final = None
        self.nrr_initial = 32

    @staticmethod
    def _sigma_of(blur_sigma):
        if isinstance(blur_sigma, tuple):
            return jnp.asarray(blur_sigma[0], jnp.float32)
        return jnp.asarray(blur_sigma, jnp.float32)

    def g_main(self, p, pd, pdsem, batch, z, c, rng, blur_sigma, nrr,
               aug_p=None, raw_fade=None):
        self.traces += 1
        s = self._sigma_of(blur_sigma)
        return jnp.sum(p["w"]) * 0.0 + s * 0.0, {"sigma": s}

    def g_reg(self, p, batch, z, rng):
        return jnp.sum(p["w"]) * 0.0, {}

    def d_main(self, p, pg, batch, z, c, rng, blur_sigma, nrr, aug_p=None,
               raw_fade=None):
        s = self._sigma_of(blur_sigma)
        ws = jnp.zeros((z.shape[0], 2, 4), jnp.float32)
        return jnp.sum(p["w"]) * 0.0 + s * 0.0, ({"d_sigma": s}, {"ws": ws})

    def d_r1(self, p, batch, rng, blur_sigma, nrr, aug_p=None,
             raw_fade=None):
        return jnp.sum(p["w"]) * 0.0, {}


def _batch(b=8):
    return ({"pose": jnp.zeros((b, 25), jnp.float32)},
            jnp.zeros((4, b, 8), jnp.float32),
            jnp.zeros((4, b, 25), jnp.float32))


def test_blur_fade_compiles_once_per_width_bucket():
    loss = _StubLoss(blur_init_sigma=10.0, blur_fade_kimg=200)
    trainer = Trainer(loss, mesh=make_mesh(), g_reg_interval=None,
                      d_reg_interval=None)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch, gen_z, gen_c = _batch()

    # Three consecutive steps early in the fade: σ changes every step but
    # floor(3σ) stays in one bucket -> ONE cache entry, ONE trace.
    sigmas = []
    nimgs = [4000, 4200, 4400]   # σ = 9.8, 9.79, 9.78 — all width 29
    for i, nimg in enumerate(nimgs):
        state, stats = trainer.step(state, batch, gen_z, gen_c,
                                    jax.random.PRNGKey(i), step_idx=i + 1,
                                    cur_nimg=nimg, batch_size=8)
        sigmas.append(float(np.asarray(stats["sigma"])) / 8)  # psum over 8
    assert len(trainer._step_cache) == 1
    # one trace, plus at most one weak-type canonicalization retrace after
    # the first returned state round-trips; crucially NOT one per σ
    assert loss.traces <= 2
    # ... and the traced σ still followed the schedule exactly
    expect = [loss.schedule(n)["blur_sigma"] for n in nimgs]
    np.testing.assert_allclose(sigmas, expect, rtol=1e-6)

    # A step past the fade (σ=0) uses the static no-blur program.
    state, stats = trainer.step(state, batch, gen_z, gen_c,
                                jax.random.PRNGKey(9), step_idx=4,
                                cur_nimg=10**9, batch_size=8)
    assert len(trainer._step_cache) == 2

    # Whole-fade compile count: distinct width buckets only (≈30), not
    # one per step (seg2cat fade ≈ 6000 steps).
    widths = set()
    for nimg in range(0, 200_000 + 1, 1000):
        s = loss.schedule(nimg)["blur_sigma"]
        widths.add(int(np.floor(s * 3)))
    assert len(widths) <= 31
