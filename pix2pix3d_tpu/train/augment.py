"""ADA augmentation pipeline (ref `training/augment.py`, 441 LoC).

Same augmentation menu and probability semantics as the reference
(StyleGAN2-ADA): each augmentation fires per-image with probability
`p * strength`; geometric ops compose into one inverse 2x3 affine matrix
applied with a single bilinear resample on a FIR-upsampled copy of the image
(the reference uses orthogonal wavelet banks for the same anti-aliasing
purpose, `augment.py` Hz_fbank); color ops compose into one 4x4 color matrix
applied pointwise.

Functional: `pipe(rng, images, p)` -> augmented images; `p` is a traced
scalar so the ADA controller can update it without recompiling.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import setup_filter, upsample2d, downsample2d
from ..ops.grid_sample import grid_sample_2d


def _mat3(a=1.0, b=0.0, c=0.0, d=0.0, e=1.0, f=0.0):
    return jnp.asarray([[a, b, c], [d, e, f], [0, 0, 1]], jnp.float32)


def _translate2d(tx, ty):
    o = jnp.ones_like(tx)
    z = jnp.zeros_like(tx)
    return jnp.stack([
        jnp.stack([o, z, tx], -1),
        jnp.stack([z, o, ty], -1),
        jnp.stack([z, z, o], -1)], -2)


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, z, z], -1),
        jnp.stack([z, sy, z], -1),
        jnp.stack([z, z, o], -1)], -2)


def _rotate2d(theta):
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1)], -2)


class AugmentPipe:
    """Probability-gated augmentation pipeline.

    Args mirror the reference constructor: per-category strengths
    (0 = disabled, 1 = standard ADA) for xflip, rotate90, xint, scale,
    rotate, aniso, xfrac, brightness, contrast, lumaflip, hue, saturation.
    """

    def __init__(self, xflip=0, rotate90=0, xint=0, xint_max=0.125,
                 scale=0, rotate=0, aniso=0, xfrac=0, scale_std=0.2,
                 rotate_max=1.0, aniso_std=0.2, xfrac_std=0.125,
                 brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, hue_max=1.0,
                 saturation_std=1.0):
        self.xflip = xflip
        self.rotate90 = rotate90
        self.xint = xint
        self.xint_max = xint_max
        self.scale = scale
        self.rotate = rotate
        self.aniso = aniso
        self.xfrac = xfrac
        self.scale_std = scale_std
        self.rotate_max = rotate_max
        self.aniso_std = aniso_std
        self.xfrac_std = xfrac_std
        self.brightness = brightness
        self.contrast = contrast
        self.lumaflip = lumaflip
        self.hue = hue
        self.saturation = saturation
        self.brightness_std = brightness_std
        self.contrast_std = contrast_std
        self.hue_max = hue_max
        self.saturation_std = saturation_std
        self.resample_filter = setup_filter([1, 3, 3, 1])

    def _geom_matrix(self, rng, n, p):
        """Per-image inverse affine [N, 3, 3] in normalized [-1,1] coords."""
        ks = jax.random.split(rng, 8)
        G = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))

        def apply(G, mat, prob_scale, key):
            gate = jax.random.uniform(key, (n,)) < p * prob_scale
            mat = jnp.where(gate[:, None, None], mat,
                            jnp.eye(3, dtype=jnp.float32)[None])
            return jnp.einsum("nij,njk->nik", G, mat)

        if self.xflip > 0:
            flip = jnp.where(jax.random.uniform(ks[0], (n,)) < 0.5, -1.0, 1.0)
            G = apply(G, _scale2d(flip, jnp.ones((n,))), self.xflip, ks[1])
        if self.rotate90 > 0:
            k = jax.random.randint(ks[2], (n,), 0, 4).astype(jnp.float32)
            G = apply(G, _rotate2d(-(math.pi / 2) * k), self.rotate90, ks[2])
        if self.xint > 0:
            t = (jax.random.uniform(ks[3], (n, 2)) * 2 - 1) * self.xint_max
            G = apply(G, _translate2d(t[:, 0], t[:, 1]), self.xint, ks[3])
        if self.scale > 0:
            s = jnp.exp2(jax.random.normal(ks[4], (n,)) * self.scale_std)
            G = apply(G, _scale2d(s, s), self.scale, ks[4])
        if self.rotate > 0:
            theta = (jax.random.uniform(ks[5], (n,)) * 2 - 1) \
                * math.pi * self.rotate_max
            G = apply(G, _rotate2d(-theta), self.rotate, ks[5])
        if self.aniso > 0:
            s = jnp.exp2(jax.random.normal(ks[6], (n,)) * self.aniso_std)
            G = apply(G, _scale2d(s, 1 / s), self.aniso, ks[6])
        if self.xfrac > 0:
            t = jax.random.normal(ks[7], (n, 2)) * self.xfrac_std
            G = apply(G, _translate2d(t[:, 0], t[:, 1]), self.xfrac, ks[7])
        return G

    def _color_matrix(self, rng, n, p, num_channels):
        ks = jax.random.split(rng, 5)
        C = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
        v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)  # luma axis

        def apply(C, mat, prob_scale, key):
            gate = jax.random.uniform(key, (n,)) < p * prob_scale
            mat = jnp.where(gate[:, None, None], mat,
                            jnp.eye(4, dtype=jnp.float32)[None])
            return jnp.einsum("nij,njk->nik", mat, C)

        if self.brightness > 0:
            b = jax.random.normal(ks[0], (n,)) * self.brightness_std
            m = jnp.tile(jnp.eye(4)[None], (n, 1, 1)).at[:, :3, 3] \
                .set(b[:, None] * jnp.ones((n, 3)))
            C = apply(C, m.astype(jnp.float32), self.brightness, ks[0])
        if self.contrast > 0:
            c = jnp.exp2(jax.random.normal(ks[1], (n,)) * self.contrast_std)
            m = jnp.eye(4)[None] * jnp.ones((n, 1, 1))
            m = m.at[:, 0, 0].set(c).at[:, 1, 1].set(c).at[:, 2, 2].set(c)
            C = apply(C, m.astype(jnp.float32), self.contrast, ks[1])
        if self.lumaflip > 0:
            flip = jnp.eye(4) - 2 * jnp.outer(v, v)  # householder about luma
            m = jnp.tile(flip[None], (n, 1, 1))
            C = apply(C, m.astype(jnp.float32), self.lumaflip, ks[2])
        if self.hue > 0 and num_channels > 1:
            theta = (jax.random.uniform(ks[3], (n,)) * 2 - 1) \
                * math.pi * self.hue_max
            # rotation about the luma axis (Rodrigues on the 3x3 block)
            K = jnp.asarray([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                             [-v[1], v[0], 0]], jnp.float32) * math.sqrt(3)
            c = jnp.cos(theta)[:, None, None]
            s = jnp.sin(theta)[:, None, None]
            R3 = (jnp.eye(3)[None] * c + K[None] * s
                  + (1 - c) * jnp.outer(v[:3], v[:3])[None] * 3)
            m = jnp.tile(jnp.eye(4)[None], (n, 1, 1)).at[:, :3, :3].set(R3)
            C = apply(C, m.astype(jnp.float32), self.hue, ks[3])
        if self.saturation > 0 and num_channels > 1:
            s = jnp.exp2(jax.random.normal(ks[4], (n,)) * self.saturation_std)
            outer = jnp.outer(v, v)[None]
            m = outer + (jnp.eye(4)[None] - outer) * s[:, None, None]
            C = apply(C, m.astype(jnp.float32), self.saturation, ks[4])
        return C

    def __call__(self, rng, images, p):
        """images `[N, H, W, C]` in [-1, 1]; p traced scalar in [0, 1]."""
        n, h, w, c = images.shape
        k_geom, k_color = jax.random.split(rng)
        p = jnp.asarray(p, jnp.float32)

        # ---- geometric: one bilinear warp at native resolution.  When no
        # augment fires the sample points land exactly on pixel centers, so
        # the pipe is bit-exact identity (the reference gets the same
        # property from orthogonal-wavelet perfect reconstruction; its
        # filtered multi-res warp anti-aliases large minifications better —
        # a quality nuance for an off-by-default feature, traded here for
        # exactness without the sym6 bank).
        G_inv = self._geom_matrix(k_geom, n, p)
        yy, xx = jnp.meshgrid(
            (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2 - 1,
            (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2 - 1,
            indexing="ij")
        grid = jnp.stack([xx, yy, jnp.ones_like(xx)], -1).reshape(-1, 3)
        warped = jnp.einsum("nij,mj->nmi", G_inv, grid)[..., :2]  # [N, HW, 2]
        out = grid_sample_2d(images, warped, padding_mode="zeros")
        out = out.reshape(n, h, w, c)

        # ---- color
        C_mat = self._color_matrix(k_color, n, p, c)
        if c == 3:
            rgb1 = jnp.concatenate([out, jnp.ones((n, h, w, 1), out.dtype)], -1)
            out = jnp.einsum("nij,nhwj->nhwi", C_mat, rgb1)[..., :3]
        elif c == 1:
            # grayscale: use the luma row (ref applies C to broadcast channels)
            rgb1 = jnp.concatenate([jnp.tile(out, (1, 1, 1, 3)),
                                    jnp.ones((n, h, w, 1), out.dtype)], -1)
            out = jnp.einsum("nj,nhwj->nhw", C_mat[:, 0], rgb1)[..., None]
        else:
            # >3 channels (image|raw concat): apply to the first 3 and last 3
            # independently, pass-through the rest
            parts = []
            for start in range(0, c - c % 3, 3):
                blk = out[..., start:start + 3]
                rgb1 = jnp.concatenate(
                    [blk, jnp.ones((n, h, w, 1), out.dtype)], -1)
                parts.append(jnp.einsum("nij,nhwj->nhwi", C_mat, rgb1)[..., :3])
            if c % 3:
                parts.append(out[..., c - c % 3:])
            out = jnp.concatenate(parts, -1)
        return out


def ada_update_p(p, signs_real_mean, batch_size, ada_interval=4, ada_kimg=500,
                 ada_target=0.6):
    """ADA heuristic (ref `training_loop.py:566-569`): move p toward keeping
    E[sign(D(real))] at the target."""
    adjust = np.sign(signs_real_mean - ada_target) \
        * (batch_size * ada_interval) / (ada_kimg * 1000)
    return float(np.clip(p + adjust, 0, 1))
