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


# Symlet-2 analysis lowpass taps (standard published wavelet constants;
# the reference builds its band filters from the same values,
# ref `training/augment.py:38,177-186`).
_SYM2 = np.array([-0.12940952255092145, 0.22414386804185735,
                  0.836516303737469, 0.48296291314469025])


def _make_freq_bank(num_bands=4):
    """4-band octave filter bank for imgfilter: band i isolates the octave
    below Nyquist/2^i via iterated a-trous lowpass + one highpass injection
    (same construction as ref `augment.py:177-186`, pure numpy)."""
    lo = _SYM2
    hi = lo * ((-1.0) ** np.arange(lo.size))
    lo2 = np.convolve(lo, lo[::-1]) / 2    # zero-phase squared lowpass
    hi2 = np.convolve(hi, hi[::-1]) / 2
    bank = np.eye(num_bands, 1)            # [bands, taps]
    for i in range(1, num_bands):
        up = np.zeros((num_bands, bank.shape[1] * 2 - 1))
        up[:, ::2] = bank                  # dyadic upsample (a-trous)
        bank = np.stack([np.convolve(row, lo2) for row in up])
        lo_idx = (bank.shape[1] - hi2.size) // 2
        bank[i, lo_idx:lo_idx + hi2.size] += hi2
    return bank.astype(np.float32)


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
                 saturation_std=1.0,
                 imgfilter=0, imgfilter_bands=(1, 1, 1, 1), imgfilter_std=1.0,
                 noise=0, cutout=0, noise_std=0.1, cutout_size=0.5):
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
        self.imgfilter = imgfilter
        self.imgfilter_bands = list(imgfilter_bands)
        self.imgfilter_std = imgfilter_std
        self.noise = noise
        self.cutout = cutout
        self.noise_std = noise_std
        self.cutout_size = cutout_size
        self.resample_filter = setup_filter([1, 3, 3, 1])
        if imgfilter > 0:
            self.Hz_fbank = jnp.asarray(_make_freq_bank())

    def _geom_matrix(self, rng, n, p):
        """Per-image inverse affine [N, 3, 3] in normalized [-1,1] coords.

        Each augmentation draws its parameter and its fire/no-fire gate from
        DISTINCT keys (the reference draws them independently too; sharing
        bits correlates magnitude with firing and biases the distribution)."""
        ks = jax.random.split(rng, 14)
        G = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))

        def apply(G, mat, prob_scale, gate_key):
            gate = jax.random.uniform(gate_key, (n,)) < p * prob_scale
            mat = jnp.where(gate[:, None, None], mat,
                            jnp.eye(3, dtype=jnp.float32)[None])
            return jnp.einsum("nij,njk->nik", G, mat)

        if self.xflip > 0:
            flip = jnp.where(jax.random.uniform(ks[0], (n,)) < 0.5, -1.0, 1.0)
            G = apply(G, _scale2d(flip, jnp.ones((n,))), self.xflip, ks[1])
        if self.rotate90 > 0:
            k = jax.random.randint(ks[2], (n,), 0, 4).astype(jnp.float32)
            G = apply(G, _rotate2d(-(math.pi / 2) * k), self.rotate90, ks[3])
        if self.xint > 0:
            t = (jax.random.uniform(ks[4], (n, 2)) * 2 - 1) * self.xint_max
            G = apply(G, _translate2d(t[:, 0], t[:, 1]), self.xint, ks[5])
        if self.scale > 0:
            s = jnp.exp2(jax.random.normal(ks[6], (n,)) * self.scale_std)
            G = apply(G, _scale2d(s, s), self.scale, ks[7])
        if self.rotate > 0:
            theta = (jax.random.uniform(ks[8], (n,)) * 2 - 1) \
                * math.pi * self.rotate_max
            G = apply(G, _rotate2d(-theta), self.rotate, ks[9])
        if self.aniso > 0:
            s = jnp.exp2(jax.random.normal(ks[10], (n,)) * self.aniso_std)
            G = apply(G, _scale2d(s, 1 / s), self.aniso, ks[11])
        if self.xfrac > 0:
            t = jax.random.normal(ks[12], (n, 2)) * self.xfrac_std
            G = apply(G, _translate2d(t[:, 0], t[:, 1]), self.xfrac, ks[13])
        return G

    def _color_matrix(self, rng, n, p, num_channels):
        ks = jax.random.split(rng, 9)
        C = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
        v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)  # luma axis

        def apply(C, mat, prob_scale, gate_key):
            gate = jax.random.uniform(gate_key, (n,)) < p * prob_scale
            mat = jnp.where(gate[:, None, None], mat,
                            jnp.eye(4, dtype=jnp.float32)[None])
            return jnp.einsum("nij,njk->nik", mat, C)

        if self.brightness > 0:
            b = jax.random.normal(ks[0], (n,)) * self.brightness_std
            m = jnp.tile(jnp.eye(4)[None], (n, 1, 1)).at[:, :3, 3] \
                .set(b[:, None] * jnp.ones((n, 3)))
            C = apply(C, m.astype(jnp.float32), self.brightness, ks[1])
        if self.contrast > 0:
            c = jnp.exp2(jax.random.normal(ks[2], (n,)) * self.contrast_std)
            m = jnp.eye(4)[None] * jnp.ones((n, 1, 1))
            m = m.at[:, 0, 0].set(c).at[:, 1, 1].set(c).at[:, 2, 2].set(c)
            C = apply(C, m.astype(jnp.float32), self.contrast, ks[3])
        if self.lumaflip > 0:
            flip = jnp.eye(4) - 2 * jnp.outer(v, v)  # householder about luma
            m = jnp.tile(flip[None], (n, 1, 1))
            C = apply(C, m.astype(jnp.float32), self.lumaflip, ks[4])
        if self.hue > 0 and num_channels > 1:
            theta = (jax.random.uniform(ks[5], (n,)) * 2 - 1) \
                * math.pi * self.hue_max
            # Rodrigues rotation about the UNIT luma axis on the 3x3 block:
            # R = cos*I + sin*K + (1-cos)*vv^T with K/vv^T built from the
            # normalized axis (matches ref rotate3d, `augment.py:96-105`)
            K = jnp.asarray([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                             [-v[1], v[0], 0]], jnp.float32)
            c = jnp.cos(theta)[:, None, None]
            s = jnp.sin(theta)[:, None, None]
            R3 = (jnp.eye(3)[None] * c + K[None] * s
                  + (1 - c) * jnp.outer(v[:3], v[:3])[None])
            m = jnp.tile(jnp.eye(4)[None], (n, 1, 1)).at[:, :3, :3].set(R3)
            C = apply(C, m.astype(jnp.float32), self.hue, ks[6])
        if self.saturation > 0 and num_channels > 1:
            s = jnp.exp2(jax.random.normal(ks[7], (n,)) * self.saturation_std)
            outer = jnp.outer(v, v)[None]
            m = outer + (jnp.eye(4)[None] - outer) * s[:, None, None]
            C = apply(C, m.astype(jnp.float32), self.saturation, ks[8])
        return C

    def _imgfilter(self, rng, images, p):
        """Per-band frequency amplification (ref `augment.py:382-409`):
        each of 4 octave bands is amplified by exp2(N(0, std)) with prob
        p*imgfilter*band_strength, the gain vector is power-normalized
        against a 1/f prior, and the combined separable filter is applied
        with reflect padding."""
        n, h, w, c = images.shape
        bank = self.Hz_fbank                     # [bands, taps]
        num_bands, taps = bank.shape
        expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)

        ks = jax.random.split(rng, 2 * num_bands)
        g = jnp.ones((n, num_bands), jnp.float32)
        for i, band_strength in enumerate(self.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(ks[2 * i], (n,))
                           * self.imgfilter_std)
            gate = jax.random.uniform(ks[2 * i + 1], (n,)) \
                < p * self.imgfilter * band_strength
            t_i = jnp.where(gate, t_i, 1.0)
            t = jnp.ones((n, num_bands), jnp.float32).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1,
                                     keepdims=True))
            g = g * t

        hz = g @ bank                            # [n, taps] combined filter
        # separable depthwise conv: fold (n, c) into the channel dim so each
        # image gets its own taps; reflect-pad once for both passes
        pad = taps // 2
        x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
        x = jnp.transpose(x, (1, 2, 0, 3)).reshape(
            1, h + 2 * pad, w + 2 * pad, n * c)
        rhs = jnp.repeat(hz, c, axis=0)          # [n*c, taps]
        dn = jax.lax.conv_dimension_numbers(x.shape, (taps, 1, 1, n * c),
                                            ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            x, jnp.transpose(rhs)[:, None, None, :], (1, 1), "VALID",
            dimension_numbers=dn, feature_group_count=n * c)
        x = jax.lax.conv_general_dilated(
            x, jnp.transpose(rhs)[None, :, None, :], (1, 1), "VALID",
            dimension_numbers=dn, feature_group_count=n * c)
        return jnp.transpose(x.reshape(h, w, n, c), (2, 0, 1, 3))

    def __call__(self, rng, images, p):
        """images `[N, H, W, C]` in [-1, 1]; p traced scalar in [0, 1]."""
        n, h, w, c = images.shape
        k_geom, k_color, k_filt, k_noise, k_cut = jax.random.split(rng, 5)
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

        # ---- image-space filtering (ref `augment.py:382-409`)
        if self.imgfilter > 0:
            out = self._imgfilter(k_filt, out, p)

        # ---- image-space corruptions (ref `augment.py:415-433`)
        if self.noise > 0:
            k_sig, k_gate, k_eps = jax.random.split(k_noise, 3)
            sigma = jnp.abs(jax.random.normal(k_sig, (n, 1, 1, 1))) \
                * self.noise_std
            gate = jax.random.uniform(k_gate, (n, 1, 1, 1)) < p * self.noise
            sigma = jnp.where(gate, sigma, 0.0)
            out = out + jax.random.normal(k_eps, out.shape) * sigma
        if self.cutout > 0:
            k_gate, k_center = jax.random.split(k_cut)
            size = jnp.where(
                jax.random.uniform(k_gate, (n, 1)) < p * self.cutout,
                self.cutout_size, 0.0)                       # [n, 1]
            center = jax.random.uniform(k_center, (n, 2))    # [n, 2] in [0,1)
            cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            keep_x = jnp.abs(cx[None] - center[:, :1]) >= size / 2  # [n, w]
            keep_y = jnp.abs(cy[None] - center[:, 1:]) >= size / 2  # [n, h]
            mask = jnp.logical_or(keep_y[:, :, None], keep_x[:, None, :])
            out = out * mask[..., None].astype(out.dtype)
        return out


def ada_update_p(p, signs_real_mean, batch_size, ada_interval=4, ada_kimg=500,
                 ada_target=0.6):
    """ADA heuristic (ref `training_loop.py:566-569`): move p toward keeping
    E[sign(D(real))] at the target."""
    adjust = np.sign(signs_real_mean - ada_target) \
        * (batch_size * ada_interval) / (ada_kimg * 1000)
    return float(np.clip(p + adjust, 0, 1))
