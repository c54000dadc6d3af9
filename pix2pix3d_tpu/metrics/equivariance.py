"""Equivariance metrics EQ-T / EQ-T_frac / EQ-R for alias-free generators.

Ref `metrics/equivariance.py` (StyleGAN3 paper, Appendix E.3).  The metric
renders the same latent twice — once with the identity input transform,
once with the transform set to the inverse of a random translation or
rotation — and measures the masked PSNR between the transformed reference
render and the second render.  An ideal alias-free generator is perfectly
equivariant: the two should match except at crop borders.

TPU-native differences from the reference: the input transform is a
PARAMETER substituted functionally (`params['synthesis']['input']
['transform']`) rather than an in-place buffer write; images are NHWC; the
host-side image transforms (windowed-sinc translation, bandlimited affine
rotation) run in numpy since they are O(num_samples) image ops, not model
compute.

Applies to `nn.stylegan3.GeneratorS3` (any G whose synthesis params carry
`input.transform` and whose __call__ is `(params, z, c, **kw)`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------- primitives
def _sinc(x):
    y = np.abs(np.asarray(x, np.float64) * np.pi)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.sin(y) / np.maximum(y, 1e-30)
    return np.where(y < 1e-30, 1.0, z)


def _lanczos_window(x, a):
    x = np.abs(np.asarray(x, np.float64)) / a
    return np.where(x < 1, _sinc(x), 0.0)


def rotation_matrix(angle):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(3, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, s, -s, c
    return m


# ------------------------------------------- translation operators (E.2)
def apply_integer_translation(x, tx, ty):
    """x [N, H, W, C]; tx/ty in image-size units.  Returns (shifted, mask)."""
    n, h, w, c = x.shape
    ix, iy = int(np.rint(tx * w)), int(np.rint(ty * h))
    z = np.zeros_like(x)
    m = np.zeros_like(x)
    if abs(ix) < w and abs(iy) < h:
        src = x[:, max(-iy, 0):h + min(-iy, 0), max(-ix, 0):w + min(-ix, 0)]
        z[:, max(iy, 0):h + min(iy, 0), max(ix, 0):w + min(ix, 0)] = src
        m[:, max(iy, 0):h + min(iy, 0), max(ix, 0):w + min(ix, 0)] = 1
    return z, m


def apply_fractional_translation(x, tx, ty, a=3):
    """Windowed-sinc subpixel translation (ref `equivariance.py:49-80`)."""
    n, h, w, c = x.shape
    tx, ty = float(tx * w), float(ty * h)
    ix, iy = int(np.floor(tx)), int(np.floor(ty))
    fx, fy = tx - ix, ty - iy
    b = a - 1

    z = np.zeros_like(x)
    zx0, zy0 = max(ix - b, 0), max(iy - b, 0)
    zx1, zy1 = min(ix + a, 0) + w, min(iy + a, 0) + h
    if zx0 < zx1 and zy0 < zy1:
        taps = np.arange(a * 2) - b
        filt_x = _sinc(taps - fx) * _sinc((taps - fx) / a)
        filt_y = _sinc(taps - fy) * _sinc((taps - fy) / a)
        filt_x = filt_x / filt_x.sum()
        filt_y = filt_y / filt_y.sum()
        # ref filter2d GROWS by the explicit padding [b, a]: its internal
        # support padding (fw//2 = a left, (fw-1)//2 = b right) plus the
        # explicit (b, a) gives a+b on both sides; 'valid' correlation then
        # yields length + b + a on the filtered axis
        y = x.astype(np.float64)
        y = np.pad(y, ((0, 0), (0, 0), (a + b, a + b), (0, 0)))
        y = np.apply_along_axis(
            lambda r: np.convolve(r, filt_x, mode="valid"), 2, y)
        y = np.pad(y, ((0, 0), (a + b, a + b), (0, 0), (0, 0)))
        y = np.apply_along_axis(
            lambda r: np.convolve(r, filt_y, mode="valid"), 1, y)
        y = y[:, max(b - iy, 0):h + b + a + min(-iy - a, 0),
              max(b - ix, 0):w + b + a + min(-ix - a, 0)]
        z[:, zy0:zy1, zx0:zx1] = y.astype(x.dtype)

    m = np.zeros_like(x)
    mx0, my0 = max(ix + a, 0), max(iy + a, 0)
    mx1, my1 = min(ix - b, 0) + w, min(iy - b, 0) + h
    if mx0 < mx1 and my0 < my1:
        m[:, my0:my1, mx0:mx1] = 1
    return z, m


# ---------------------------------------------- rotation operators (E.3)
def construct_affine_bandlimit_filter(mat, a=3, amax=16, aflt=64, up=4,
                                      cutoff_in=1, cutoff_out=1):
    """Jointly bandlimited resampling filter for an affine warp
    (ref `equivariance.py:86-132`): the product of Lanczos-windowed sincs
    in the input and output coordinate frames, combined via FFT."""
    assert a <= amax < aflt
    mat = np.asarray(mat, np.float64)

    taps = ((np.arange(aflt * up * 2 - 1) + 1) / up - aflt)
    taps = np.roll(taps, 1 - aflt * up)
    yi, xi = np.meshgrid(taps, taps, indexing="ij")
    oc = np.stack([xi, yi], axis=2) @ mat[:2, :2].T
    xo, yo = oc[..., 0], oc[..., 1]

    # convolution (via FFT) of the two oriented sincs, windowed by the
    # convolution of the two oriented Lanczos windows
    fi = _sinc(xi * cutoff_in) * _sinc(yi * cutoff_in)
    fo = _sinc(xo * cutoff_out) * _sinc(yo * cutoff_out)
    f = np.fft.ifftn(np.fft.fftn(fi) * np.fft.fftn(fo)).real
    wi = _lanczos_window(xi, a) * _lanczos_window(yi, a)
    wo = _lanczos_window(xo, a) * _lanczos_window(yo, a)
    f = f * np.fft.ifftn(np.fft.fftn(wi) * np.fft.fftn(wo)).real

    c = (aflt - amax) * up
    f = np.roll(f, [aflt * up - 1] * 2, axis=(0, 1))[c:-c, c:-c]
    f = np.pad(f, ((0, 1), (0, 1))).reshape(amax * 2, up, amax * 2, up)
    f = f / f.sum(axis=(0, 2), keepdims=True) / (up ** 2)
    f = f.reshape(amax * 2 * up, amax * 2 * up)[:-1, :-1]
    return f.astype(np.float32)


def _upsample2d(x, f, up, p):
    """Zero-stuff upsample by `up` + FIR filter `f` with explicit growth
    padding `p` per side (ref upfirdn2d.upsample2d semantics: output size
    h*up + 2p; the filter's own support is internally compensated)."""
    import scipy.signal

    n, h, w, c = x.shape
    F = f.shape[0]
    # ref upsample2d internal padding: (F+up-1)//2 before, (F-up)//2 after,
    # plus the explicit p; the filter is applied as a true convolution
    # (upfirdn2d flips the taps)
    p0, p1 = p + (F + up - 1) // 2, p + (F - up) // 2
    z = np.zeros((n, h * up, w * up, c), np.float64)
    z[:, ::up, ::up] = x * (up ** 2)
    out = np.empty((n, h * up + 2 * p, w * up + 2 * p, c), np.float64)
    for i in range(n):
        for ch in range(c):
            out[i, :, :, ch] = scipy.signal.convolve2d(
                np.pad(z[i, :, :, ch], ((p0, p1), (p0, p1))), f,
                mode="valid")
    return out.astype(np.float32)


def _grid_sample(x, grid, mode="bilinear"):
    """NHWC grid-sample, zeros padding, align_corners=False.
    grid [N, Ho, Wo, 2] in [-1, 1]."""
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1) * (w / 2) - 0.5
    gy = (grid[..., 1] + 1) * (h / 2) - 0.5
    if mode == "nearest":
        ix = np.rint(gx).astype(np.int64)
        iy = np.rint(gy).astype(np.int64)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out = np.zeros((*gx.shape, c), x.dtype)
        for i in range(n):
            out[i][valid[i]] = x[i, iy[i][valid[i]], ix[i][valid[i]]]
        return out
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    out = np.zeros((*gx.shape, c), np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xx, yy = x0 + dx, y0 + dy
            wgt = (1 - np.abs(gx - xx)) * (1 - np.abs(gy - yy))
            valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            for i in range(n):
                v = valid[i]
                out[i][v] += (wgt[i][v, None]
                              * x[i, yy[i][v], xx[i][v]].astype(np.float64))
    return out.astype(np.float32)


def apply_affine_transformation(x, mat, up=4, **filter_kwargs):
    """Bandlimited affine warp (ref `equivariance.py:137-166`); NHWC."""
    n, h, w, c = x.shape
    mat = np.asarray(mat, np.float64)
    f = construct_affine_bandlimit_filter(mat, up=up, **filter_kwargs)
    p = f.shape[0] // 2

    theta = np.linalg.inv(mat)
    theta[:2, 2] *= 2
    theta[0, 2] += 1 / up / w
    theta[1, 2] += 1 / up / h
    theta[0, :] *= w / (w + p / up * 2)
    theta[1, :] *= h / (h + p / up * 2)

    # affine_grid(align_corners=False): out pixel centers -> input coords
    gy, gx = np.meshgrid((np.arange(h) + 0.5) / h * 2 - 1,
                         (np.arange(w) + 0.5) / w * 2 - 1, indexing="ij")
    ones = np.ones_like(gx)
    pts = np.stack([gx, gy, ones], -1) @ theta[:2, :3].T  # [H, W, 2]
    grid = np.broadcast_to(pts[None], (n, h, w, 2))

    y = _upsample2d(x, f, up, p)
    z = _grid_sample(y, grid, mode="bilinear")

    m = np.zeros_like(y)
    cc = p * 2 + 1
    m[:, cc:-cc, cc:-cc] = 1
    m = _grid_sample(m, grid, mode="nearest")
    return z, m


def apply_fractional_rotation(x, angle, a=3, **filter_kwargs):
    return apply_affine_transformation(x, rotation_matrix(angle), a=a,
                                       amax=a * 2, **filter_kwargs)


def apply_fractional_pseudo_rotation(x, angle, a=3, **filter_kwargs):
    """R*_alpha: match the rotated image's frequency content without
    rotating (ref `equivariance.py:176-185`)."""
    import scipy.signal

    f = construct_affine_bandlimit_filter(rotation_matrix(-angle), a=a,
                                          amax=a * 2, up=1, **filter_kwargs)
    p = f.shape[0] // 2
    n, h, w, c = x.shape
    y = np.empty_like(x, dtype=np.float64)
    for i in range(n):
        for ch in range(c):
            y[i, :, :, ch] = scipy.signal.convolve2d(
                np.pad(x[i, :, :, ch], p), f, mode="valid")
    m = np.zeros_like(x)
    m[:, p:-p, p:-p] = 1
    return y.astype(np.float32), m


# ---------------------------------------------------------------- metric
def _with_transform(params, mat):
    p = dict(params)
    p["synthesis"] = dict(p["synthesis"])
    p["synthesis"]["input"] = dict(p["synthesis"]["input"],
                                   transform=jnp.asarray(mat, jnp.float32))
    return p


def compute_equivariance_metrics(opts, num_samples=200, batch_size=4,
                                 translate_max=0.125, rotate_max=1.0,
                                 compute_eqt_int=False, compute_eqt_frac=False,
                                 compute_eqr=False):
    """Masked-PSNR equivariance scores (ref `equivariance.py:190-270`).

    opts.G must expose `params['synthesis']['input']['transform']`
    (GeneratorS3)."""
    assert compute_eqt_int or compute_eqt_frac or compute_eqr
    G, params = opts.G, opts.G_params
    if "input" not in params.get("synthesis", {}):
        raise ValueError("generator has no input transform; equivariance "
                         "metrics need an alias-free (StyleGAN3) generator")
    rng = np.random.RandomState(opts.rng_seed)
    I = np.eye(3, dtype=np.float32)

    fwd = jax.jit(lambda p, z, c: G(p, z, c, noise_mode="const"))

    sums = np.zeros(6, np.float64)
    for start in range(0, num_samples, batch_size):
        z = jnp.asarray(rng.randn(batch_size, G.z_dim).astype(np.float32))
        c = jnp.zeros((batch_size, G.c_dim), jnp.float32)
        orig = np.asarray(fwd(_with_transform(params, I), z, c))

        if compute_eqt_int:
            t = (rng.rand(2) * 2 - 1) * translate_max
            t = np.rint(t * G.img_resolution) / G.img_resolution
            m = I.copy()
            m[:2, 2] = -t
            img = np.asarray(fwd(_with_transform(params, m), z, c))
            ref, mask = apply_integer_translation(orig, t[0], t[1])
            sums[0] += (np.square(ref - img) * mask).sum()
            sums[1] += mask.sum()

        if compute_eqt_frac:
            t = (rng.rand(2) * 2 - 1) * translate_max
            m = I.copy()
            m[:2, 2] = -t
            img = np.asarray(fwd(_with_transform(params, m), z, c))
            ref, mask = apply_fractional_translation(orig, t[0], t[1])
            sums[2] += (np.square(ref - img) * mask).sum()
            sums[3] += mask.sum()

        if compute_eqr:
            angle = (rng.rand() * 2 - 1) * (rotate_max * np.pi)
            img = np.asarray(fwd(_with_transform(
                params, rotation_matrix(-angle)), z, c))
            ref, ref_mask = apply_fractional_rotation(orig, angle)
            pseudo, pseudo_mask = apply_fractional_pseudo_rotation(img, angle)
            mask = ref_mask * pseudo_mask
            sums[4] += (np.square(ref - pseudo) * mask).sum()
            sums[5] += mask.sum()

    # PSNR on the [-1, 1] range (peak-to-peak 2 -> 20*log10(2/rmse))
    def psnr(se, n_):
        mse = se / max(n_, 1e-12)
        return float(10 * np.log10(4 / max(mse, 1e-20)))

    out = {}
    if compute_eqt_int:
        out["eqt_int"] = psnr(sums[0], sums[1])
    if compute_eqt_frac:
        out["eqt_frac"] = psnr(sums[2], sums[3])
    if compute_eqr:
        out["eqr"] = psnr(sums[4], sums[5])
    return out
