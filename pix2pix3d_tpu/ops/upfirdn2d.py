"""Pad / upsample / FIR-filter / downsample for batches of 2D images (NHWC).

TPU-native equivalent of the reference CUDA kernel stack
(`torch_utils/ops/upfirdn2d.{cu,cpp,py}` in pix2pix3D).  The behavioral spec is
the reference's pure implementation `_upfirdn2d_ref`
(`torch_utils/ops/upfirdn2d.py:169-213`):

    1. zero-insert upsample by `up` (each pixel followed by up-1 zeros),
    2. pad with `padding` (negative = crop),
    3. correlate with the (optionally flipped) FIR filter, valid windows only,
    4. keep every `down`-th pixel.

Instead of a hand-written kernel we express the whole pipeline as ONE XLA
`conv_general_dilated`: `lhs_dilation` performs the zero-insertion, the conv
padding performs pad/crop (XLA supports negative padding), the depthwise
filter performs the FIR, and `window_strides` performs the downsample.  XLA
lowers this to fused VPU/MXU code on TPU and fuses neighbouring elementwise
ops into it — there is nothing left on the table for a custom kernel except
exotic filter sizes.

Layout note: the whole framework is NHWC (TPU-friendly); the reference is
NCHW.  Filters are kept exactly like the reference: float32, `[fh, fw]`
(non-separable) or `[taps]` (separable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def _get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(f, normalize=True, flip_filter=False, gain=1, separable=None):
    """Prepare a FIR filter for use with :func:`upfirdn2d`.

    Mirrors reference `upfirdn2d.setup_filter` (`upfirdn2d.py:72-116`):
    accepts `[fh, fw]`, `[taps]`, scalar, or None; normalizes to unit DC gain;
    auto-selects separable representation for 1D filters with >= 8 taps.
    Returns a float32 jnp array of shape `[fh, fw]` or `[taps]`.
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f, dtype=jnp.float32)


def _depthwise_upfirdn(x, f, up, down, padding):
    """One fused dilated depthwise conv implementing up/pad/FIR/down.

    x: [N, H, W, C].  f: [fh, fw] already flipped/gained, float32.
    padding: (px0, px1, py0, py1), may be negative (XLA crops).
    """
    n, h, w, c = x.shape
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    fh, fw = f.shape

    # lhs_dilation inserts up-1 zeros BETWEEN samples; the reference spec
    # appends up-1 zeros after every sample (including the last), so fold the
    # missing trailing zeros into the high padding.
    pads = ((py0, py1 + upy - 1), (px0, px1 + upx - 1))

    in_dtype = x.dtype
    kernel = jnp.broadcast_to(f.astype(in_dtype)[:, :, None, None], (fh, fw, 1, c))
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=pads,
        lhs_dilation=(upy, upx),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=(jnp.float32 if in_dtype == jnp.float32
                                else None),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(in_dtype)


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Pad, upsample, FIR filter, and downsample a batch of NHWC images.

    Matches the reference spec `_upfirdn2d_ref` (`upfirdn2d.py:169-213`)
    elementwise (for float32 inputs).  `f` may be None (identity), 1D
    (separable), or 2D.  `padding` is int, `[x, y]`, or `[x0, x1, y0, y1]`
    and is relative to the upsampled image; negative values crop.
    """
    assert x.ndim == 4, "expected NHWC input"
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    assert f.dtype == jnp.float32

    fw, fh = _get_filter_size(f)
    upW = x.shape[2] * upx + px0 + px1
    upH = x.shape[1] * upy + py0 + py1
    assert upW >= fw and upH >= fh

    gain = float(gain)
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    if f.ndim == 1:
        # Separable: horizontal pass then vertical pass (axis ops commute).
        x = _depthwise_upfirdn(
            x, f[None, :], up=(upx, 1), down=(downx, 1), padding=(px0, px1, 0, 0)
        )
        x = _depthwise_upfirdn(
            x, f[:, None], up=(1, upy), down=(1, downy), padding=(0, 0, py0, py1)
        )
        return x
    return _depthwise_upfirdn(
        x, f, up=(upx, upy), down=(downx, downy), padding=(px0, px1, py0, py1)
    )


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """Filter NHWC images, output shape matches input (ref `upfirdn2d.py:279-311`)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + fw // 2,
        px1 + (fw - 1) // 2,
        py0 + fh // 2,
        py1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """Upsample NHWC images with FIR smoothing (ref `upfirdn2d.py:315-350`)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """Downsample NHWC images with FIR anti-aliasing (ref `upfirdn2d.py:354-389`)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
