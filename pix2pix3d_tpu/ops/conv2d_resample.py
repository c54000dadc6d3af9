"""2D convolution with optional FIR up/downsampling (NHWC).

TPU-native equivalent of reference `torch_utils/ops/conv2d_resample.py`.  The
reference picks among five cuDNN-shaped fast paths (transpose conv tricks,
1x1 reorderings); on TPU none of that is needed — XLA's
`conv_general_dilated` natively expresses zero-insertion (lhs_dilation),
strides, and asymmetric/negative padding, so every case reduces to an
FIR-upfirdn stage fused around one MXU conv.

Weights are HWIO `[kh, kw, in_ch // groups, out_ch]` (JAX-native layout; the
checkpoint converter transposes from the reference's OIHW once at load).
Padding semantics follow the reference: `padding` is specified w.r.t. the
*upsampled* image and must include the conv kernel's halo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .upfirdn2d import _parse_padding, _get_filter_size, upfirdn2d


def _conv2d(x, w, stride=1, padding=((0, 0), (0, 0)), groups=1, flip_weight=True):
    """Plain conv. `flip_weight=True` = correlation (torch/XLA default).

    Precision: float32 inputs run at HIGHEST (full f32 MXU passes) so results
    match the reference bit-for-bit-ish; bf16 inputs use the fast MXU path.
    """
    from .precision import acc_type, conv_precision

    if not flip_weight and (w.shape[0] > 1 or w.shape[1] > 1):
        w = jnp.flip(w, axis=(0, 1))
    precision = conv_precision(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=acc_type(x.dtype),
        precision=precision,
    )
    return out.astype(x.dtype)


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """Conv with optional up/downsampling; matches reference
    `conv2d_resample` (`conv2d_resample.py:48-147`) elementwise.

    Args:
        x: `[N, H, W, C_in]`.
        w: `[kh, kw, C_in // groups, C_out]`.
        f: prepared FIR filter (see `setup_filter`), or None.
        up/down: integer resampling factors.
        padding: int / `[x, y]` / `[x0, x1, y0, y1]` w.r.t. upsampled image.
    """
    assert x.ndim == 4 and w.ndim == 4
    up, down = int(up), int(down)
    assert up >= 1 and down >= 1
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Fold the FIR halo into the padding (ref conv2d_resample.py:85-96).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1 and down > 1:
        x = upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                      flip_filter=flip_filter)
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    if up > 1:
        x = upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                      flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)
    # No resampling: one conv with (possibly asymmetric/negative) padding.
    return _conv2d(x, w, padding=((py0, py1), (px0, px1)), groups=groups,
                   flip_weight=flip_weight)
