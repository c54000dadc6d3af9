"""Filtered leaky-ReLU: up-FIR -> gain * lrelu + clamp -> down-FIR (NHWC).

TPU-native equivalent of the 1.8k-LoC reference CUDA kernel family
(`torch_utils/ops/filtered_lrelu.{cu,cpp,h}`); the behavioral spec is the
reference composition `_filtered_lrelu_ref` (`filtered_lrelu.py:124-158`).

On TPU the composition IS the right implementation: the FIR stages are
single fused dilated convs (see `ops/upfirdn2d`), the activation fuses into
them, and the reference's packed 2-bit sign buffer — a memory trick for
cheap backward on GPUs — is unnecessary because `jax.checkpoint` /
rematerialization covers the same tradeoff.  Only StyleGAN3's
`SynthesisLayer` uses this op; no shipped pix2pix3D config instantiates it.
"""

from __future__ import annotations

import math

from .bias_act import bias_act
from .upfirdn2d import upfirdn2d, _parse_padding


def filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                   gain=math.sqrt(2), slope=0.2, clamp=None, flip_filter=False):
    """See module docstring.  x: `[N, H, W, C]`, b: `[C]` or None."""
    px0, px1, py0, py1 = _parse_padding(padding)
    x = bias_act(x, b, dim=-1)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
