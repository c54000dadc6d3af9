"""Super-resolution modules (ref `training/superresolution.py`), NHWC.

Each takes (rgb `[N,h,w,3orS]`, feature image `[N,h,w,32]`, ws) and returns
the upsampled image; all reuse the last w broadcast over 3 layers
(`superresolution.py:46`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops.upfirdn2d import setup_filter, upsample2d
from .synthesis import SynthesisLayer, ToRGBLayer, SynthesisBlock
from .layers import Conv2d


class SynthesisBlockNoUp:
    """SynthesisBlock minus the upsample (ref `superresolution.py:191-290`)."""

    def __init__(self, in_channels, out_channels, w_dim, resolution, img_channels,
                 is_last, architecture="skip", resample_filter=(1, 3, 3, 1),
                 conv_clamp=256, use_fp16=False, **layer_kwargs):
        assert architecture in ("orig", "skip", "resnet")
        layer_kwargs.pop("fused_modconv_default", None)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.w_dim = w_dim
        self.resolution = resolution
        self.img_channels = img_channels
        self.is_last = is_last
        self.architecture = architecture
        self.use_fp16 = use_fp16
        self.resample_filter = setup_filter(list(resample_filter))
        self.num_conv = 0
        self.num_torgb = 0

        self.conv0 = None
        if in_channels != 0:
            self.conv0 = SynthesisLayer(in_channels, out_channels, w_dim=w_dim,
                                        resolution=resolution, conv_clamp=conv_clamp,
                                        **layer_kwargs)
            self.num_conv += 1
        self.conv1 = SynthesisLayer(out_channels, out_channels, w_dim=w_dim,
                                    resolution=resolution, conv_clamp=conv_clamp,
                                    **layer_kwargs)
        self.num_conv += 1
        self.torgb = None
        if is_last or architecture == "skip":
            self.torgb = ToRGBLayer(out_channels, img_channels, w_dim=w_dim,
                                    conv_clamp=conv_clamp)
            self.num_torgb += 1
        self.skip = None
        if in_channels != 0 and architecture == "resnet":
            self.skip = Conv2d(in_channels, out_channels, kernel_size=1, bias=False,
                               up=2, resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 5)
        params = {}
        if self.in_channels == 0:
            params["const"] = jax.random.normal(
                keys[0], (self.resolution, self.resolution, self.out_channels),
                dtype=jnp.float32)
        if self.conv0 is not None:
            params["conv0"] = self.conv0.init(keys[1])
        params["conv1"] = self.conv1.init(keys[2])
        if self.torgb is not None:
            params["torgb"] = self.torgb.init(keys[3])
        if self.skip is not None:
            params["skip"] = self.skip.init(keys[4])
        return params

    def __call__(self, params, x, img, ws, force_fp32=False, noise_mode="random",
                 rng=None, **unused_kwargs):
        assert ws.shape[1] == self.num_conv + self.num_torgb
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        if self.in_channels == 0:
            x = jnp.tile(params["const"].astype(dtype)[None], (ws.shape[0], 1, 1, 1))
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = self.conv1(params["conv1"], x, next_w(), noise_mode=noise_mode, rng=rngs[0])
        elif self.architecture == "resnet":
            y = self.skip(params["skip"], x, gain=math.sqrt(0.5))
            x = self.conv0(params["conv0"], x, next_w(), noise_mode=noise_mode, rng=rngs[0])
            x = self.conv1(params["conv1"], x, next_w(), noise_mode=noise_mode,
                           rng=rngs[1], gain=math.sqrt(0.5))
            x = y + x
        else:
            x = self.conv0(params["conv0"], x, next_w(), noise_mode=noise_mode, rng=rngs[0])
            x = self.conv1(params["conv1"], x, next_w(), noise_mode=noise_mode, rng=rngs[1])

        # No img upsample here (that is the whole point of NoUp).
        if self.is_last or self.architecture == "skip":
            y = self.torgb(params["torgb"], x, next_w())
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class _SRBase:
    """Common forward: resize inputs, run two blocks with last-w broadcast."""

    input_resolution: int
    sr_antialias: bool
    resize_condition: str = "ne"  # 'ne' (!=) or 'lt' (<), mirrors the refs

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {"block0": self.block0.init(k0), "block1": self.block1.init(k1)}

    def __call__(self, params, rgb, x, ws, force_fp32=False, noise_mode="random",
                 rng=None, **unused_kwargs):
        ws = jnp.tile(ws[:, -1:, :], (1, 3, 1))
        need = (x.shape[1] < self.input_resolution if self.resize_condition == "lt"
                else x.shape[1] != self.input_resolution)
        if need:
            x = resize_bilinear(x, self.input_resolution, antialias=self.sr_antialias)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=self.sr_antialias)
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        x, rgb = self.block0(params["block0"], x, rgb, ws, force_fp32=force_fp32,
                             noise_mode=noise_mode, rng=rngs[0])
        x, rgb = self.block1(params["block1"], x, rgb, ws, force_fp32=force_fp32,
                             noise_mode=noise_mode, rng=rngs[1])
        return rgb


def _blk(cls, in_ch, out_ch, res, img_ch, is_last, use_fp16, block_kwargs):
    return cls(in_ch, out_ch, w_dim=512, resolution=res, img_channels=img_ch,
               is_last=is_last, use_fp16=use_fp16,
               conv_clamp=(256 if use_fp16 else None), **block_kwargs)


class SuperresolutionHybrid8X(_SRBase):
    """128 -> 512 (ref `superresolution.py:29-56`)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 **block_kwargs):
        assert img_resolution == 512
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlock, channels, 128, 256, 3, False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 128, 64, 512, 3, True, use_fp16, block_kwargs)


class SuperresolutionHybrid4X(_SRBase):
    """128 -> 256 (ref `superresolution.py:62-88`)."""

    resize_condition = "lt"

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 **block_kwargs):
        assert img_resolution == 256
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlockNoUp, channels, 128, 128, 3, False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 128, 64, 256, 3, True, use_fp16, block_kwargs)


class SuperresolutionHybrid4XSemantic(_SRBase):
    """128 -> 256 semantic-channel variant.

    NOTE: referenced by `train.py:394` but MISSING from the reference repo (a
    256-res semantic config would crash there).  Provided here for
    completeness, mirroring the 2X/8XDC semantic pattern.
    """

    resize_condition = "lt"

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 semantic_channels, **block_kwargs):
        assert img_resolution == 256
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlockNoUp, channels, 128, 128, semantic_channels,
                           False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 128, 64, 256, semantic_channels, True,
                           use_fp16, block_kwargs)


class SuperresolutionHybrid2X(_SRBase):
    """64 -> 128 (ref `superresolution.py:94-121`)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 **block_kwargs):
        assert img_resolution == 128
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 64
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlockNoUp, channels, 128, 64, 3, False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 128, 64, 128, 3, True, use_fp16, block_kwargs)


class SuperresolutionHybrid2XSemantic(_SRBase):
    """64 -> 128, semantic channels (ref `superresolution.py:127-154`)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 semantic_channels, **block_kwargs):
        assert img_resolution == 128
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 64
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlockNoUp, channels, 128, 64, semantic_channels,
                           False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 128, 64, 128, semantic_channels, True,
                           use_fp16, block_kwargs)


class SuperresolutionHybridDeepfp32(_SRBase):
    """Legacy 128 -> 256 (ref `superresolution.py:160-186`)."""

    resize_condition = "lt"

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias=False,
                 **block_kwargs):
        assert img_resolution == 256
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = False  # legacy module predates antialias flag
        self.block0 = _blk(SynthesisBlockNoUp, channels, 128, 128, 3, False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 128, 64, 256, 3, True, use_fp16, block_kwargs)


class SuperresolutionHybrid8XDC(_SRBase):
    """128 -> 512, wider channels (ref `superresolution.py:297-323`); used by
    the 512-res shipped configs (`train.py:390`)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 **block_kwargs):
        assert img_resolution == 512
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlock, channels, 256, 256, 3, False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 256, 128, 512, 3, True, use_fp16, block_kwargs)


class SuperresolutionHybrid8XDCSemantic(_SRBase):
    """128 -> 512 semantic-channel variant (ref `superresolution.py:328-354`)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 semantic_channels, **block_kwargs):
        assert img_resolution == 512
        _strip(block_kwargs)
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self.block0 = _blk(SynthesisBlock, channels, 256, 256, semantic_channels,
                           False, use_fp16, block_kwargs)
        self.block1 = _blk(SynthesisBlock, 256, 128, 512, semantic_channels, True,
                           use_fp16, block_kwargs)


def _strip(block_kwargs):
    """Drop reference kwargs that are ignored there too (`superresolution.py:31`)."""
    for k in ("num_fp16_res", "conv_clamp", "channel_base", "channel_max"):
        block_kwargs.pop(k, None)


def dual_sr_compatible(sr_rgb, sr_sem):
    """True when the rgb and semantic SR modules can run as one vmapped
    (grouped-conv) program: identical block topology and channel widths —
    only the ToRGB output width may differ (3 vs semantic_channels)."""
    def sig(m):
        return [(type(b).__name__, b.in_channels, b.out_channels,
                 b.resolution, b.architecture, b.use_fp16)
                for b in (m.block0, m.block1)]
    return (sig(sr_rgb) == sig(sr_sem)
            and sr_rgb.input_resolution == sr_sem.input_resolution
            and sr_rgb.resize_condition == sr_sem.resize_condition
            and sr_rgb.sr_antialias == sr_sem.sr_antialias)


def _pad_last(a, width):
    if a.shape[-1] == width:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, width - a.shape[-1])]
    return jnp.pad(a, pad)


def dual_superresolution(sr_rgb, sr_sem, p_rgb, p_sem, rgb, x_rgb, sem, x_sem,
                         ws, noise_mode="random", rngs=(None, None),
                         force_fp32=False):
    """Serving fast path: run the rgb and semantic SR stacks as ONE vmapped
    forward (the measured dual-SR stage is 2x ~155 ms/batch-32, ~36% of
    the serving budget; the two separate programs leave half the MXU work
    in small-channel 512^2 convs that cannot overlap each other).

    The two modules are structurally identical apart from the ToRGB output
    width (3 vs semantic_channels) — `dual_sr_compatible` gates this — so
    their parameter trees stack leaf-wise after zero-padding ToRGB
    weight/bias (and the skip images) to the max width.  The padding is
    EXACT, not approximate: ToRGB is a non-demodulated 1x1 modconv + bias
    + clamp, so output channels are independent and zero weight columns /
    zero bias produce exactly-zero padded channels, which stay zero
    through the (linear, per-channel) skip-image upsampling and the final
    slice.  XLA's vmap batching rule turns the per-branch weights into
    grouped convolutions: one pass over each spatial resolution computes
    both stacks.

    Returns (sr_rgb_image [N,H,W,3], sr_sem_image [N,H,W,S]) equal to the
    two separate module calls up to fusion-boundary rounding."""
    w0 = max(p_rgb["block0"]["torgb"]["weight"].shape[-1],
             p_sem["block0"]["torgb"]["weight"].shape[-1])
    w1 = max(p_rgb["block1"]["torgb"]["weight"].shape[-1],
             p_sem["block1"]["torgb"]["weight"].shape[-1])
    assert w0 == w1, "blocks disagree on img width"
    sem_ch = sem.shape[-1]

    def pad_tree(p):
        out = {k: dict(v) if isinstance(v, dict) else v for k, v in p.items()}
        for blk in ("block0", "block1"):
            t = dict(out[blk]["torgb"])
            t["weight"] = _pad_last(t["weight"], w0)
            t["bias"] = _pad_last(t["bias"], w0)
            out[blk]["torgb"] = t
        return out

    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]),
                                     pad_tree(p_rgb), pad_tree(p_sem))
    img2 = jnp.stack([_pad_last(rgb, w0), _pad_last(sem, w0)])
    x2 = jnp.stack([x_rgb, x_sem])

    def run(p, img, x, rng):
        return sr_rgb(p, img, x, ws, force_fp32=force_fp32,
                      noise_mode=noise_mode, rng=rng)

    if rngs[0] is not None:
        out2 = jax.vmap(run, in_axes=(0, 0, 0, 0))(
            stacked, img2, x2, jnp.stack(list(rngs)))
    else:
        out2 = jax.vmap(lambda p, img, x: run(p, img, x, None),
                        in_axes=(0, 0, 0))(stacked, img2, x2)
    return out2[0][..., :3], out2[1][..., :sem_ch]


_SR_REGISTRY = {
    "SuperresolutionHybrid8X": SuperresolutionHybrid8X,
    "SuperresolutionHybrid4X": SuperresolutionHybrid4X,
    "SuperresolutionHybrid4X_semantic": SuperresolutionHybrid4XSemantic,
    "SuperresolutionHybrid2X": SuperresolutionHybrid2X,
    "SuperresolutionHybrid2X_semantic": SuperresolutionHybrid2XSemantic,
    "SuperresolutionHybridDeepfp32": SuperresolutionHybridDeepfp32,
    "SuperresolutionHybrid8XDC": SuperresolutionHybrid8XDC,
    "SuperresolutionHybrid8XDC_semantic": SuperresolutionHybrid8XDCSemantic,
}


def build_superresolution(name, **kwargs):
    """Construct an SR module by (reference-compatible) class name."""
    name = name.split(".")[-1]
    return _SR_REGISTRY[name](**kwargs)
