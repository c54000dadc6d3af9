"""StyleGAN2 synthesis stack (ref `networks_stylegan2.py:277-554`), NHWC.

Mixed precision: blocks flagged `use_fp16` in the reference run in bfloat16
here (TPU-native half type; f32 exponent range makes the reference's
overflow pre-normalization unnecessary).  `force_fp32=True` runs everything
in f32 for parity testing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.bias_act import bias_act, activation_funcs
from ..ops.upfirdn2d import setup_filter, upsample2d
from .layers import FullyConnected, Conv2d, modulated_conv2d
from .mapping import MappingNetwork


class SynthesisLayer:
    """Modulated conv + noise + bias/act (ref `networks_stylegan2.py:277-337`)."""

    def __init__(self, in_channels, out_channels, w_dim, resolution, kernel_size=3,
                 up=1, use_noise=True, activation="lrelu",
                 resample_filter=(1, 3, 3, 1), conv_clamp=None, **unused_kwargs):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.w_dim = w_dim
        self.resolution = resolution
        self.kernel_size = kernel_size
        self.up = up
        self.use_noise = use_noise
        self.activation = activation
        self.conv_clamp = conv_clamp
        self.resample_filter = setup_filter(list(resample_filter))
        self.padding = kernel_size // 2
        self.act_gain = activation_funcs[activation].def_gain
        self.affine = FullyConnected(w_dim, in_channels, bias_init=1)

    def init(self, key):
        k_affine, k_weight, k_noise = jax.random.split(key, 3)
        k = self.kernel_size
        params = {
            "affine": self.affine.init(k_affine),
            "weight": jax.random.normal(
                k_weight, (k, k, self.in_channels, self.out_channels), dtype=jnp.float32),
            "bias": jnp.zeros((self.out_channels,), dtype=jnp.float32),
        }
        if self.use_noise:
            params["noise_const"] = jax.random.normal(
                k_noise, (self.resolution, self.resolution), dtype=jnp.float32)
            params["noise_strength"] = jnp.zeros((), dtype=jnp.float32)
        return params

    def __call__(self, params, x, w, noise_mode="random", rng=None, gain=1.0):
        assert noise_mode in ("random", "const", "none")
        styles = self.affine(params["affine"], w)

        noise = None
        if self.use_noise and noise_mode == "random":
            assert rng is not None, "noise_mode='random' needs an rng key"
            noise = jax.random.normal(
                rng, (x.shape[0], self.resolution, self.resolution, 1),
                dtype=jnp.float32) * params["noise_strength"]
        elif self.use_noise and noise_mode == "const":
            noise = (params["noise_const"] * params["noise_strength"])[None, :, :, None]

        flip_weight = self.up == 1
        x = modulated_conv2d(x=x, weight=params["weight"], styles=styles, noise=noise,
                             up=self.up, padding=self.padding,
                             resample_filter=self.resample_filter,
                             flip_weight=flip_weight)
        act_gain = self.act_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, params["bias"], dim=-1, act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class ToRGBLayer:
    """1x1 modulated conv without demodulation (ref `networks_stylegan2.py:342-362`)."""

    def __init__(self, in_channels, out_channels, w_dim, kernel_size=1, conv_clamp=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.w_dim = w_dim
        self.kernel_size = kernel_size
        self.conv_clamp = conv_clamp
        self.affine = FullyConnected(w_dim, in_channels, bias_init=1)
        self.weight_gain = 1 / math.sqrt(in_channels * kernel_size ** 2)

    def init(self, key):
        k_affine, k_weight = jax.random.split(key)
        k = self.kernel_size
        return {
            "affine": self.affine.init(k_affine),
            "weight": jax.random.normal(
                k_weight, (k, k, self.in_channels, self.out_channels), dtype=jnp.float32),
            "bias": jnp.zeros((self.out_channels,), dtype=jnp.float32),
        }

    def __call__(self, params, x, w):
        styles = self.affine(params["affine"], w) * self.weight_gain
        x = modulated_conv2d(x=x, weight=params["weight"], styles=styles, demodulate=False)
        return bias_act(x, params["bias"], dim=-1, clamp=self.conv_clamp)


class SynthesisBlock:
    """Two synthesis layers + skip-architecture ToRGB (ref `networks_stylegan2.py:367-463`)."""

    def __init__(self, in_channels, out_channels, w_dim, resolution, img_channels,
                 is_last, architecture="skip", resample_filter=(1, 3, 3, 1),
                 conv_clamp=256, use_fp16=False, **layer_kwargs):
        assert architecture in ("orig", "skip", "resnet")
        layer_kwargs.pop("fused_modconv_default", None)  # N/A: input-scaling modconv
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
                                        resolution=resolution, up=2,
                                        resample_filter=resample_filter,
                                        conv_clamp=conv_clamp, **layer_kwargs)
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

        if img is not None:
            img = upsample2d(img, self.resample_filter)
        if self.is_last or self.architecture == "skip":
            y = self.torgb(params["torgb"], x, next_w())
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork:
    """Stack of blocks 4x4 -> img_resolution (ref `networks_stylegan2.py:471-526`)."""

    def __init__(self, w_dim, img_resolution, img_channels, channel_base=32768,
                 channel_max=512, num_fp16_res=4, **block_kwargs):
        assert img_resolution >= 4 and (img_resolution & (img_resolution - 1)) == 0
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(math.log2(img_resolution))
        self.img_channels = img_channels
        self.num_fp16_res = num_fp16_res
        self.block_resolutions = [2 ** i for i in range(2, self.img_resolution_log2 + 1)]
        channels_dict = {res: min(channel_base // res, channel_max)
                         for res in self.block_resolutions}
        fp16_resolution = max(2 ** (self.img_resolution_log2 + 1 - num_fp16_res), 8)

        self.blocks = {}
        self.num_ws = 0
        for res in self.block_resolutions:
            in_channels = channels_dict[res // 2] if res > 4 else 0
            out_channels = channels_dict[res]
            use_fp16 = res >= fp16_resolution
            is_last = res == self.img_resolution
            block = SynthesisBlock(in_channels, out_channels, w_dim=w_dim,
                                   resolution=res, img_channels=img_channels,
                                   is_last=is_last, use_fp16=use_fp16, **block_kwargs)
            self.num_ws += block.num_conv
            if is_last:
                self.num_ws += block.num_torgb
            self.blocks[res] = block

    def init(self, key):
        keys = jax.random.split(key, len(self.block_resolutions))
        return {f"b{res}": self.blocks[res].init(k)
                for res, k in zip(self.block_resolutions, keys)}

    def __call__(self, params, ws, force_fp32=False, noise_mode="random", rng=None,
                 **unused_kwargs):
        assert ws.shape[1] == self.num_ws and ws.shape[2] == self.w_dim
        ws = ws.astype(jnp.float32)

        block_ws = []
        w_idx = 0
        for res in self.block_resolutions:
            block = self.blocks[res]
            block_ws.append(ws[:, w_idx:w_idx + block.num_conv + block.num_torgb])
            w_idx += block.num_conv

        rngs = (jax.random.split(rng, len(self.block_resolutions))
                if rng is not None else [None] * len(self.block_resolutions))
        x = img = None
        for res, cur_ws, r in zip(self.block_resolutions, block_ws, rngs):
            x, img = self.blocks[res](params[f"b{res}"], x, img, cur_ws,
                                      force_fp32=force_fp32, noise_mode=noise_mode, rng=r)
        return img


class Generator:
    """Mapping + synthesis wrapper (ref `networks_stylegan2.py:531-554`);
    `StyleGAN2Backbone` in the tri-plane generators."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 mapping_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.synthesis = SynthesisNetwork(w_dim=w_dim, img_resolution=img_resolution,
                                          img_channels=img_channels, **synthesis_kwargs)
        self.num_ws = self.synthesis.num_ws
        mk = dict(mapping_kwargs or {})
        mk.pop("class_name", None)
        self.mapping = MappingNetwork(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                                      num_ws=self.num_ws, **mk)

    def init(self, key):
        k_map, k_syn = jax.random.split(key)
        return {"mapping": self.mapping.init(k_map),
                "synthesis": self.synthesis.init(k_syn)}

    def __call__(self, params, z, c, truncation_psi=1.0, truncation_cutoff=None,
                 **synthesis_kwargs):
        ws = self.mapping(params["mapping"], z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params["synthesis"], ws, **synthesis_kwargs)
