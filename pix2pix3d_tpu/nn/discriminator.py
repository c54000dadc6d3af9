"""Discriminators (ref `networks_stylegan2.py:559-796`,
`training/dual_discriminator.py`), NHWC."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import setup_filter, downsample2d, upsample2d
from ..ops.resize import resize_bilinear
from .layers import Conv2d, FullyConnected, minibatch_stddev
from .mapping import MappingNetwork


class DiscriminatorBlock:
    """Resnet-architecture downsampling block (ref `networks_stylegan2.py:559-643`)."""

    def __init__(self, in_channels, tmp_channels, out_channels, resolution,
                 img_channels, first_layer_idx, architecture="resnet",
                 activation="lrelu", resample_filter=(1, 3, 3, 1), conv_clamp=None,
                 use_fp16=False, freeze_layers=0, **unused_kwargs):
        assert in_channels in (0, tmp_channels)
        assert architecture in ("orig", "skip", "resnet")
        self.in_channels = in_channels
        self.resolution = resolution
        self.img_channels = img_channels
        self.first_layer_idx = first_layer_idx
        self.architecture = architecture
        self.use_fp16 = use_fp16
        self.resample_filter = setup_filter(list(resample_filter))

        self.num_layers = 0

        def next_trainable():
            idx = self.first_layer_idx + self.num_layers
            self.num_layers += 1
            return idx >= freeze_layers

        self.fromrgb = None
        if in_channels == 0 or architecture == "skip":
            self.fromrgb = Conv2d(img_channels, tmp_channels, kernel_size=1,
                                  activation=activation, trainable=next_trainable(),
                                  conv_clamp=conv_clamp)
        self.conv0 = Conv2d(tmp_channels, tmp_channels, kernel_size=3,
                            activation=activation, trainable=next_trainable(),
                            conv_clamp=conv_clamp)
        self.conv1 = Conv2d(tmp_channels, out_channels, kernel_size=3,
                            activation=activation, down=2, trainable=next_trainable(),
                            resample_filter=resample_filter, conv_clamp=conv_clamp)
        self.skip = None
        if architecture == "resnet":
            self.skip = Conv2d(tmp_channels, out_channels, kernel_size=1, bias=False,
                               down=2, trainable=next_trainable(),
                               resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {}
        if self.fromrgb is not None:
            params["fromrgb"] = self.fromrgb.init(keys[0])
        params["conv0"] = self.conv0.init(keys[1])
        params["conv1"] = self.conv1.init(keys[2])
        if self.skip is not None:
            params["skip"] = self.skip.init(keys[3])
        return params

    def __call__(self, params, x, img, force_fp32=False):
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32

        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = self.fromrgb(params["fromrgb"], img)
            x = x + y if x is not None else y
            img = (downsample2d(img, self.resample_filter)
                   if self.architecture == "skip" else None)

        if self.architecture == "resnet":
            y = self.skip(params["skip"], x, gain=math.sqrt(0.5))
            x = self.conv0(params["conv0"], x)
            x = self.conv1(params["conv1"], x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = self.conv0(params["conv0"], x)
            x = self.conv1(params["conv1"], x)
        return x, img


class DiscriminatorEpilogue:
    """4x4 epilogue with minibatch-std + conditioning projection
    (ref `networks_stylegan2.py:677-733`)."""

    def __init__(self, in_channels, cmap_dim, resolution, img_channels,
                 architecture="resnet", mbstd_group_size=4, mbstd_num_channels=1,
                 activation="lrelu", conv_clamp=None, **unused_kwargs):
        assert architecture in ("orig", "skip", "resnet")
        self.in_channels = in_channels
        self.cmap_dim = cmap_dim
        self.resolution = resolution
        self.img_channels = img_channels
        self.architecture = architecture
        self.mbstd_group_size = mbstd_group_size
        self.mbstd_num_channels = mbstd_num_channels

        self.fromrgb = None
        if architecture == "skip":
            self.fromrgb = Conv2d(img_channels, in_channels, kernel_size=1,
                                  activation=activation)
        self.conv = Conv2d(in_channels + mbstd_num_channels, in_channels,
                           kernel_size=3, activation=activation, conv_clamp=conv_clamp)
        self.fc = FullyConnected(in_channels * resolution ** 2, in_channels,
                                 activation=activation)
        self.out = FullyConnected(in_channels, 1 if cmap_dim == 0 else cmap_dim)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {}
        if self.fromrgb is not None:
            params["fromrgb"] = self.fromrgb.init(keys[0])
        params["conv"] = self.conv.init(keys[1])
        params["fc"] = self.fc.init(keys[2])
        params["out"] = self.out.init(keys[3])
        return params

    def __call__(self, params, x, img, cmap, force_fp32=False):
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + self.fromrgb(params["fromrgb"], img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = minibatch_stddev(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = self.conv(params["conv"], x)
        # NHWC flatten differs from the reference's NCHW flatten; the
        # checkpoint converter permutes the fc weight accordingly.
        x = self.fc(params["fc"], x.reshape(x.shape[0], -1))
        x = self.out(params["out"], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1 / math.sqrt(self.cmap_dim))
        return x


class _DiscriminatorBase:
    """Shared trunk construction for the discriminator variants."""

    def __init__(self, c_dim, img_resolution, img_channels, architecture="resnet",
                 channel_base=32768, channel_max=512, num_fp16_res=4, conv_clamp=256,
                 cmap_dim=None, block_kwargs=None, mapping_kwargs=None,
                 epilogue_kwargs=None, **unused_kwargs):
        self.c_dim = c_dim
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(math.log2(img_resolution))
        self.img_channels = img_channels
        self.block_resolutions = [2 ** i for i in range(self.img_resolution_log2, 2, -1)]
        channels_dict = {res: min(channel_base // res, channel_max)
                         for res in self.block_resolutions + [4]}
        fp16_resolution = max(2 ** (self.img_resolution_log2 + 1 - num_fp16_res), 8)

        if cmap_dim is None:
            cmap_dim = channels_dict[4]
        if c_dim == 0:
            cmap_dim = 0
        self.cmap_dim = cmap_dim

        common = dict(img_channels=img_channels, architecture=architecture,
                      conv_clamp=conv_clamp)
        self.blocks = {}
        cur_layer_idx = 0
        for res in self.block_resolutions:
            in_channels = channels_dict[res] if res < img_resolution else 0
            tmp_channels = channels_dict[res]
            out_channels = channels_dict[res // 2]
            use_fp16 = res >= fp16_resolution
            block = DiscriminatorBlock(in_channels, tmp_channels, out_channels,
                                       resolution=res, first_layer_idx=cur_layer_idx,
                                       use_fp16=use_fp16, **(block_kwargs or {}), **common)
            self.blocks[res] = block
            cur_layer_idx += block.num_layers

        self.mapping = None
        if c_dim > 0:
            self.mapping = MappingNetwork(z_dim=0, c_dim=c_dim, w_dim=cmap_dim,
                                          num_ws=None, w_avg_beta=None,
                                          **(mapping_kwargs or {}))
        self.b4 = DiscriminatorEpilogue(channels_dict[4], cmap_dim=cmap_dim,
                                        resolution=4, **(epilogue_kwargs or {}), **common)

    def init(self, key):
        keys = jax.random.split(key, len(self.block_resolutions) + 2)
        params = {f"b{res}": self.blocks[res].init(k)
                  for res, k in zip(self.block_resolutions, keys)}
        if self.mapping is not None:
            params["mapping"] = self.mapping.init(keys[-2])
        params["b4"] = self.b4.init(keys[-1])
        return params

    def _trunk(self, params, img, c, force_fp32=False):
        x = None
        for res in self.block_resolutions:
            x, img = self.blocks[res](params[f"b{res}"], x, img, force_fp32=force_fp32)
        cmap = None
        if self.c_dim > 0:
            cmap = self.mapping(params["mapping"], None, c)
        return self.b4(params["b4"], x, img, cmap, force_fp32=force_fp32)


class Discriminator(_DiscriminatorBase):
    """Plain StyleGAN2 discriminator over an NHWC image tensor
    (ref `networks_stylegan2.py:738-796`)."""

    def __call__(self, params, img, c, force_fp32=False, **unused_kwargs):
        return self._trunk(params, img, c, force_fp32=force_fp32)


class SingleDiscriminator(_DiscriminatorBase):
    """Discriminator over `img['image']` only (ref `dual_discriminator.py:21-82`)."""

    def __call__(self, params, img, c, force_fp32=False, **unused_kwargs):
        return self._trunk(params, img["image"], c, force_fp32=force_fp32)


def filtered_resizing(image, size, f, filter_mode="antialiased"):
    """Resize NHWC image to `size` (ref `dual_discriminator.py:86-102`)."""
    if filter_mode == "antialiased":
        return resize_bilinear(image, size, antialias=True)
    if filter_mode == "classic":
        x = upsample2d(image, f, up=2)
        x = resize_bilinear(x, size * 2 + 2, antialias=False)
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if filter_mode == "none":
        return resize_bilinear(image, size, antialias=False)
    if isinstance(filter_mode, float):
        assert 0 < filter_mode < 1
        filtered = resize_bilinear(image, size, antialias=True)
        aliased = resize_bilinear(image, size, antialias=False)
        return (1 - filter_mode) * aliased + filter_mode * filtered
    raise ValueError(filter_mode)


class DualDiscriminator(_DiscriminatorBase):
    """Dual discrimination over [image, upsampled raw render] channel concat
    (ref `dual_discriminator.py:107-175`).  The semantic discriminator
    `D_semantic` is this same class built with
    img_channels = rgb + semantic channels (ref `training_loop.py:308`).

    `raw_fade` (traced scalar, default 1) scales the raw branch; scheduling
    it toward 0 reproduces `DummyDualDiscriminator`
    (ref `dual_discriminator.py:180-248`, a stateful per-forward counter
    there — here the schedule is explicit like blur_sigma)."""

    def __init__(self, c_dim, img_resolution, img_channels, disc_c_noise=0, **kwargs):
        super().__init__(c_dim, img_resolution, img_channels * 2, **kwargs)
        self.disc_c_noise = disc_c_noise
        self.resample_filter = setup_filter([1, 3, 3, 1])

    def __call__(self, params, img, c, force_fp32=False, rng=None, raw_fade=None,
                 **unused_kwargs):
        image_raw = filtered_resizing(img["image_raw"], size=img["image"].shape[1],
                                      f=self.resample_filter)
        if raw_fade is not None:  # may be a traced scalar (scheduled fade)
            image_raw = image_raw * raw_fade
        x = jnp.concatenate([img["image"], image_raw], axis=-1)

        trunk_x = None
        for res in self.block_resolutions:
            trunk_x, x = self.blocks[res](params[f"b{res}"], trunk_x, x,
                                          force_fp32=force_fp32)
        cmap = None
        if self.c_dim > 0:
            if self.disc_c_noise > 0:
                assert rng is not None
                c = c + jax.random.normal(rng, c.shape, dtype=c.dtype) \
                    * jnp.std(c, axis=0) * self.disc_c_noise
            cmap = self.mapping(params["mapping"], None, c)
        return self.b4(params["b4"], trunk_x, x, cmap, force_fp32=force_fp32)
