"""Label-map encoder: conv pyramid -> W / W+ latents.

Ref `training/triplane_cond.py:66-196` (StyleNeRF-style Encoder).  The
shipped pix2pix3D configs use only the plain, non-progressive path with
`output_mode` in {'W', 'W+'}; the progressive-growing and camera-prediction
branches are dead in every released model and are not reproduced here.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .discriminator import DiscriminatorBlock
from .layers import EqualConv2d


class Encoder:
    def __init__(self, img_resolution, img_channels, bottleneck_factor=2,
                 architecture="resnet", channel_base=1, channel_max=512,
                 num_fp16_res=0, conv_clamp=None, block_kwargs=None,
                 model_kwargs=None, **unused):
        model_kwargs = model_kwargs or {}
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(math.log2(img_resolution))
        self.img_channels = img_channels
        self.block_resolutions = [2 ** i for i in range(self.img_resolution_log2,
                                                        bottleneck_factor, -1)]
        self.architecture = architecture
        self.output_mode = model_kwargs.get("output_mode", "styles")
        assert self.output_mode in ("W", "W+", "None"), \
            "only W/W+ output modes are used by pix2pix3D"

        channel_base = int(channel_base * 32768)
        channels_dict = {res: min(channel_base // res, channel_max)
                         for res in self.block_resolutions + [4]}
        fp16_resolution = max(2 ** (self.img_resolution_log2 + 1 - num_fp16_res), 8)
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
                                       use_fp16=use_fp16, **(block_kwargs or {}),
                                       **common)
            self.blocks[res] = block
            cur_layer_idx += block.num_layers

        self.num_ws = model_kwargs.get("num_ws", 0)
        self.n_latents = self.num_ws if self.output_mode == "W+" else (
            0 if self.output_mode == "None" else 1)
        self.w_dim = model_kwargs.get("w_dim", 512)
        self.add_dim = model_kwargs.get("add_dim", 0)
        self.out_dim = self.w_dim * self.n_latents + self.add_dim
        assert self.out_dim > 0
        assert self.block_resolutions[-1] // 2 == 4
        self.projector = EqualConv2d(channels_dict[4], self.out_dim, 4, padding=0,
                                     bias=False)

    def init(self, key):
        keys = jax.random.split(key, len(self.block_resolutions) + 1)
        params = {f"b{res}": self.blocks[res].init(k)
                  for res, k in zip(self.block_resolutions, keys)}
        params["projector"] = self.projector.init(keys[-1])
        return params

    def __call__(self, params, img, force_fp32=False):
        """img: `[N, H, W, C]` one-hot/edge map.  Returns dict with 'ws'."""
        x = None
        for res in self.block_resolutions:
            x, img = self.blocks[res](params[f"b{res}"], x, img, force_fp32=force_fp32)

        out = self.projector(params["projector"], x)[:, 0, 0, :]  # [N, out_dim]
        if self.output_mode == "W+":
            ws = out.reshape(out.shape[0], self.num_ws, self.w_dim)
        elif self.output_mode == "W":
            ws = jnp.tile(out[:, None, :], (1, self.num_ws, 1))
        else:
            ws = None
        return {"ws": ws}
