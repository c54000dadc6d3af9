"""Conditional mapping networks: label/edge map (+z) -> ws.

Ref `training/triplane_cond.py:202-592`.  The `_disentangle` variants are the
ones used by every shipped config (`train.py:347,351`): the label-map encoder
produces the first `geometry_layer` W+ latents (geometry), z drives the
remaining broadcast style latents (appearance).

Note: the reference's Edge*_disentangle accepts a `geometry_layer` kwarg on
the CLI but hardcodes 7 internally (`triplane_cond.py:525` — the CLI value is
swallowed by `**unused`).  We make it configurable *and* default to 7,
superset behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .encoder import Encoder
from .layers import FullyConnected, normalize_2nd_moment


def _one_hot_mask(mask, num_channels):
    """mask `[N, H, W, 1]` integer labels -> `[N, H, W, C]` one-hot float."""
    return jax.nn.one_hot(mask[..., 0].astype(jnp.int32), num_channels,
                          dtype=jnp.float32)


class _CondMappingBase:
    def __init__(self, z_dim, c_dim, in_resolution, in_channels, w_dim, num_ws,
                 num_layers=8, embed_features=None, layer_features=None,
                 activation="lrelu", lr_multiplier=0.01, w_avg_beta=0.995,
                 one_hot=True, encoder_channel_base=1, encoder_channel_max=512,
                 encoder_num_fp16_res=0, **unused):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.in_resolution = in_resolution
        self.in_channels = in_channels
        self.w_dim = w_dim
        self.num_ws = num_ws
        self.num_layers = num_layers
        self.w_avg_beta = w_avg_beta
        self.one_hot = one_hot
        self.encoder_channel_base = encoder_channel_base
        self.encoder_channel_max = encoder_channel_max
        # serving option: run the trailing N encoder resolutions in bf16
        # tensors (params unchanged — compute dtype only, like the
        # reference's D num_fp16_res); the 512^2 mask-encoder convs are a
        # measured serving hotspot (NOTES_PERF round 2)
        self.encoder_num_fp16_res = encoder_num_fp16_res
        self.embed_features = embed_features if embed_features is not None else w_dim
        self.layer_features = layer_features if layer_features is not None else w_dim

    def _make_fcs(self, features_list, activation, lr_multiplier):
        self.fcs = [
            FullyConnected(features_list[i], features_list[i + 1],
                           activation=activation, lr_multiplier=lr_multiplier)
            for i in range(self.num_layers)
        ]

    def _mask_input(self, batch):
        mask = batch["mask"]
        if self.one_hot:
            return _one_hot_mask(mask, self.in_channels)
        return mask.astype(jnp.float32)

    def updated_w_avg(self, params, ws):
        w = jax.lax.stop_gradient(ws)
        mean = jnp.mean(w, axis=0)
        if mean.ndim == 2 and params["w_avg"].ndim == 1:
            mean = mean[0]
        return mean + self.w_avg_beta * (params["w_avg"] - mean)


class MaskMappingNetwork(_CondMappingBase):
    """Entangled variant: encoder W fused with z by concat before the FC stack
    (ref `triplane_cond.py:202-296`)."""

    def __init__(self, *args, activation="lrelu", lr_multiplier=0.01, **kwargs):
        super().__init__(*args, activation=activation, lr_multiplier=lr_multiplier,
                         **kwargs)
        ef = self.embed_features
        if self.c_dim == 0:
            features = [self.z_dim + ef] + [self.layer_features] * (self.num_layers - 1) + [self.w_dim]
        else:
            features = [self.z_dim + ef * 2] + [self.layer_features] * (self.num_layers - 1) + [self.w_dim]
        self.embed = FullyConnected(self.c_dim, ef) if self.c_dim > 0 else None
        self.embed_mask = Encoder(img_resolution=self.in_resolution,
                                  img_channels=self.in_channels,
                                  channel_base=self.encoder_channel_base,
                                  channel_max=self.encoder_channel_max,
                                  num_fp16_res=self.encoder_num_fp16_res,
                                  conv_clamp=(256 if self.encoder_num_fp16_res
                                              else None),
                                  model_kwargs={"num_ws": 1, "w_dim": ef,
                                                "output_mode": "W"})
        self._make_fcs(features, activation, lr_multiplier)

    def init(self, key):
        keys = jax.random.split(key, self.num_layers + 2)
        params = {"embed_mask": self.embed_mask.init(keys[0])}
        if self.embed is not None:
            params["embed"] = self.embed.init(keys[1])
        for i, fc in enumerate(self.fcs):
            params[f"fc{i}"] = fc.init(keys[i + 2])
        if self.num_ws is not None and self.w_avg_beta is not None:
            params["w_avg"] = jnp.zeros((self.w_dim,), dtype=jnp.float32)
        return params

    def __call__(self, params, z=None, c=None, batch=None, truncation_psi=1.0,
                 truncation_cutoff=None, **unused_kwargs):
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        mask = self._mask_input(batch)
        y = self.embed_mask(params["embed_mask"], mask)["ws"][:, 0]
        y = normalize_2nd_moment(y)
        x = jnp.concatenate([x, y], axis=1) if x is not None else y
        if self.c_dim > 0:
            ce = normalize_2nd_moment(self.embed(params["embed"], c.astype(jnp.float32)))
            x = jnp.concatenate([x, ce], axis=1)

        for i, fc in enumerate(self.fcs):
            x = fc(params[f"fc{i}"], x)

        if self.num_ws is not None:
            x = jnp.tile(x[:, None, :], (1, self.num_ws, 1))
        if truncation_psi != 1:
            x = params["w_avg"] + truncation_psi * (x - params["w_avg"])
        return x


class MaskMappingNetworkDisentangle(_CondMappingBase):
    """Disentangled variant used for seg configs (ref `triplane_cond.py:301-399`):
    encoder emits `geometry_layer` W+ latents prepended to broadcast z-styles."""

    def __init__(self, *args, activation="lrelu", lr_multiplier=0.01,
                 geometry_layer=7, **kwargs):
        super().__init__(*args, activation=activation, lr_multiplier=lr_multiplier,
                         **kwargs)
        self.geometry_layer = geometry_layer
        if self.c_dim == 0:
            features = [self.z_dim] + [self.layer_features] * (self.num_layers - 1) + [self.w_dim]
        else:
            features = [self.z_dim + self.embed_features] + \
                [self.layer_features] * (self.num_layers - 1) + [self.w_dim]
        self.embed = FullyConnected(self.c_dim, self.embed_features) if self.c_dim > 0 else None
        self.embed_mask = Encoder(img_resolution=self.in_resolution,
                                  img_channels=self.in_channels,
                                  channel_base=self.encoder_channel_base,
                                  channel_max=self.encoder_channel_max,
                                  num_fp16_res=self.encoder_num_fp16_res,
                                  conv_clamp=(256 if self.encoder_num_fp16_res
                                              else None),
                                  model_kwargs={"num_ws": self.geometry_layer,
                                                "w_dim": self.w_dim,
                                                "output_mode": "W+"})
        self._make_fcs(features, activation, lr_multiplier)

    def init(self, key):
        keys = jax.random.split(key, self.num_layers + 2)
        params = {"embed_mask": self.embed_mask.init(keys[0])}
        if self.embed is not None:
            params["embed"] = self.embed.init(keys[1])
        for i, fc in enumerate(self.fcs):
            params[f"fc{i}"] = fc.init(keys[i + 2])
        if self.num_ws is not None and self.w_avg_beta is not None:
            params["w_avg"] = jnp.zeros((self.num_ws, self.w_dim), dtype=jnp.float32)
        return params

    def __call__(self, params, z=None, c=None, batch=None, truncation_psi=1.0,
                 truncation_cutoff=None, **unused_kwargs):
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            ce = normalize_2nd_moment(self.embed(params["embed"], c.astype(jnp.float32)))
            x = jnp.concatenate([x, ce], axis=1) if x is not None else ce

        for i, fc in enumerate(self.fcs):
            x = fc(params[f"fc{i}"], x)

        mask = self._mask_input(batch)
        y = self.embed_mask(params["embed_mask"], mask)["ws"]  # [N, G, w_dim]

        if self.num_ws is not None:
            x = jnp.tile(x[:, None, :], (1, self.num_ws - self.geometry_layer, 1))
            x = jnp.concatenate([y, x], axis=1)

        if truncation_psi != 1:
            x = params["w_avg"] + truncation_psi * (x - params["w_avg"])
        return x


class EdgeMappingNetwork(MaskMappingNetwork):
    """Edge-map variant of the entangled mapping (ref `triplane_cond.py:404-493`):
    raw 1-channel edge image, no one-hot."""

    def __init__(self, *args, **kwargs):
        kwargs["one_hot"] = False
        super().__init__(*args, **kwargs)


class EdgeMappingNetworkDisentangle(MaskMappingNetworkDisentangle):
    """Edge-map variant of the disentangled mapping (ref `triplane_cond.py:499-592`)."""

    def __init__(self, *args, **kwargs):
        kwargs["one_hot"] = False
        super().__init__(*args, **kwargs)
