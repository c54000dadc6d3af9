"""Latent mapping network z (+c) -> w (ref `MappingNetwork`,
`networks_stylegan2.py:193-272`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import FullyConnected, normalize_2nd_moment


class MappingNetwork:
    """z + optional label c -> broadcast w's.

    `w_avg` is a tracked buffer in the params tree (updated functionally by
    the training step via :meth:`updated_w_avg`); truncation at inference
    lerps toward it like the reference.
    """

    def __init__(self, z_dim, c_dim, w_dim, num_ws, num_layers=8,
                 embed_features=None, layer_features=None, activation="lrelu",
                 lr_multiplier=0.01, w_avg_beta=0.998, **unused_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.num_ws = num_ws
        self.num_layers = num_layers
        self.w_avg_beta = w_avg_beta

        if embed_features is None:
            embed_features = w_dim
        if c_dim == 0:
            embed_features = 0
        if layer_features is None:
            layer_features = w_dim
        features = [z_dim + embed_features] + [layer_features] * (num_layers - 1) + [w_dim]

        self.embed = FullyConnected(c_dim, embed_features) if c_dim > 0 else None
        self.fcs = [
            FullyConnected(features[i], features[i + 1], activation=activation,
                           lr_multiplier=lr_multiplier)
            for i in range(num_layers)
        ]

    def init(self, key):
        keys = jax.random.split(key, self.num_layers + 1)
        params = {}
        if self.embed is not None:
            params["embed"] = self.embed.init(keys[0])
        for i, fc in enumerate(self.fcs):
            params[f"fc{i}"] = fc.init(keys[i + 1])
        if self.num_ws is not None and self.w_avg_beta is not None:
            params["w_avg"] = jnp.zeros((self.w_dim,), dtype=jnp.float32)
        return params

    def __call__(self, params, z, c=None, truncation_psi=1.0, truncation_cutoff=None):
        x = None
        if self.z_dim > 0:
            assert z.shape[1] == self.z_dim
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(self.embed(params["embed"], c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for i, fc in enumerate(self.fcs):
            x = fc(params[f"fc{i}"], x)

        if self.num_ws is not None:
            x = jnp.tile(x[:, None, :], (1, self.num_ws, 1))

        if truncation_psi != 1:
            assert self.w_avg_beta is not None
            w_avg = params["w_avg"]
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + truncation_psi * (x - w_avg)
            else:
                head = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x

    def updated_w_avg(self, params, ws):
        """New w_avg buffer after seeing a batch of (unbroadcast) w's."""
        w = ws if ws.ndim == 2 else ws[:, 0]
        mean = jnp.mean(jax.lax.stop_gradient(w), axis=0)
        return mean + self.w_avg_beta * (params["w_avg"] - mean)
