"""Generator EMA (ref `training_loop.py:549-559`), functional."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_beta(batch_size, cur_nimg, ema_kimg, ema_rampup=0.05):
    """Per-step EMA decay with optional ramp-up (host-side floats)."""
    ema_nimg = ema_kimg * 1000
    if ema_rampup is not None:
        ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / max(ema_nimg, 1e-8))


def ema_update(ema_params, params, beta):
    """lerp each leaf: ema = p + (ema - p) * beta.  Buffers (w_avg,
    noise_const) follow the same rule the reference uses for params; the
    reference copies buffers verbatim, which this reproduces when called with
    the buffer subtree and beta=0 — the train step handles that split."""
    return jax.tree_util.tree_map(
        lambda e, p: p + (e - p) * jnp.asarray(beta, p.dtype), ema_params, params)


def copy_buffers(ema_params, params, buffer_names=("w_avg", "noise_const")):
    """Copy buffer leaves verbatim (ref copies buffers, `training_loop.py:557-559`)."""
    def walk(e, p):
        if isinstance(e, dict):
            return {k: (p[k] if k in buffer_names else walk(v, p[k]))
                    for k, v in e.items()}
        return e
    return walk(ema_params, params)
