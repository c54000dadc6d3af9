"""Shared inference-app plumbing (ref `applications/generate_samples.py:51-123`).

Config presets mirror the released models (`generate_samples.py:65-73`):
seg2cat / seg2face at neural-render 128, edge2car at 64; fixed focal lengths
from `generate_video.py:127,137`.
"""

from __future__ import annotations

import os

import numpy as np
import jax

if os.environ.get("PIX2PIX3D_CPU"):
    # serving/debug escape hatch: this image's axon plugin re-asserts
    # JAX_PLATFORMS, so only jax.config can force the CPU backend
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; respect the caller's choice

import jax.numpy as jnp

from .. import config as cfg_mod
from ..models import build_generator
from ..render.camera import fov_to_intrinsics

APP_PRESETS = {
    "seg2cat": dict(preset="seg2cat", neural_rendering_resolution=128,
                    focal_length=4.2647),
    "seg2face": dict(preset="seg2face", neural_rendering_resolution=128,
                     focal_length=4.2647),
    "edge2car": dict(preset="edge2car", neural_rendering_resolution=64,
                     focal_length=1.7074),
}


def build_app_generator(cfg_name, checkpoint=None, **overrides):
    """Build the generator for an app config; load weights if given.

    checkpoint: path to a reference `.pkl` (converted on load) or a native
    `.ckpt` msgpack snapshot (the G_ema subtree is used).  Native
    checkpoints written by the training loop carry a `<ckpt>.json` sidecar
    with the exact g_config; when present it overrides the preset's
    architecture (so apps drive ANY trained checkpoint, e.g. 128^2 bring-up
    runs, not just released-model shapes), and the neural rendering
    resolution scales with the checkpoint's output resolution.
    """
    app = dict(APP_PRESETS[cfg_name])
    gcfg = None
    if checkpoint and not checkpoint.endswith(".pkl"):
        import ast
        import json
        import os
        sidecar = checkpoint + ".json"
        if os.path.exists(sidecar):
            meta = json.load(open(sidecar))
            gc = (meta.get("config", meta) or {}).get("g_config")
            if isinstance(gc, str):
                gc = ast.literal_eval(gc)
            if gc:
                gcfg = gc
                app["neural_rendering_resolution"] = \
                    128 if gc["img_resolution"] >= 512 else 64
    if gcfg is None:
        gcfg = cfg_mod.preset_generator_config(app["preset"], **overrides)
    G = build_generator(**gcfg)
    params = G.init(jax.random.PRNGKey(0))
    if checkpoint:
        if checkpoint.endswith(".pkl"):
            from ..utils.convert import load_reference_pickle, convert_state_dict
            modules = load_reference_pickle(checkpoint)
            source = modules.get("G_ema") or modules.get("G")
            params = convert_state_dict(source, params)
        else:
            from ..train.checkpoint import load_checkpoint
            state, _ = load_checkpoint(checkpoint)
            params = state.get("G_ema", state.get("G"))
    return G, params, app


def intrinsics_for(app):
    f = app["focal_length"]
    return jnp.asarray([[f, 0, 0.5], [0, f, 0.5], [0, 0, 1]], jnp.float32)


def to_uint8(img):
    """[-1,1] float NHWC -> uint8."""
    return np.clip((np.asarray(img) + 1) * 127.5, 0, 255).astype(np.uint8)
