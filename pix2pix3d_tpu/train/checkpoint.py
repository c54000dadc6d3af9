"""Checkpoint save/resume.

Replaces the reference's source-embedding pickles (`persistence.py:37-99`,
snapshot at `training_loop.py:720-737`) with msgpack pytree snapshots: the
model is reconstructed from config (stored alongside as JSON), parameters are
plain arrays — no code execution on load, robust across refactors, and
(unlike the reference) the optimizer state IS checkpointed, so resume is
exact.

Partial/fuzzy resume reproduces `misc.copy_params_and_buffers`
(`misc.py:157-176`): name-matched copy with `allow_mismatch` and a
`_semantic`-suffix fallback so unconditional EG3D checkpoints can seed the
conditional nets.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..utils.misc import tree_paths


def _snapshot_host(state):
    """Device->host fetch of the full train state, decoupled from donation.

    The naive per-leaf `np.asarray(state)` streams ~2 GB straight out of
    the SAME buffers the next donated train step will overwrite; on the
    v5e runtime a post-tick-0 device hang was traced to this window
    (NOTES_PERF round 2e).  Instead: ONE jitted identity program copies
    the tree into fresh (non-donated) buffers, blocks until the copy is
    complete, then fetches from the copy."""
    leaves = jax.tree_util.tree_leaves(state)
    if not any(isinstance(l, jax.Array) and not l.is_deleted() and
               list(l.devices())[0].platform not in ("cpu",)
               for l in leaves):
        return jax.tree_util.tree_map(np.asarray, state)
    snap = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))(state)
    jax.block_until_ready(snap)
    host = jax.device_get(snap)
    del snap
    return host


def save_checkpoint(path, state, config=None, step=None):
    # to_state_dict converts optax NamedTuple states into plain dicts that
    # msgpack can serialize; from_state_dict restores them on load.
    state = serialization.to_state_dict(state)
    payload = {"state": _snapshot_host(state)}
    if step is not None:
        payload["step"] = step
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if config is not None:
        with open(path + ".json", "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(path, state_template=None):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = payload["state"]
    if state_template is not None:
        state = serialization.from_state_dict(state_template, state)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    return state, payload.get("step")


def load_ema_params(path):
    """G_ema params from a full training checkpoint OR a durable EMA-only
    export (`scripts/export_ema.py`).  bf16-stored leaves are upcast to
    f32 so the compute precision policy (`ops/precision.py`) behaves
    identically for both artifact kinds."""
    state, step = load_checkpoint(path)
    ema = state["G_ema"] if "G_ema" in state else state["state"]["G_ema"]
    ema = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        ema)
    return ema, step


def copy_params_fuzzy(src_tree, dst_tree, allow_mismatch=True, verbose=False):
    """Name-matched partial init (ref `misc.py:157-176`): copy every leaf of
    `src_tree` whose path exists in `dst_tree` with a matching shape; paths
    containing a `*_semantic` component additionally fall back to the
    non-semantic name in `src_tree` (so EG3D pickles seed both branches)."""
    src = {p: v for p, v in tree_paths(src_tree)}

    def lookup(path):
        if path in src:
            return src[path]
        stripped = tuple(p.replace("_semantic", "") for p in path)
        return src.get(stripped)

    copied = [0]

    def walk(dst, prefix=()):
        if isinstance(dst, dict):
            return {k: walk(v, prefix + (k,)) for k, v in dst.items()}
        v = lookup(prefix)
        if v is not None and tuple(np.shape(v)) == tuple(dst.shape):
            copied[0] += 1
            return jnp.asarray(v, dst.dtype)
        if v is not None and not allow_mismatch:
            raise ValueError(f"shape mismatch at {'.'.join(prefix)}")
        return dst

    out = walk(dst_tree)
    if verbose:
        print(f"copy_params_fuzzy: copied {copied[0]} leaves")
    return out
