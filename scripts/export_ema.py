"""Export a durable EMA-only checkpoint from a full training checkpoint.

VERDICT r4 item 5: quality-gate JSONs must name artifacts that survive a
host wipe — the full train state (params + opt + EMA, ~2 GB) is too big to
track, but the gates only render through G_ema.  This exports
{"G_ema": <params cast bf16>} + the config sidecar: ~1/12 the size, small
enough to commit, and sufficient to re-run every quality gate and app.

bf16 storage rounds the weights (documented tradeoff); consumers upcast to
f32 at load via `checkpoint.load_ema_params` so compute precision policy
is unchanged.  Ref analog: reference snapshots are self-contained pickles
(`training_loop.py:720-737`) precisely so results stay reproducible.

Usage: python scripts/export_ema.py SRC.ckpt DST.ckpt
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from pix2pix3d_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    state, step = load_checkpoint(src)
    ema = state["G_ema"] if "G_ema" in state else state["state"]["G_ema"]
    ema = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, ema)
    config = None
    if os.path.exists(src + ".json"):
        config = json.load(open(src + ".json")).get("config")
        if config is None:
            config = json.load(open(src + ".json"))
    save_checkpoint(dst, {"G_ema": ema}, config=config, step=step)
    sz = os.path.getsize(dst) / 1e6
    print(f"exported G_ema (bf16) {src} -> {dst}  {sz:.1f} MB  step={step}")


if __name__ == "__main__":
    main()
