"""Build a fine-tune seed checkpoint from a durable EMA-only export.

The host wipes delete every full training checkpoint in `.runs/`; the only
surviving trained artifacts are the tracked EMA exports
(`scripts/export_ema.py`, G_ema-only).  A fine-tune resumed from one via
`--resume_partial` would leave G random (copy_params_fuzzy matches
top-level keys, and the export has only "G_ema"), so this script re-saves
the export with the SAME params under both "G" and "G_ema" (upcast to f32,
matching training storage).  D intentionally stays un-seeded — the export
never contained it; the consumer must treat the result as a G-seeded,
fresh-D fine-tune and say so in any artifact it produces.

Usage: python scripts/make_ft_seed.py EMA.ckpt SEED.ckpt
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from pix2pix3d_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint)

    state, step = load_checkpoint(src)
    ema = state["G_ema"] if "G_ema" in state else state["state"]["G_ema"]
    ema = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        ema)
    config = None
    if os.path.exists(src + ".json"):
        sidecar = json.load(open(src + ".json"))
        config = sidecar.get("config", sidecar)
    save_checkpoint(dst, {"G": ema, "G_ema": ema}, config=config, step=step)
    print(f"seed {src} -> {dst} (G + G_ema from EMA, D unseeded, "
          f"step={step})")


if __name__ == "__main__":
    main()
