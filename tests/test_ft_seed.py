"""Unit test for scripts/make_ft_seed.py — rebuilding a fine-tune seed
from a durable EMA-only export (G and G_ema seeded from the export, D
absent, bf16 leaves upcast to f32 training storage)."""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from pix2pix3d_tpu.train.checkpoint import load_checkpoint, save_checkpoint

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_make_ft_seed_roundtrip(tmp_path):
    ema = {"w": jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3)
                            ).astype(jnp.bfloat16),
           "b": jnp.zeros((3,), jnp.float32)}
    src = str(tmp_path / "ema.ckpt")
    save_checkpoint(src, {"G_ema": ema}, config={"z_dim": 4}, step=123)

    dst = str(tmp_path / "seed.ckpt")
    r = subprocess.run([sys.executable, "scripts/make_ft_seed.py", src, dst],
                       cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    state, step = load_checkpoint(dst)
    assert step == 123
    assert set(state) == {"G", "G_ema"}, "D must stay unseeded"
    for k in ("w", "b"):
        assert state["G"][k].dtype == jnp.float32, "bf16 upcast to f32"
        np.testing.assert_array_equal(np.asarray(state["G"][k]),
                                      np.asarray(state["G_ema"][k]))
    np.testing.assert_array_equal(
        np.asarray(state["G"]["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3))
    sidecar = json.load(open(dst + ".json"))
    cfg = sidecar.get("config", sidecar)
    assert cfg["z_dim"] == 4
