"""Unit test for scripts/export_ema.py — the durable EMA-only export that
makes quality-gate inputs survive host wipes (VERDICT r4 item 5)."""
import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from pix2pix3d_tpu.train.checkpoint import (load_checkpoint,
                                            load_ema_params,
                                            save_checkpoint)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_export_ema_bf16_and_reload(tmp_path):
    full = {
        "G": {"w": jnp.ones((2, 2), jnp.float32)},
        "G_ema": {"w": jnp.asarray([[1.0, 2.0], [3.0, 4.0]], jnp.float32)},
        "D": {"w": jnp.zeros((2, 2), jnp.float32)},
    }
    src = str(tmp_path / "full.ckpt")
    save_checkpoint(src, full, config={"z_dim": 8}, step=77)

    dst = str(tmp_path / "ema.ckpt")
    r = subprocess.run([sys.executable, "scripts/export_ema.py", src, dst],
                       cwd=ROOT, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr

    state, step = load_checkpoint(dst)
    assert step == 77
    assert set(state) == {"G_ema"}, "export must be EMA-only"
    assert state["G_ema"]["w"].dtype == jnp.bfloat16
    # export is much smaller than the full state (here: 1 of 3 trees)
    assert os.path.getsize(dst) < os.path.getsize(src)

    # gate/app consumers load via load_ema_params -> f32 upcast
    params, step2 = load_ema_params(dst)
    assert step2 == 77
    assert params["w"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(params["w"]),
                                  [[1.0, 2.0], [3.0, 4.0]])
    cfg = json.load(open(dst + ".json")).get("config",
                                             json.load(open(dst + ".json")))
    assert cfg["z_dim"] == 8
