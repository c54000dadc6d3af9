"""Checkpoint save/load + fuzzy partial-init tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                            copy_params_fuzzy)


def test_save_load_roundtrip_with_optimizer_state(tmp_path):
    import optax
    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)},
              "b": jnp.ones((4,))}
    opt = optax.adam(1e-3)
    state = {"G": params, "opt_G": opt.init(params), "step_marker": jnp.asarray(7)}
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(path, state, config={"x": 1}, step=1234)

    loaded, step = load_checkpoint(path, state)
    assert step == 1234
    np.testing.assert_array_equal(np.asarray(loaded["G"]["a"]["w"]),
                                  np.asarray(params["a"]["w"]))
    # optax NamedTuple state restored with correct structure
    leaves_a = jax.tree_util.tree_leaves(state["opt_G"])
    leaves_b = jax.tree_util.tree_leaves(loaded["opt_G"])
    assert len(leaves_a) == len(leaves_b)


def test_copy_params_fuzzy_semantic_fallback():
    """EG3D-style partial init: `*_semantic` names fall back to base names
    (ref `misc.py:157-176`)."""
    src = {"superresolution": {"w": np.full((3,), 2.0)},
           "decoder": {"net": {"fc0": {"weight": np.full((4, 5), 3.0)}}},
           "other": {"x": np.zeros((2,))}}
    dst = {
        "superresolution": {"w": jnp.zeros((3,))},
        "superresolution_semantic": {"w": jnp.zeros((3,))},  # fallback hit
        "decoder": {"net": {"fc0": {"weight": jnp.zeros((4, 5))}},
                    "net_semantic": {"fc0": {"weight": jnp.zeros((4, 5))}}},
        "mismatched": {"x": jnp.zeros((9,))},  # shape mismatch -> keep dst
    }
    out = copy_params_fuzzy(src, dst)
    np.testing.assert_allclose(np.asarray(out["superresolution"]["w"]), 2.0)
    np.testing.assert_allclose(
        np.asarray(out["superresolution_semantic"]["w"]), 2.0)
    np.testing.assert_allclose(
        np.asarray(out["decoder"]["net_semantic"]["fc0"]["weight"]), 3.0)
    np.testing.assert_allclose(np.asarray(out["mismatched"]["x"]), 0.0)


def test_lpips_shapes_and_symmetry():
    from pix2pix3d_tpu.train.lpips import LPIPS
    lp = LPIPS()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    b = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    d = np.asarray(lp(a, b))
    assert d.shape == (2,)
    assert (d >= 0).all()
    np.testing.assert_allclose(np.asarray(lp(a, a)), 0.0, atol=1e-6)
    np.testing.assert_allclose(d, np.asarray(lp(b, a)), rtol=1e-5)


def test_ema_export_and_load(tmp_path):
    """Durable EMA-only export (scripts/export_ema.py semantics): bf16-cast
    G_ema + config sidecar round-trips through load_ema_params, which
    upcasts bf16 leaves to f32 and accepts both full-state and EMA-only
    artifacts."""
    from pix2pix3d_tpu.train.checkpoint import load_ema_params
    ema = {"backbone": {"w": jnp.arange(12.0).reshape(3, 4)},
           "ints": jnp.asarray([1, 2], dtype=jnp.int32)}
    full = str(tmp_path / "full.ckpt")
    save_checkpoint(full, {"G_ema": ema, "D": {"w": jnp.ones((2,))}},
                    config={"g_config": "{'x': 1}"}, step=99)
    p_full, step_full = load_ema_params(full)
    assert step_full == 99

    # the export: bf16-cast float leaves, EMA only
    ema_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        ema)
    exp = str(tmp_path / "ema.ckpt")
    save_checkpoint(exp, {"G_ema": ema_bf16},
                    config={"g_config": "{'x': 1}"}, step=99)
    p_exp, _ = load_ema_params(exp)
    assert p_exp["backbone"]["w"].dtype == jnp.float32  # upcast on load
    assert p_exp["ints"].dtype == jnp.int32             # non-float untouched
    np.testing.assert_allclose(np.asarray(p_exp["backbone"]["w"]),
                               np.asarray(p_full["backbone"]["w"]),
                               atol=0.05)  # bf16 storage rounding only


def test_precise_scope_restores_policy():
    """ops.precision.precise_scope pins HIGHEST inside, restores the fast
    policy outside (used by rendering_kwargs['sr_sem_f32'])."""
    from pix2pix3d_tpu.ops import precision
    precision.fast_f32(True)
    try:
        assert precision.conv_precision(jnp.float32) != \
            jax.lax.Precision.HIGHEST
        with precision.precise_scope(True):
            assert precision.conv_precision(jnp.float32) == \
                jax.lax.Precision.HIGHEST
        assert precision.conv_precision(jnp.float32) != \
            jax.lax.Precision.HIGHEST
        with precision.precise_scope(False):  # no-op scope
            assert precision.conv_precision(jnp.float32) != \
                jax.lax.Precision.HIGHEST
    finally:
        precision.fast_f32(False)
    assert precision.conv_precision(jnp.float32) == jax.lax.Precision.HIGHEST


def test_precise_scope_levels():
    """precise_scope(level=...) grades the pinned f32 matmul precision
    (rendering_kwargs['sr_sem_precision']): 'default' removes only the
    bf16 activation storage, 'high' is bf16x3, 'highest' full f32."""
    from pix2pix3d_tpu.ops import precision
    precision.fast_f32(True)
    try:
        with precision.precise_scope(True, level="default"):
            assert precision.conv_precision(jnp.float32) == \
                jax.lax.Precision.DEFAULT
        with precision.precise_scope(True, level="high"):
            assert precision.conv_precision(jnp.float32) == \
                jax.lax.Precision.HIGH
            # bf16 tensors never take the override
            assert precision.conv_precision(jnp.bfloat16) == \
                jax.lax.Precision.DEFAULT
        with precision.precise_scope(True, level="highest"):
            assert precision.conv_precision(jnp.float32) == \
                jax.lax.Precision.HIGHEST
        # scope restored: fast policy again
        assert precision.conv_precision(jnp.float32) == \
            jax.lax.Precision.DEFAULT
    finally:
        precision.fast_f32(False)
