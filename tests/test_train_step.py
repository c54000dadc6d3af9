"""Training-step tests on an 8-device virtual CPU mesh.

Covers the analog of the reference's implicit training verification:
- one full iteration (all 6 phases) runs and updates every module
- replicas stay consistent (the analog of `misc.check_ddp_consistency`,
  ref `misc.py:194-205`) — params are replicated, so post-step values must
  be identical across devices by construction of the psum'd update
- losses are finite; EMA moves toward G
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pix2pix3d_tpu import config as cfg_mod
from pix2pix3d_tpu.models import build_generator
from pix2pix3d_tpu.nn import DualDiscriminator
from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss
from pix2pix3d_tpu.parallel.trainer import Trainer, make_mesh
from pix2pix3d_tpu.render.camera import (LookAtPoseSampler, fov_to_intrinsics,
                                         pose_to_conditioning)

RES = 128
SEM = 6
NRR = 32
B = 8  # one per device


def tiny_setup():
    cfg = cfg_mod.generator_config(
        cfg="afhq", resolution=RES, data_type="seg", semantic_channels=SEM,
        cbase=1024, cmax=32, sr_num_fp16_res=0, render_mask=True,
        gen_pose_cond=True, gpc_reg_prob=0.5)
    cfg["rendering_kwargs"].update(depth_resolution=4,
                                   depth_resolution_importance=4)
    cfg["mapping_kwargs"]["in_resolution"] = RES
    cfg["mapping_kwargs"]["encoder_channel_base"] = 1 / 128
    G = build_generator(**cfg)
    D = DualDiscriminator(c_dim=25, img_resolution=RES, img_channels=3,
                          channel_base=1024, channel_max=32, num_fp16_res=0)
    D_sem = DualDiscriminator(c_dim=25, img_resolution=RES,
                              img_channels=3 + SEM, channel_base=1024,
                              channel_max=32, num_fp16_res=0)
    loss = Pix2Pix3DLoss(
        G, D, D_semantic=D_sem, lpips=None, r1_gamma=5.0, random_c_prob=0.5,
        lambda_l1=1.0, lambda_lpips=0.0, lambda_D_semantic=0.1,
        only_raw_recons=True, lambda_cross_view=1e-4,
        neural_rendering_resolution_initial=NRR)
    return G, D, D_sem, loss


def make_batch(rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=B)
    pose = np.asarray(pose_to_conditioning(c2w, fov_to_intrinsics(18.837)))
    batch = {
        "image": jnp.asarray(rng.rand(B, RES, RES, 3).astype(np.float32) * 2 - 1),
        "mask": jnp.asarray(rng.randint(0, SEM, size=(B, RES, RES, 1)),
                            dtype=jnp.float32),
        "pose": jnp.asarray(pose),
    }
    gen_z = jnp.asarray(rng.randn(4, B, 512).astype(np.float32))
    gen_c = jnp.tile(jnp.asarray(pose)[None], (4, 1, 1))
    return batch, gen_z, gen_c


@pytest.mark.slow
def test_full_train_step():
    assert len(jax.devices()) == 8, "expects the 8-device virtual CPU mesh"
    G, D, D_sem, loss = tiny_setup()
    trainer = Trainer(loss, mesh=make_mesh(), g_reg_interval=4,
                      d_reg_interval=16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch, gen_z, gen_c = make_batch()

    # materialize BEFORE the step: `state` is donated by the jitted step,
    # so device references into the old state are invalidated
    g_before = np.asarray(state["G"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"])
    d_before = np.asarray(state["D"]["b4"]["conv"]["weight"])

    # step 0 triggers all reg phases (0 % interval == 0)
    state, stats = trainer.step(state, batch, gen_z, gen_c,
                                jax.random.PRNGKey(1), step_idx=0,
                                cur_nimg=0, batch_size=B)

    g_after = state["G"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"]
    d_after = state["D"]["b4"]["conv"]["weight"]
    ds_after = state["D_semantic"]["b4"]["conv"]["weight"]

    assert not np.allclose(np.asarray(g_before), np.asarray(g_after))
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))
    assert np.isfinite(np.asarray(g_after)).all()
    assert np.isfinite(np.asarray(d_after)).all()
    assert np.isfinite(np.asarray(ds_after)).all()

    # stats moments present and finite
    for key in ("Loss/G/loss", "Loss/D/loss", "Loss/scores/fake",
                "Loss/r1_penalty", "Loss/D/loss_semantic"):
        assert key in stats, sorted(stats)
        m = np.asarray(stats[key])
        assert np.isfinite(m).all(), key

    # At cur_nimg=0 the EMA ramp-up gives beta=0: EMA snaps to G exactly
    # (matches the reference's behavior at the start of training).
    ema = np.asarray(state["G_ema"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"])
    np.testing.assert_allclose(ema, np.asarray(g_after))

    # second step without reg phases compiles its own variant and runs;
    # with cur_nimg>0 the EMA beta is in (0,1) so EMA lags G.
    state, stats = trainer.step(state, batch, gen_z, gen_c,
                                jax.random.PRNGKey(2), step_idx=1,
                                cur_nimg=200_000, batch_size=B)
    g2 = np.asarray(state["G"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"])
    ema2 = np.asarray(state["G_ema"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"])
    assert np.isfinite(g2).all()
    assert not np.allclose(ema2, g2)


@pytest.mark.slow
def test_grad_accumulation_runs():
    """rounds=2 micro-batching (ref batch_gpu rounds) produces finite updates."""
    G, D, D_sem, loss = tiny_setup()
    # 4-device mesh so each device holds 2 samples -> 2 rounds of 1
    trainer = Trainer(loss, mesh=make_mesh(jax.devices()[:4]),
                      g_reg_interval=4, d_reg_interval=16,
                      grad_accum_rounds=2)
    state = trainer.init_state(jax.random.PRNGKey(3))
    batch, gen_z, gen_c = make_batch(rng_seed=1)
    state, stats = trainer.step(state, batch, gen_z, gen_c,
                                jax.random.PRNGKey(4), step_idx=1,
                                cur_nimg=100_000, batch_size=B)
    g = np.asarray(state["G"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"])
    assert np.isfinite(g).all()
    for key in ("Loss/G/loss", "Loss/D/loss"):
        assert np.isfinite(np.asarray(stats[key])).all()


@pytest.mark.slow
def test_jit_phases_matches_monolith():
    """Per-phase jit mode (`jit_phases=True`, the dryrun's cold-compile
    fix) must compute the same update as the monolithic step: same rng
    split, same phase order, same optimizer math.  Only fusion boundaries
    differ, so compare with a tight float tolerance rather than bitwise."""
    G, D, D_sem, loss = tiny_setup()
    batch, gen_z, gen_c = make_batch(rng_seed=4)

    results = {}
    for mode in (False, True):
        trainer = Trainer(loss, mesh=make_mesh(), g_reg_interval=4,
                          d_reg_interval=16, jit_phases=mode)
        state = trainer.init_state(jax.random.PRNGKey(7))
        state, stats = trainer.step(state, batch, gen_z, gen_c,
                                    jax.random.PRNGKey(8), step_idx=0,
                                    cur_nimg=0, batch_size=B)
        results[mode] = (jax.tree_util.tree_map(np.asarray, state),
                         {k: np.asarray(v) for k, v in stats.items()})

    (s_mono, st_mono), (s_phase, st_phase) = results[False], results[True]
    assert sorted(st_mono) == sorted(st_phase)
    for k in st_mono:
        np.testing.assert_allclose(st_phase[k], st_mono[k], rtol=1e-4,
                                    atol=1e-5, err_msg=k)
    flat_m = jax.tree_util.tree_leaves_with_path(s_mono)
    flat_p = dict(jax.tree_util.tree_flatten_with_path(s_phase)[0])
    for path, leaf in flat_m:
        np.testing.assert_allclose(
            flat_p[path], leaf, rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_full_train_step_frustum_sampler():
    """Training mode of the gather-free frustum renderer (--sampler
    frustum): all 6 phases differentiate through the slab chain (shears,
    windowed banded matmuls, per-chunk remat scan) with zero
    gather/scatter in the G backward.  Updates every module, finite
    stats, replica-consistent by construction."""
    G, D, D_sem, loss = tiny_setup()
    G.rendering_kwargs["sampler"] = "frustum"
    G.rendering_kwargs["frustum_depth_steps"] = 8
    G.rendering_kwargs["frustum_chunk"] = 4
    trainer = Trainer(loss, mesh=make_mesh(), g_reg_interval=4,
                      d_reg_interval=16)
    state = trainer.init_state(jax.random.PRNGKey(5))
    batch, gen_z, gen_c = make_batch(rng_seed=2)

    g_before = np.asarray(
        state["G"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"])
    state, stats = trainer.step(state, batch, gen_z, gen_c,
                                jax.random.PRNGKey(6), step_idx=0,
                                cur_nimg=0, batch_size=B)
    g_after = state["G"]["backbone"]["synthesis"]["b4"]["conv1"]["weight"]
    dec_after = state["G"]["decoder"]["net"]["fc0"]["weight"]
    assert not np.allclose(g_before, np.asarray(g_after))
    assert np.isfinite(np.asarray(g_after)).all()
    assert np.isfinite(np.asarray(dec_after)).all()
    for key in ("Loss/G/loss", "Loss/D/loss", "Loss/G/loss_cross_view",
                "Loss/D/loss_semantic"):
        assert key in stats, sorted(stats)
        assert np.isfinite(np.asarray(stats[key])).all(), key
