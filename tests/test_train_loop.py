"""End-to-end training-loop smoke test: synthetic dataset, 2 ticks, snapshots."""

import json
import os

import numpy as np
import PIL.Image
import pytest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("loopdata")
    img_dir = root / "imgs"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)

    # plausible poses
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)
    labels = []
    for i in range(16):
        img = rng.randint(0, 255, size=(128, 128, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(img_dir / f"i{i:03d}.png")
        mask = rng.randint(0, 6, size=(128, 128), dtype=np.uint8)
        PIL.Image.fromarray(mask).save(mask_dir / f"i{i:03d}.png")
        c2w = LookAtPoseSampler.sample(None, np.pi / 2 + 0.1 * i, np.pi / 2,
                                       [0, 0, -0.06], radius=2.7, batch_size=1)
        pose = np.asarray(pose_to_conditioning(
            c2w, fov_to_intrinsics(18.837)))[0]
        labels.append([f"i{i:03d}.png", [float(x) for x in pose]])
    with open(img_dir / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(img_dir), str(mask_dir)


@pytest.mark.slow
def test_training_loop_two_ticks(tiny_dataset, tmp_path):
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.train.loop import training_loop

    img_dir, mask_dir = tiny_dataset
    g_config = cfg_mod.generator_config(
        cfg="afhq", resolution=128, data_type="seg", semantic_channels=6,
        cbase=512, cmax=16, sr_num_fp16_res=0, render_mask=True,
        gen_pose_cond=True)
    g_config["rendering_kwargs"].update(depth_resolution=2,
                                        depth_resolution_importance=2)
    g_config["mapping_kwargs"]["in_resolution"] = 128
    g_config["mapping_kwargs"]["encoder_channel_base"] = 1 / 256

    run_dir = str(tmp_path / "run")
    state = training_loop(
        run_dir=run_dir,
        dataset_kwargs=dict(path=img_dir, mask_path=mask_dir, data_type="seg",
                            use_labels=True),
        g_config=g_config,
        d_kwargs=dict(channel_base=512, channel_max=16, num_fp16_res=0),
        loss_kwargs=dict(r1_gamma=1.0, lambda_l1=1.0, lambda_lpips=0.0,
                         lambda_D_semantic=0.1, only_raw_recons=True,
                         neural_rendering_resolution_initial=16),
        use_d_semantic=True,
        batch_size=8,
        total_kimg=0.024,      # 24 imgs = 3 steps of 8 (tick = every step)
        kimg_per_tick=0.008,
        snapshot_ticks=1,
        image_snapshot_ticks=None,  # skip image grid (slow G_ema forward)
        random_seed=0,
    )
    assert state is not None
    files = os.listdir(run_dir)
    assert "stats.jsonl" in files
    assert any(f.startswith("network-") for f in files)
    assert "reals.png" in files and "mask.png" in files
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        rec = json.loads(f.readline())
    assert "Loss/G/loss" in rec
