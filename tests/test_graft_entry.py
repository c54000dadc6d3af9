"""Pin the driver entry points' tiny config to the test suite's.

`__graft_entry__.dryrun_multichip` runs the trainer in per-phase jit mode
(its own cold-compile fix — see Trainer.make_step), so it no longer NEEDS
the monolithic program cache `tests/test_train_step.py` populates.  The
configs are still pinned to each other: the tiny shapes were sized to
this host's compile budget, the per-phase/monolith equivalence test
(`test_jit_phases_matches_monolith`) validates exactly this config, and
`scripts/warm_dryrun.sh` pre-warms whatever the dryrun traces — drift
between the two would silently invalidate all three.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge  # noqa: E402
import test_train_step as tts  # noqa: E402  (tests/ is on sys.path via pytest)


def _canon(obj):
    """Recursively canonicalize a config tree for comparison."""
    if isinstance(obj, dict):
        return {k: _canon(v) for k, v in sorted(obj.items())}
    if isinstance(obj, (list, tuple)):
        return [_canon(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def test_dryrun_generator_config_matches_train_step_test():
    _, cfg_dry = ge._flagship(tiny=True)

    from pix2pix3d_tpu import config as cfg_mod
    cfg_test = cfg_mod.generator_config(
        cfg="afhq", resolution=tts.RES, data_type="seg",
        semantic_channels=tts.SEM, cbase=1024, cmax=32, sr_num_fp16_res=0,
        render_mask=True, gen_pose_cond=True, gpc_reg_prob=0.5)
    cfg_test["rendering_kwargs"].update(depth_resolution=4,
                                        depth_resolution_importance=4)
    cfg_test["mapping_kwargs"]["in_resolution"] = tts.RES
    cfg_test["mapping_kwargs"]["encoder_channel_base"] = 1 / 128

    assert _canon(cfg_dry) == _canon(cfg_test)


def test_dryrun_loss_and_shapes_match_train_step_test():
    """The loss hyperparameters and example-batch shapes must also match for
    the jitted step program to hash-hit the cache."""
    G_test, D_test, Dsem_test, loss_test = tts.tiny_setup()

    # Rebuild what dryrun_multichip constructs (without running a step).
    from pix2pix3d_tpu.nn import DualDiscriminator
    from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss
    G, cfg = ge._flagship(tiny=True)
    res, sem = cfg["img_resolution"], cfg["semantic_channels"]
    assert (res, sem) == (tts.RES, tts.SEM)
    D = DualDiscriminator(c_dim=25, img_resolution=res, img_channels=3,
                          channel_base=1024, channel_max=32, num_fp16_res=0)
    loss = Pix2Pix3DLoss(G, D, D_semantic=DualDiscriminator(
        c_dim=25, img_resolution=res, img_channels=3 + sem,
        channel_base=1024, channel_max=32, num_fp16_res=0),
        lpips=None, r1_gamma=5.0, random_c_prob=0.5, lambda_l1=1.0,
        lambda_lpips=0.0, lambda_D_semantic=0.1, only_raw_recons=True,
        lambda_cross_view=1e-4, neural_rendering_resolution_initial=32)

    skip = {"G", "D", "D_semantic", "lpips", "augment_pipe", "seg_weight",
            "resample_filter"}
    a = {k: v for k, v in vars(loss).items() if k not in skip}
    b = {k: v for k, v in vars(loss_test).items() if k not in skip}
    assert a == b
    np.testing.assert_array_equal(np.asarray(loss.resample_filter),
                                  np.asarray(loss_test.resample_filter))
    assert (loss.seg_weight is None) == (loss_test.seg_weight is None)

    # example-input shapes: one sample per device on an 8-device mesh
    z, mask, pose = ge._example_inputs(G, res, batch=8)
    batch, gen_z, gen_c = tts.make_batch()
    assert z.shape == (8, G.z_dim) and gen_z.shape[1:] == z.shape
    assert mask.shape == batch["mask"].shape
    assert pose.shape == batch["pose"].shape
