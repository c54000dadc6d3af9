"""Phase-level bisect harness for v5e train-step device faults.

Round-2 findings (each case is one ~10-min device compile; run ONE case,
wait ~5 min after any fault before the next — a killed/faulted client
wedges the chip):

    g_fwd_grad   OK      grad of the full G forward (gather renderer
                         backward, remat, point_chunk 16384)
    d_fwd        OK      grad through D on real images WITH blur
    d_main       OK      G no-grad + D grad with blur
    cv_noargmax  OK      the cross-view triple render, mask passthrough
    cv_argmax    OK      ... with the argmax feedback
    g_main CV=0  OK      full Gmain phase without cross-view
    g_main CV>0  FAULT   "TPU worker crashed" — only the combination

=> no single op faults; the monolithic Gmain+cross-view program does.
Worked around by loss.cross_view_prep (split program, bit-equal).

Usage:
    python scripts/bisect_train_fault.py g_main        # env: CV=0/1e-4,
    BLUR=0/1, REMAT=0/1
"""
import sys, os
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

which = sys.argv[1] if len(sys.argv) > 1 else "g_main"

from pix2pix3d_tpu import config as cfg_mod
from pix2pix3d_tpu.models import build_generator
from pix2pix3d_tpu.nn.discriminator import DualDiscriminator
from pix2pix3d_tpu.train.loss import Pix2Pix3DLoss
from pix2pix3d_tpu.render.camera import (LookAtPoseSampler, fov_to_intrinsics,
                                         pose_to_conditioning)

res = 128
cfg = cfg_mod.generator_config(cfg="afhq", resolution=res, data_type="seg",
                               semantic_channels=6, sr_num_fp16_res=4,
                               render_mask=True, gen_pose_cond=True)
cfg["rendering_kwargs"]["point_chunk"] = 16384
cfg["mapping_kwargs"]["in_resolution"] = res
G = build_generator(**cfg)
D = DualDiscriminator(c_dim=25, img_resolution=res, img_channels=3,
                      num_fp16_res=4, conv_clamp=256,
                      epilogue_kwargs={"mbstd_group_size": 4})
loss = Pix2Pix3DLoss(G, D, D_semantic=None, lpips=None, r1_gamma=5.0,
                     random_c_prob=0.5, lambda_l1=1.0, lambda_lpips=0.0,
                     only_raw_recons=True, lambda_cross_view=float(os.environ.get("CV", "1e-4")),
                     remat=os.environ.get("REMAT", "1") == "1", neural_rendering_resolution_initial=64)
pg = G.init(jax.random.PRNGKey(0))
pd = D.init(jax.random.PRNGKey(1))
rng = np.random.RandomState(0)
b = 8
c2w = LookAtPoseSampler.sample(None, np.pi/2, np.pi/2, [0,0,-0.06],
                               radius=2.7, batch_size=b)
pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
batch = {"image": jnp.asarray(rng.rand(b,res,res,3).astype(np.float32)*2-1),
         "mask": jnp.asarray(rng.randint(0,6,(b,res,res,1)).astype(np.float32)),
         "pose": pose}
z = jnp.asarray(rng.randn(b,512).astype(np.float32))
blur = (jnp.asarray(10.0), 30) if os.environ.get("BLUR", "1") == "1" else 0.0

def g_main(p):
    l, _ = loss.g_main(p, pd, None, batch, z, pose, jax.random.PRNGKey(2), blur, 64)
    return l
def g_fwd(p):
    out, ws = loss.run_G(p, z, batch, pose, 64, jax.random.PRNGKey(7))
    return jnp.sum(out["image_raw"]) + jnp.sum(out["image"])
def d_main(p):
    l, (s, aux) = loss.d_main(p, pg, batch, z, pose, jax.random.PRNGKey(3), blur, 64)
    return l
def d_r1(p):
    l, _ = loss.d_r1(p, batch, jax.random.PRNGKey(4), blur, 64)
    return l
def g_reg(p):
    l, _ = loss.g_reg(p, batch, z, jax.random.PRNGKey(5))
    return l

def d_fwd(p):
    real = loss._real_pair(batch, 64, blur)
    out = loss.run_D(p, real, batch["pose"], blur, rng=jax.random.PRNGKey(6))
    return jnp.sum(out)

from pix2pix3d_tpu.train.loss import smooth_l1
def _cv(p, use_argmax):
    sg = lambda t: jax.tree_util.tree_map(jax.lax.stop_gradient, t)
    gi_rc, _ = loss.run_G(p, z, batch, pose, 64, jax.random.PRNGKey(11))
    gi_rc = sg(gi_rc)
    if use_argmax:
        proj = jnp.argmax(gi_rc["semantic"], axis=-1,
                          keepdims=True).astype(jnp.float32)
    else:
        proj = batch["mask"]
    bp = dict(batch); bp["mask"] = proj
    gi_proj, _ = loss.run_G(p, z, bp, batch["pose"], 64, jax.random.PRNGKey(12))
    gi_rec, _ = loss.run_G(p, z, batch, batch["pose"], 64, jax.random.PRNGKey(13))
    return smooth_l1(gi_proj["semantic_raw"], sg(gi_rec)["semantic_raw"])
def cv_noargmax(p):
    return _cv(p, False)
def cv_argmax(p):
    return _cv(p, True)

fns = {"g_main": (g_main, pg), "g_fwd_grad": (g_fwd, pg),
       "cv_noargmax": (cv_noargmax, pg), "cv_argmax": (cv_argmax, pg),
       "d_main": (d_main, pd), "d_r1": (d_r1, pd), "g_reg": (g_reg, pg),
       "d_fwd": (d_fwd, pd)}
fn, p = fns[which]
print(f"running grad({which}) ...", flush=True)
val = jax.jit(jax.grad(fn))(p)
leaf = jax.tree_util.tree_leaves(val)[0]
print(which, "OK", float(np.asarray(leaf).ravel()[0]), flush=True)
