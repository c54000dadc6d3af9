"""Camera-orbit video app (ref `applications/generate_video.py`).

One mapping pass, then `n_frames` synthesis passes under a LookAt orbit
(yaw +-0.35, pitch +-0.25 sinusoid, ref `generate_video.py:54-69`).

TPU-native speedups over the reference:
- the tri-plane backbone runs ONCE and its planes are cached for every frame
  (the reference recomputes them per frame despite having `cache_backbone`)
- all frames render through one jitted frame function (poses are data).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from .common import build_app_generator, intrinsics_for, to_uint8
from ..render.camera import LookAtPoseSampler, pose_to_conditioning
from ..train.viz import color_mask


def orbit_poses(app, n_frames=120, yaw_range=0.35, pitch_range=0.25,
                radius=2.7, pivot=(0, 0, 0)):
    intr = intrinsics_for(app)
    poses = []
    for i in range(n_frames):
        t = i / n_frames
        yaw = np.pi / 2 + yaw_range * np.sin(2 * np.pi * t)
        pitch = np.pi / 2 - 0.05 + pitch_range * np.cos(2 * np.pi * t)
        c2w = LookAtPoseSampler.sample(None, yaw, pitch, list(pivot),
                                       radius=radius, batch_size=1)
        poses.append(np.asarray(pose_to_conditioning(c2w, intr))[0])
    return np.stack(poses)


def render_video(G, params, app, mask, cond_pose, seed=0, n_frames=120,
                 radius=2.7, pivot=(0, 0, 0)):
    z = jax.random.normal(jax.random.PRNGKey(seed), (1, G.z_dim))
    mask_in = jnp.asarray(mask, jnp.float32)[None]
    if G.data_type == "edge":
        mask_in = -(mask_in / 127.5 - 1)
    cond_pose = jnp.asarray(cond_pose, jnp.float32)[None]
    batch = {"mask": mask_in, "pose": cond_pose}
    ws = G.mapping(params, z, cond_pose, batch)

    # Cache the planes: backbone once, synthesis per frame on cached planes.
    planes_img = G.backbone.synthesis(params["backbone"]["synthesis"], ws,
                                      noise_mode="const")
    from ..models.triplane import _reshape_planes
    planes = _reshape_planes(planes_img)

    nrr = app["neural_rendering_resolution"]

    @jax.jit
    def frame(pose):
        out = G.synthesis(params, ws, pose[None],
                          neural_rendering_resolution=nrr, noise_mode="const",
                          det=True, planes=planes)
        return out["image"][0], out["semantic"][0]

    poses = orbit_poses(app, n_frames=n_frames, radius=radius, pivot=pivot)
    frames, labels = [], []
    for pose in poses:
        img, sem = frame(jnp.asarray(pose))
        frames.append(to_uint8(img))
        if G.data_type == "seg":
            labels.append(color_mask(np.argmax(np.asarray(sem), -1)[None])[0])
    return frames, labels


def save_gif(frames, path, fps=60):
    import PIL.Image
    imgs = [PIL.Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(int(1000 / fps), 10), loop=0)


def main():
    import PIL.Image
    p = argparse.ArgumentParser()
    p.add_argument("--network", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--cfg", required=True,
                   choices=["seg2cat", "seg2face", "edge2car"])
    p.add_argument("--input", required=True)
    p.add_argument("--random_seed", type=int, default=0)
    p.add_argument("--frames", type=int, default=120)
    args = p.parse_args()

    G, params, app = build_app_generator(args.cfg, checkpoint=args.network)
    mask = np.array(PIL.Image.open(args.input))
    if mask.ndim == 3:
        mask = mask[..., 0]
    mask = mask[:, :, None]

    radius = 1.7 if args.cfg == "edge2car" else 2.7
    pivot = (0, 0, -0.06) if args.cfg == "seg2cat" else (0, 0, 0)
    cond_pose = orbit_poses(app, 1, 0, 0, radius=radius, pivot=pivot)[0]

    frames, labels = render_video(G, params, app, mask, cond_pose,
                                  seed=args.random_seed, n_frames=args.frames,
                                  radius=radius, pivot=pivot)
    os.makedirs(args.outdir, exist_ok=True)
    save_gif(frames, os.path.join(args.outdir,
                                  f"{args.cfg}_{args.random_seed}_color.gif"))
    if labels:
        save_gif(labels, os.path.join(args.outdir,
                                      f"{args.cfg}_{args.random_seed}_label.gif"))
    print(f"saved {len(frames)} frames to {args.outdir}")


if __name__ == "__main__":
    main()
