"""Procedural multi-view dataset for the training sanity run.

No real data is reachable from this environment (zero egress), so the
reference recipe's AFHQ-cat sanity check (VERDICT #8) is stood in for by a
*structured* synthetic dataset: scenes of 2-4 shaded ellipsoids with
distinct semantic classes, ray-traced analytically from LookAtPoseSampler
cameras at the seg2cat orbit (radius 2.7, fov 18.837), with the true pose
and the true per-pixel class map written alongside each image.  This gives
the conditional GAN a real 3D-consistent signal: masks correlate with
images, poses are exact, appearance varies smoothly with viewpoint.

Layout matches ImageSegFolderDataset: imgs/ (+dataset.json) and masks/.

`--cfg shapenet` switches the camera/scene geometry to the edge2car recipe
(ref train.py:451-460: radius 1.7, pivot origin, box_warp 1.6, white
background, full-orbit yaw, fov 45 deg == the reference apps' shapenet
focal 1.7074) so an edge-conditioned run trains against cameras the
shapenet rendering_kwargs actually cover.

Usage: python scripts/make_synth_dataset.py OUTDIR [n_scenes] [views] [res]
       [--edge] [--cfg afhq|shapenet]
"""
import json
import os
import sys

import numpy as np
import PIL.Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLASSES = 6  # class 0 = background, 1-5 = object classes (seg2cat-like)

# fixed per-class base colors (so class identity is learnable)
CLASS_COLORS = np.array([
    [0, 0, 0],        # bg (unused; bg is a gradient)
    [200, 80, 60],
    [70, 160, 210],
    [90, 190, 90],
    [210, 180, 60],
    [160, 90, 200],
], dtype=np.float32)


def scene_params(rng, max_objs=4, scale=1.0):
    n_obj = rng.randint(2, max_objs + 1)
    objs = []
    classes = rng.choice(np.arange(1, N_CLASSES), size=n_obj, replace=False)
    for k in range(n_obj):
        # keep every object inside the tri-plane box
        # (afhq box_warp=1 -> +-0.5; shapenet box_warp=1.6 -> +-0.8)
        center = rng.uniform(-0.24, 0.24, size=3) * scale
        radii = rng.uniform(0.10, 0.22, size=3) * scale
        shade = rng.uniform(0.7, 1.3)
        objs.append((center, radii, int(classes[k]), shade))
    bg_phase = rng.uniform(0, 2 * np.pi)
    return objs, bg_phase


def render_view(objs, bg_phase, c2w, focal, res, white_bg=False):
    """Analytic ellipsoid ray-trace -> (rgb uint8 [res,res,3], mask uint8).

    `focal` is the NORMALIZED focal length (the dataset.json intrinsics
    entry), so the analytic images match the labeled cameras exactly."""
    ii = (np.arange(res) + 0.5) / res
    u, v = np.meshgrid(ii, ii, indexing="xy")
    x = (u - 0.5) / focal
    y = (v - 0.5) / focal
    dirs_cam = np.stack([x, y, np.ones_like(x)], -1)
    R, o = c2w[:3, :3], c2w[:3, 3]
    d = dirs_cam @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t_best = np.full((res, res), np.inf)
    cls = np.zeros((res, res), np.uint8)
    rgb = np.zeros((res, res, 3), np.float32)
    if white_bg:
        # shapenet-style renders composite onto white (white_back=True)
        rgb[:] = 255.0
    else:
        # soft sky gradient keyed to world up + phase (viewpoint-consistent)
        sky = 0.5 + 0.35 * np.sin(3.0 * d[..., 1] + bg_phase)
        rgb[:] = (np.stack([0.18 * sky, 0.20 * sky, 0.28 * sky], -1)) * 255

    for center, radii, klass, shade in objs:
        oc = (o - center) / radii
        dd = d / radii
        A = np.sum(dd * dd, -1)
        Bq = 2 * np.sum(oc * dd, -1)
        C = np.sum(oc * oc, -1) - 1.0
        disc = Bq * Bq - 4 * A * C
        hit = disc > 0
        t = np.where(hit, (-Bq - np.sqrt(np.maximum(disc, 0))) / (2 * A),
                     np.inf)
        closer = (t > 1e-3) & (t < t_best)
        if not closer.any():
            continue
        p = o + t[..., None] * d
        n = (p - center) / (np.asarray(radii) ** 2)
        n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9
        light = np.array([0.5, -0.8, 0.3])
        light = light / np.linalg.norm(light)
        lam = np.clip(n @ light, 0, 1) * 0.8 + 0.2
        col = CLASS_COLORS[klass] * shade * lam[..., None]
        t_best = np.where(closer, t, t_best)
        cls = np.where(closer, klass, cls)
        rgb = np.where(closer[..., None], col, rgb)
    return np.clip(rgb, 0, 255).astype(np.uint8), cls


def edge_sketch(cls):
    """Semantic boundary map as a black-lines-on-white sketch (uint8),
    the format ImageEdgeFolderDataset expects (shapenet_edge-style):
    the loader inverts (255 - x) and 3x3 box-blurs, so lines must be
    DARK on a white page."""
    edge = np.zeros(cls.shape, bool)
    edge[:-1, :] |= cls[:-1, :] != cls[1:, :]
    edge[:, :-1] |= cls[:, :-1] != cls[:, 1:]
    return np.where(edge, 0, 255).astype(np.uint8)


def main():
    args = [a for a in sys.argv[1:] if a != "--edge"]
    make_edges = "--edge" in sys.argv
    cfg = "afhq"
    if "--cfg" in args:
        i = args.index("--cfg")
        cfg = args[i + 1]
        del args[i:i + 2]
    outdir = args[0]
    n_scenes = int(args[1]) if len(args) > 1 else 128
    views = int(args[2]) if len(args) > 2 else 4
    res = int(args[3]) if len(args) > 3 else 128

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    img_dir = os.path.join(outdir, "imgs")
    mask_dir = os.path.join(outdir, "edges" if make_edges else "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    if cfg == "shapenet":
        # edge2car geometry (ref train.py:451-460 + apps' shapenet focal
        # 1.7074 == fov 45 under the 1.414 convention): radius 1.7, pivot
        # at the origin, full-orbit yaw, white background, box_warp 1.6.
        intr = fov_to_intrinsics(45.0)
        radius, scale, white_bg, yaw_span = 1.7, 1.7, True, np.pi
    else:
        intr = fov_to_intrinsics(18.837)
        radius, scale, white_bg, yaw_span = 2.7, 1.0, False, 0.6
    focal = float(np.asarray(intr)[0, 0])
    labels = []
    for s in range(n_scenes):
        objs, bg_phase = scene_params(rng, scale=scale)
        for vi in range(views):
            yaw = np.pi / 2 + rng.uniform(-yaw_span, yaw_span)
            pitch = np.pi / 2 + rng.uniform(-0.35, 0.35)
            c2w = np.asarray(LookAtPoseSampler.sample(
                None, yaw, pitch, [0.0, 0.0, 0.0], radius=radius,
                batch_size=1))[0]
            rgb, cls = render_view(objs, bg_phase, c2w, focal, res,
                                   white_bg=white_bg)
            name = f"s{s:04d}_v{vi}.png"
            PIL.Image.fromarray(rgb).save(os.path.join(img_dir, name))
            cond = edge_sketch(cls) if make_edges else cls
            PIL.Image.fromarray(cond).save(os.path.join(mask_dir, name))
            pose = np.asarray(pose_to_conditioning(
                c2w[None], intr))[0]
            labels.append([name, [float(x) for x in pose]])
    with open(os.path.join(img_dir, "dataset.json"), "w") as f:
        json.dump({"labels": labels}, f)
    print(f"wrote {len(labels)} views of {n_scenes} scenes to {outdir}")


if __name__ == "__main__":
    main()
