"""Single-image inference app (ref `applications/generate_samples.py`).

Loads a checkpoint, conditions on a label/edge map (from a dataset sample or
a PNG), renders color + label outputs under the dataset pose.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image

from .common import build_app_generator, intrinsics_for, to_uint8
from ..train.viz import color_mask


def generate_sample(G, params, app, mask, pose, z=None, seed=0,
                    truncation_psi=1.0):
    """mask `[H, W, 1]` raw (seg labels / edge uint8), pose `[25]`."""
    if z is None:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, G.z_dim))
    expected = G.backbone.mapping.in_resolution
    if mask.shape[0] != expected or mask.shape[1] != expected:
        raise ValueError(
            f"input mask is {mask.shape[0]}x{mask.shape[1]} but this model "
            f"expects {expected}x{expected}; resize the label map first")
    mask_in = jnp.asarray(mask, jnp.float32)[None]
    if G.data_type == "edge":
        mask_in = -(mask_in / 127.5 - 1)
    pose = jnp.asarray(pose, jnp.float32)[None]
    batch = {"mask": mask_in, "pose": pose}
    ws = G.mapping(params, z, pose, batch, truncation_psi=truncation_psi)
    out = G.synthesis(params, ws, pose,
                      neural_rendering_resolution=app["neural_rendering_resolution"],
                      noise_mode="const", det=True)
    return out


def save_outputs(out, outdir, prefix, data_type, semantic_channels):
    os.makedirs(outdir, exist_ok=True)
    color = to_uint8(out["image"][0])
    PIL.Image.fromarray(color).save(os.path.join(outdir, f"{prefix}_color.png"))
    sem = np.asarray(out["semantic"][0])
    if data_type == "seg":
        label = np.argmax(sem, axis=-1)
        PIL.Image.fromarray(color_mask(label[None])[0]).save(
            os.path.join(outdir, f"{prefix}_label.png"))
    else:
        edge = np.clip((1 - sem[..., 0]) * 127.5 + 127.5, 0, 255).astype(np.uint8)
        PIL.Image.fromarray(edge).save(os.path.join(outdir, f"{prefix}_label.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", required=True, help=".pkl or .ckpt checkpoint")
    p.add_argument("--outdir", required=True)
    p.add_argument("--cfg", required=True,
                   choices=["seg2cat", "seg2face", "edge2car"])
    p.add_argument("--input", required=True, help="input label/edge PNG")
    p.add_argument("--pose", default=None,
                   help=".npy 25-float pose; default frontal")
    p.add_argument("--random_seed", type=int, nargs="+", default=[0])
    args = p.parse_args()

    G, params, app = build_app_generator(args.cfg, checkpoint=args.network)
    mask = np.array(PIL.Image.open(args.input))
    if mask.ndim == 3:
        mask = mask[..., 0]
    mask = mask[:, :, None]

    if args.pose:
        pose = np.load(args.pose)
    else:
        from ..render.camera import LookAtPoseSampler, pose_to_conditioning
        radius = 1.7 if args.cfg == "edge2car" else 2.7
        c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, 0],
                                       radius=radius, batch_size=1)
        pose = np.asarray(pose_to_conditioning(
            c2w, intrinsics_for(app)))[0]

    for seed in args.random_seed:
        out = generate_sample(G, params, app, mask, pose, seed=seed)
        save_outputs(out, args.outdir, f"{args.cfg}_{seed}", G.data_type,
                     G.semantic_channels)
        print(f"saved {args.cfg}_{seed} to {args.outdir}")


if __name__ == "__main__":
    main()
