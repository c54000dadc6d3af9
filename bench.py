"""Headline benchmark: seg2cat 512^2 inference (render + SR) images/sec/chip.

Runs the full flagship pipeline (conditional mapping -> 256^2 backbone ->
3x32 tri-planes -> 128^2 x (48+48) importance-sampled volume rendering ->
dual 128->512 super-resolution) at the released seg2cat configuration
(BASELINE.md: nrr=128, depth 48+48, SuperresolutionHybrid8XDC[+semantic]).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` divides by an estimated reference throughput of 30 images/sec
on one A100 for the same pipeline (EG3D reports ~36 fps on consumer GPUs for
the rgb-only pipeline; pix2pix3D adds the semantic decoder + second SR; the
repo itself publishes no numbers — see BASELINE.md).

Serving mode uses the gather-free frustum slab sampler (render/frustum.py,
96 regular depth steps ~ the parity path's 48+48) — a documented
approximation whose drift vs the parity renderer is measured in
tests/test_frustum.py (PSNR > 25 dB on raw renders).  Run with
`--sampler gather` for the bit-faithful parity pipeline.
"""

import json
import sys
import time

import numpy as np

BASELINE_IPS = 30.0  # estimated reference images/sec on A100 (see docstring)
BATCH = 32  # best measured batch (fused kernel freed the batch-16 HBM ceiling); --batch N overrides
WARMUP = 2
ITERS = 8


def main():
    global BATCH
    sampler = "gather" if "--sampler" in sys.argv and \
        sys.argv[sys.argv.index("--sampler") + 1] == "gather" else "frustum"
    decoder_impl = "ref" if "--decoder" in sys.argv and \
        sys.argv[sys.argv.index("--decoder") + 1] == "ref" else "pallas"
    if "--batch" in sys.argv:
        BATCH = int(sys.argv[sys.argv.index("--batch") + 1])
    import jax
    import jax.numpy as jnp
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.ops.precision import fast_f32

    fast_f32(True)  # inference mode: bf16-compute convs (f32 accumulate)
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4)
    G = build_generator(**cfg)
    if sampler == "frustum":
        G.rendering_kwargs["sampler"] = "frustum"
        G.rendering_kwargs["frustum_depth_steps"] = 96
        G.rendering_kwargs["frustum_chunk"] = 8
        if decoder_impl == "pallas":
            G.rendering_kwargs["decoder_impl"] = "pallas"
    params = G.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(BATCH, G.z_dim).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 6, size=(BATCH, 512, 512, 1))
                       .astype(np.float32))
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=BATCH)
    pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))

    @jax.jit
    def forward(params, z, mask, pose):
        batch = {"mask": mask, "pose": pose}
        out = G(params, z, pose, batch, neural_rendering_resolution=128,
                noise_mode="const", det=True)
        return out["image"], out["semantic"]

    # Warmup / compile.
    for _ in range(WARMUP):
        img, sem = forward(params, z, mask, pose)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        img, sem = forward(params, z, mask, pose)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "seg2cat_512px_inference",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
