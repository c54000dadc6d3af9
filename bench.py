"""Headline benchmark: seg2cat 512^2 inference (render + SR) images/sec/chip.

Runs the full flagship pipeline (conditional mapping -> 256^2 backbone ->
3x32 tri-planes -> 128^2 x (48+48) importance-sampled volume rendering ->
dual 128->512 super-resolution) at the released seg2cat configuration
(BASELINE.md: nrr=128, depth 48+48, SuperresolutionHybrid8XDC[+semantic]).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
`value` is the serving configuration (gather-free frustum slab sampler +
fused Pallas decode/composite, bf16 compute — a documented approximation
whose drift vs the parity renderer is measured in tests/test_frustum.py);
`parity_value` is the bit-faithful gather/importance pipeline measured in
the same run (VERDICT round 2: report both, every round).

`vs_baseline` divides by an estimated reference throughput of 30 images/sec
on one A100 for the same pipeline (EG3D reports ~36 fps on consumer GPUs for
the rgb-only pipeline; pix2pix3D adds the semantic decoder + second SR; the
repo itself publishes no numbers — see BASELINE.md).

Flags: `--sampler gather|frustum` benches ONE path as the headline;
`--skip-parity` drops the parity measurement; `--batch N` overrides the
headline batch.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IPS = 30.0  # estimated reference images/sec on A100 (see docstring)
BATCH = 32  # best measured batch (fused kernel freed the batch-16 HBM ceiling)
PARITY_BATCH = 8  # gather path OOMs at 16 (round-1 notes)
WARMUP = 2
ITERS = 8
ROUNDS = 5  # timed rounds; report median (first round in a fresh process
            # reads ~16% slow over the tunnel — see round-3 note below)


def bench_config(sampler, decoder_impl, batch, iters=ITERS, g_fp16=0,
                 frustum_window=None, frustum_tiles=None, dual_sr=False,
                 depth_steps=96, chunk_grid=False, sem_sr_f32=False,
                 sem_sr_prec=None, carry_f32=False):
    """Build the flagship seg2cat generator in the given sampler config and
    return measured images/sec on the current default device.

    g_fp16 > 0 runs that many trailing backbone resolutions in bf16
    TENSORS (not just bf16-compute): halves the backbone's HBM streams.
    Serving experiment only — quality must re-pass the
    eval_frustum_quality gates before it becomes the headline default."""
    import jax
    import jax.numpy as jnp
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    cfg = cfg_mod.preset_generator_config("seg2cat", sr_num_fp16_res=4,
                                          g_num_fp16_res=g_fp16)
    if g_fp16:
        # run the 512^2 mask-encoder convs in bf16 tensors too (a measured
        # serving hotspot: mapping stage 45 ms/batch-16, NOTES_PERF round 2)
        cfg["mapping_kwargs"]["encoder_num_fp16_res"] = g_fp16
    G = build_generator(**cfg)
    if sampler == "frustum":
        G.rendering_kwargs["sampler"] = "frustum"
        G.rendering_kwargs["frustum_depth_steps"] = depth_steps
        G.rendering_kwargs["frustum_chunk"] = 8
        if decoder_impl == "pallas":
            G.rendering_kwargs["decoder_impl"] = "pallas"
        if frustum_window is not None:
            # A/B override of the contraction-window spec (--window).
            G.rendering_kwargs["frustum_window"] = frustum_window
        if frustum_tiles is not None:
            G.rendering_kwargs["frustum_tiles"] = frustum_tiles
        if chunk_grid:
            # A/B: chunk-blocked fused-kernel grid (one grid step per
            # chunk of slabs, TC x fewer steps than the default per-slab
            # grid, which is launch-overhead bound)
            G.rendering_kwargs["fused_chunk_grid"] = True
    if dual_sr:
        # run rgb+semantic SR as one vmapped/grouped program (exact)
        G.rendering_kwargs["dual_sr"] = True
    if sem_sr_f32:
        # semantic SR stack at f32 tensors + HIGHEST (the round-5 targeted
        # quality fix: the mIoU gate reads this stack's argmax, where bf16
        # rounding flips near-tie class boundaries — docs/SERVING.md).
        # Measured -37% (63.4 -> 39.9 img/s); see sem_sr_prec for the
        # graded cheaper levels.
        G.rendering_kwargs["sr_sem_f32"] = True
    if sem_sr_prec:
        # graded semantic-SR precision: f32 TENSORS + default|high|highest
        # matmul passes (ops/precision._LEVELS)
        G.rendering_kwargs["sr_sem_precision"] = sem_sr_prec
    if carry_f32:
        # f32 colors through the fused kernel's composite carry (near-free)
        G.rendering_kwargs["fused_carry_f32"] = True
    params = G.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(batch, G.z_dim).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 6, size=(batch, 512, 512, 1))
                       .astype(np.float32))
    c2w = LookAtPoseSampler.sample(None, np.pi / 2, np.pi / 2, [0, 0, -0.06],
                                   radius=2.7, batch_size=batch)
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

    # ROUNDS timed rounds; report the MEDIAN plus the min/max spread.  The
    # FIRST measured round in a fresh process reads ~16% slow on this
    # tunnel regardless of warmup-iteration count (measured round 3: 53.9
    # vs 63.4 img/s on byte-identical programs); the median over 5 rounds
    # absorbs that plus run-to-run tunnel jitter that best-of-2 could not
    # resolve (the unexplained r02->r03 -7.6% was within that noise).
    samples = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(iters):
            img, sem = forward(params, z, mask, pose)
        jax.block_until_ready(img)
        # final value fetch: block_until_ready over the axon tunnel can
        # return early (CLAUDE.md) — touching a value guarantees completion
        float(np.asarray(img[0, 0, 0, 0]))
        dt = time.perf_counter() - t0
        samples.append(batch * iters / dt)
    return {"median": float(np.median(samples)),
            "min": float(np.min(samples)), "max": float(np.max(samples)),
            "rounds": len(samples), "iters_per_round": iters}


def main():
    batch = BATCH
    sampler = None
    if "--sampler" in sys.argv:
        sampler = sys.argv[sys.argv.index("--sampler") + 1]
    decoder_impl = "ref" if "--decoder" in sys.argv and \
        sys.argv[sys.argv.index("--decoder") + 1] == "ref" else "pallas"
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    skip_parity = "--skip-parity" in sys.argv
    g_fp16 = int(sys.argv[sys.argv.index("--g-fp16") + 1]) \
        if "--g-fp16" in sys.argv else 0
    dual_sr = "--dual-sr" in sys.argv
    chunk_grid = "--chunk-grid" in sys.argv
    sem_sr_f32 = "--sem-sr-f32" in sys.argv
    # --sem-sr-prec default|high|highest: graded semantic-SR precision
    # (f32 tensors + that many bf16 matmul passes; see ops/precision)
    sem_sr_prec = sys.argv[sys.argv.index("--sem-sr-prec") + 1] \
        if "--sem-sr-prec" in sys.argv else None
    carry_f32 = "--carry-f32" in sys.argv
    # --depth N: frustum slab count (default 96, matching the reference's
    # 48+48 sample count; fewer slabs = coarser depth quadrature — a
    # serving knob that must re-pass the quality gates before defaulting)
    depth_steps = int(sys.argv[sys.argv.index("--depth") + 1]) \
        if "--depth" in sys.argv else 96
    # --window chunk|full|tiles: override the contraction-window spec for
    # A/B runs (default: frustum_render's auto-selection, currently the
    # single chunk window on the seg2cat geometry).
    # Serving-default overlay (docs/serving_default.json, written by
    # scripts/pick_serving_default.py = the fastest config whose TPU
    # quality gate passes).  It supplies the DEFAULT for any knob whose
    # CLI flag is absent; explicit flags (and --no-default-overlay) win,
    # so A/B runs stay meaningful relative to the shipped default.
    overlay_arm = None
    ov_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "docs", "serving_default.json")
    if os.path.exists(ov_path) and "--no-default-overlay" not in sys.argv:
        ov = json.load(open(ov_path))
        o = ov.get("config", {})
        overlay_arm = ov.get("chosen_arm")
        if "--g-fp16" not in sys.argv:
            g_fp16 = o.get("g_fp16", g_fp16)
        if "--depth" not in sys.argv:
            depth_steps = o.get("depth_steps", depth_steps)
        if "--carry-f32" not in sys.argv:
            carry_f32 = o.get("carry_f32", carry_f32)
        if "--sem-sr-prec" not in sys.argv:
            sem_sr_prec = o.get("sem_sr_prec", sem_sr_prec)
        if "--sem-sr-f32" not in sys.argv:
            sem_sr_f32 = o.get("sem_sr_f32", sem_sr_f32)

    frustum_window = frustum_tiles = None
    window_name = "auto"
    if "--window" in sys.argv:
        try:
            window_name = sys.argv[sys.argv.index("--window") + 1]
        except IndexError:
            sys.exit("usage: bench.py --window chunk|full|tiles")
        from pix2pix3d_tpu.render.frustum import MARGIN
        nrr = 128  # the flagship serving config this bench measures
        if window_name == "chunk":
            frustum_window = (384, 448)
        elif window_name == "full":
            # exact full contraction: the sheared texture extent
            frustum_window = (256 + 2 * MARGIN, 256 + 2 * MARGIN)
        elif window_name == "tiles":
            # round-3 per-output-tile sub-windows; gi scales with nrr
            frustum_tiles = (nrr // 4, 96, nrr // 4, 96, 256)
        elif "x" in window_name:
            # explicit HxW window, e.g. 256x384 (the round-2 spec)
            try:
                wy, wx = (int(v) for v in window_name.split("x"))
            except ValueError:
                sys.exit(f"bad --window {window_name!r}; expected HxW")
            frustum_window = (wy, wx)
        else:
            sys.exit(f"unknown --window {window_name!r}; "
                     "choices: chunk|full|tiles|HxW")

    from pix2pix3d_tpu.ops.precision import fast_f32
    fast_f32(True)  # inference mode: bf16-compute convs (f32 accumulate)

    if sampler == "gather":
        r = bench_config("gather", "ref", batch)
        print(json.dumps({
            "metric": "seg2cat_512px_inference_parity",
            "value": round(r["median"], 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(r["median"] / BASELINE_IPS, 3),
            "spread": [round(r["min"], 3), round(r["max"], 3)],
            "config": {"sampler": "gather", "batch": batch,
                       "rounds": r["rounds"], "iters": r["iters_per_round"]},
        }))
        return

    r = bench_config("frustum", decoder_impl, batch, g_fp16=g_fp16,
                     frustum_window=frustum_window,
                     frustum_tiles=frustum_tiles, dual_sr=dual_sr,
                     depth_steps=depth_steps, chunk_grid=chunk_grid,
                     sem_sr_f32=sem_sr_f32, sem_sr_prec=sem_sr_prec,
                     carry_f32=carry_f32)
    out = {
        "metric": "seg2cat_512px_inference",
        "value": round(r["median"], 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(r["median"] / BASELINE_IPS, 3),
        "spread": [round(r["min"], 3), round(r["max"], 3)],
        "config": {"sampler": "frustum", "decoder_impl": decoder_impl,
                   "batch": batch, "window": window_name, "g_fp16": g_fp16,
                   "dual_sr": dual_sr, "fast_f32": True,
                   "depth_steps": depth_steps, "chunk": 8,
                   "sem_sr_f32": sem_sr_f32, "sem_sr_prec": sem_sr_prec,
                   "carry_f32": carry_f32,
                   "fused_grid": "chunk" if chunk_grid else "slab",
                   "default_overlay": overlay_arm,
                   "rounds": r["rounds"], "iters": r["iters_per_round"]},
    }
    if not skip_parity:
        pr = bench_config("gather", "ref", PARITY_BATCH, iters=4)
        out["parity_value"] = round(pr["median"], 3)
        out["parity_vs_baseline"] = round(pr["median"] / BASELINE_IPS, 3)
        out["parity_batch"] = PARITY_BATCH
        out["parity_spread"] = [round(pr["min"], 3), round(pr["max"], 3)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
