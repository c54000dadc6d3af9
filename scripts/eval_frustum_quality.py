"""Fast-path quality on TRAINED weights: frustum vs gather (VERDICT item 5).

Round-2's frustum-quality evidence was random-init PSNR only; a trained
generator concentrates density at surfaces — exactly where the regular-z
slab interpolant could bite.  This script loads a trained checkpoint,
renders the SAME (z, mask, pose) set through the parity gather sampler and
the frustum serving path, and reports:

  - raw/SR PSNR between the two paths,
  - feature-space distance: Frechet distance between the two render sets
    under the FID feature extractor (real Inception if
    PIX2PIX3D_INCEPTION_NPZ is set, else the documented fixed-seed
    random-conv fallback — valid for RELATIVE comparison, which is exactly
    this use),
  - per-class semantic agreement (mIoU between the two paths' argmax maps).

Accept/reject gate for the serving default (documented in NOTES_PERF):
PSNR(raw) > 20 dB, mIoU > 0.90, FID-proxy(frustum||gather) < 0.1 *
FID-proxy(gather||reals-like shuffle) is not computable offline — instead
the threshold is an absolute feature-distance budget relative to the
gather path's own internal spread (split-half Frechet distance).

Usage:
    python scripts/eval_frustum_quality.py CKPT [n_images] [out_json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PIX2PIX3D_CPU"):
    # debugging/smoke-testing escape hatch: JAX_PLATFORMS=cpu alone cannot
    # override this image's axon plugin (CLAUDE.md), only jax.config can
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def frechet(f1, f2):
    """Frechet distance between Gaussian fits of two feature sets.

    Uses the low-rank identity instead of scipy.sqrtm (45+ min on this
    1-core host for 2048^2): with centered, 1/sqrt(n-1)-scaled features
    x_i, cov_i = x_i^T x_i and the nonzero eigenvalues of cov1 @ cov2
    equal those of the tiny [n1, n1] matrix (x1 x2^T)(x2 x1^T), so
    tr sqrtm(cov1 cov2) = sum sqrt(eig).  Exact for any n, fast for
    n << dim (64 samples vs 2048 feature dims here)."""
    mu1, mu2 = f1.mean(0), f2.mean(0)
    x1 = (f1 - mu1) / np.sqrt(len(f1) - 1)
    x2 = (f2 - mu2) / np.sqrt(len(f2) - 1)
    m = np.square(mu1 - mu2).sum()
    tr1 = np.square(x1).sum()
    tr2 = np.square(x2).sum()
    cross = x1 @ x2.T                       # [n1, n2]
    ev = np.linalg.eigvals(cross @ cross.T)  # eigvals of cov1 @ cov2
    tr_sqrt = np.sqrt(np.clip(np.real(ev), 0, None)).sum()
    return float(m + tr1 + tr2 - 2 * tr_sqrt)


def miou(a, b, n_classes):
    ious = []
    for k in range(n_classes):
        inter = np.logical_and(a == k, b == k).sum()
        union = np.logical_or(a == k, b == k).sum()
        if union > 0:
            ious.append(inter / union)
    return float(np.mean(ious))


def psnr(a, b):
    rmse = np.sqrt(((a - b) ** 2).mean())
    span = a.max() - a.min() + 1e-9
    return float(20 * np.log10(span / (rmse + 1e-12)))


def main():
    ckpt = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/frustum_quality.json"

    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.train.checkpoint import load_ema_params
    from pix2pix3d_tpu.metrics.metric_utils import get_feature_extractor
    from pix2pix3d_tpu.render.camera import (LookAtPoseSampler,
                                             fov_to_intrinsics,
                                             pose_to_conditioning)

    params, _ = load_ema_params(ckpt)  # full ckpt or durable EMA export
    meta = json.load(open(ckpt + ".json"))
    gc = meta["config"]["g_config"] if "config" in meta else meta["g_config"]
    if isinstance(gc, str):
        import ast
        gc = ast.literal_eval(gc)
    res = gc["img_resolution"]
    sem_ch = gc["semantic_channels"]
    nrr = 128 if res >= 512 else 64

    rng = np.random.RandomState(0)
    batch = 4
    n_images = max(batch, (n_images // batch) * batch)

    def render_all(sampler):
        from pix2pix3d_tpu.ops import precision
        precision.fast_f32(False)
        cfg = json.loads(json.dumps(gc))  # deep copy; checkpoint params fit
        if sampler == "frustum":
            # measure the FULL serving configuration — exactly what
            # bench.py's headline runs (frustum slabs + fused Pallas
            # decode/composite + bf16-compute convs), not a softer
            # f32 frustum variant.  PIX2PIX3D_EVAL_GFP16 / _DUAL_SR gate
            # the additional serving knobs (`bench.py --g-fp16/--dual-sr`)
            # so their quality is measured BEFORE they become defaults
            # (fp16-res counts change compute dtypes only, never param
            # shapes, so the same checkpoint params apply).
            gfp16 = int(os.environ.get("PIX2PIX3D_EVAL_GFP16", "0"))
            if gfp16:
                # gc is the full build_generator kwargs dict (config
                # sidecar), where g_num_fp16_res has already been lowered
                # to synthesis kwargs — mirror config.py:107-108
                cfg["num_fp16_res"] = gfp16
                cfg["conv_clamp"] = 256
                cfg.setdefault("mapping_kwargs", {})
                cfg["mapping_kwargs"]["encoder_num_fp16_res"] = gfp16
        G = build_generator(**cfg)
        G.rendering_kwargs.pop("sampler", None)
        G.rendering_kwargs.pop("decoder_impl", None)
        G.rendering_kwargs.pop("dual_sr", None)
        if sampler == "frustum":
            G.rendering_kwargs["sampler"] = "frustum"
            G.rendering_kwargs["frustum_depth_steps"] = int(
                os.environ.get("PIX2PIX3D_EVAL_DEPTH", "96"))
            G.rendering_kwargs["frustum_chunk"] = 8
            G.rendering_kwargs["decoder_impl"] = "pallas"
            if os.environ.get("PIX2PIX3D_EVAL_DUAL_SR"):
                G.rendering_kwargs["dual_sr"] = True
            if os.environ.get("PIX2PIX3D_EVAL_CHUNK_GRID"):
                G.rendering_kwargs["fused_chunk_grid"] = True
            # Precision attribution matrix (round-5, after the round-4 TPU
            # gate run showed mIoU 0.881 < 0.90 under full bf16 serving):
            # the serving numerics split into two independent domains —
            # `fast_f32` (bf16-compute for the f32 conv stacks: mapping,
            # backbone; the SR stacks are bf16 TENSORS via sr_num_fp16_res
            # either way) and `frustum_bf16` (bf16 slab chain + fused
            # kernel).  SERVE_F32 turns both off (full-f32 control);
            # FRUSTUM_F32 / CONVS_F32 isolate one domain each; SEM_SR_F32
            # is the candidate targeted fix (semantic SR stack only at f32
            # tensors + HIGHEST, everything else fast).
            serve_f32 = bool(os.environ.get("PIX2PIX3D_EVAL_SERVE_F32"))
            frustum_f32 = serve_f32 or bool(
                os.environ.get("PIX2PIX3D_EVAL_FRUSTUM_F32"))
            convs_f32 = serve_f32 or bool(
                os.environ.get("PIX2PIX3D_EVAL_CONVS_F32"))
            if frustum_f32:
                G.rendering_kwargs["frustum_bf16"] = False
            if os.environ.get("PIX2PIX3D_EVAL_SEM_SR_F32"):
                G.rendering_kwargs["sr_sem_f32"] = True
            # graded cheaper variants of SEM_SR_F32 (f32 tensors + 1/3
            # bf16 matmul passes instead of 6 — ops/precision._LEVELS)
            if os.environ.get("PIX2PIX3D_EVAL_SEM_SR_PREC"):
                G.rendering_kwargs["sr_sem_precision"] = \
                    os.environ["PIX2PIX3D_EVAL_SEM_SR_PREC"]
            # near-free kernel knob: f32 colors through the fused
            # composite carry (no bf16 output-cast of semantic logits)
            if os.environ.get("PIX2PIX3D_EVAL_CARRY_F32"):
                G.rendering_kwargs["fused_carry_f32"] = True
            if not convs_f32:
                precision.fast_f32(True)
        print(f"[eval] rendering {n_images} images via {sampler}", flush=True)
        imgs, raws, sems = [], [], []
        r = np.random.RandomState(7)  # same stream per sampler

        # jit the forward (one compile per sampler config): the eager path
        # materializes every XLA-unfused intermediate in HBM and OOMs the
        # chip on the frustum chain's sheared-texture temps.  `p` must be
        # an ARGUMENT — closing over params inlines every weight into the
        # HLO as literals (the remote compile helper rejects the body).
        @jax.jit
        def fwd(p, z, mask, pose):
            out = G(p, z, pose, {"mask": mask, "pose": pose},
                    neural_rendering_resolution=nrr, noise_mode="const",
                    det=True)
            return out["image"], out["image_raw"], out["semantic"]

        for i in range(0, n_images, batch):
            z = jnp.asarray(r.randn(batch, G.z_dim).astype(np.float32))
            mask = jnp.asarray(r.randint(0, sem_ch, (batch, res, res, 1))
                               .astype(np.float32))
            yaw = np.pi / 2 + r.uniform(-0.4, 0.4)
            pitch = np.pi / 2 + r.uniform(-0.25, 0.25)
            c2w = LookAtPoseSampler.sample(None, yaw, pitch, [0, 0, -0.06],
                                           radius=2.7, batch_size=batch)
            pose = pose_to_conditioning(c2w, fov_to_intrinsics(18.837))
            image, image_raw, semantic = fwd(params, z, mask, pose)
            out = {"image": image, "image_raw": image_raw,
                   "semantic": semantic}
            imgs.append(np.asarray(out["image"]))
            raws.append(np.asarray(out["image_raw"]))
            sems.append(np.argmax(np.asarray(out["semantic"]), axis=-1))
        return (np.concatenate(imgs), np.concatenate(raws),
                np.concatenate(sems))

    # The parity-path renders depend only on (ckpt, n_images) — cache them
    # so an attribution matrix of frustum configs pays for the slow gather
    # render once (PIX2PIX3D_EVAL_GATHER_CACHE=/path/to/cache.npz).
    cache = os.environ.get("PIX2PIX3D_EVAL_GATHER_CACHE")
    if cache and os.path.exists(cache):
        d = np.load(cache)
        assert str(d["ckpt"]) == ckpt and int(d["n"]) == n_images, \
            (str(d["ckpt"]), int(d["n"]), ckpt, n_images)
        img_g, raw_g, sem_g = d["img"], d["raw"], d["sem"]
        print(f"[eval] gather renders loaded from {cache}", flush=True)
    else:
        img_g, raw_g, sem_g = render_all("gather")
        if cache:
            np.savez(cache, ckpt=ckpt, n=n_images,
                     img=img_g, raw=raw_g, sem=sem_g)
    img_f, raw_f, sem_f = render_all("frustum")

    detector = get_feature_extractor()
    to_u8 = lambda x: np.clip((x + 1) * 127.5, 0, 255).astype(np.float32)
    feats_g = np.concatenate([detector(to_u8(img_g[i:i + 8]))
                              for i in range(0, n_images, 8)])
    feats_f = np.concatenate([detector(to_u8(img_f[i:i + 8]))
                              for i in range(0, n_images, 8)])

    fd_cross = frechet(feats_g, feats_f)
    # internal spread of the parity path: split-half Frechet distance
    h = n_images // 2
    fd_self = frechet(feats_g[:h], feats_g[h:])

    result = {
        "checkpoint": ckpt,
        "n_images": n_images,
        "backend": jax.default_backend(),
        "serving_config": {
            "depth_steps": int(os.environ.get("PIX2PIX3D_EVAL_DEPTH", "96")),
            "g_fp16": int(os.environ.get("PIX2PIX3D_EVAL_GFP16", "0")),
            "serve_f32": bool(os.environ.get("PIX2PIX3D_EVAL_SERVE_F32")),
            "frustum_f32": bool(os.environ.get("PIX2PIX3D_EVAL_FRUSTUM_F32")),
            "convs_f32": bool(os.environ.get("PIX2PIX3D_EVAL_CONVS_F32")),
            "sem_sr_f32": bool(os.environ.get("PIX2PIX3D_EVAL_SEM_SR_F32")),
            "sem_sr_prec": os.environ.get("PIX2PIX3D_EVAL_SEM_SR_PREC"),
            "carry_f32": bool(os.environ.get("PIX2PIX3D_EVAL_CARRY_F32")),
            "chunk_grid": bool(os.environ.get("PIX2PIX3D_EVAL_CHUNK_GRID")),
            "dual_sr": bool(os.environ.get("PIX2PIX3D_EVAL_DUAL_SR")),
        },
        "psnr_raw": psnr(raw_g, raw_f),
        "psnr_sr": psnr(img_g, img_f),
        "miou_semantic": miou(sem_g, sem_f, sem_ch),
        "fd_proxy_cross": fd_cross,
        "fd_proxy_selfhalf_gather": fd_self,
        "fd_ratio": fd_cross / max(fd_self, 1e-9),
        "detector": "inception" if os.environ.get("PIX2PIX3D_INCEPTION_NPZ")
                    else "random-conv-proxy",
        # free-text provenance of the checkpoint under evaluation (how it
        # was trained/seeded), recorded so gate JSONs stay interpretable
        # after the training run dirs are wiped
        "checkpoint_provenance":
            os.environ.get("PIX2PIX3D_EVAL_PROVENANCE"),
        "accept": {
            "psnr_raw > 20": psnr(raw_g, raw_f) > 20,
            "miou > 0.90": miou(sem_g, sem_f, sem_ch) > 0.90,
            "fd_ratio < 3": fd_cross / max(fd_self, 1e-9) < 3,
        },
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
