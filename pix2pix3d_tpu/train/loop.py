"""Host-side training loop.

Ref `training/training_loop.py:230-800`.  The reference's per-GPU process
spawn + NCCL path is replaced by a single host driving a jitted SPMD step
over the device mesh (see `parallel/trainer.py`).  Tick cadence, stats.jsonl,
image/network snapshots, EMA, abort hook, and resume mirror the reference.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image

from ..models import build_generator
from ..nn import DualDiscriminator
from ..render.camera import LookAtPoseSampler, fov_to_intrinsics, \
    pose_to_conditioning
from .dataset import build_dataset, DataLoader
from .loss import Pix2Pix3DLoss
from .lpips import LPIPS
from .stats import Collector
from .checkpoint import save_checkpoint, load_checkpoint, copy_params_fuzzy
from ..parallel.trainer import Trainer, make_mesh
from ..utils.misc import format_time
from .viz import color_mask, save_image_grid


def training_loop(
    run_dir=".",
    dataset_kwargs=None,        # build_dataset kwargs
    g_config=None,              # build_generator kwargs (from config.generator_config)
    d_kwargs=None,              # DualDiscriminator extra kwargs
    loss_kwargs=None,           # Pix2Pix3DLoss kwargs
    use_d_semantic=True,
    augment_kwargs=None,        # AugmentPipe kwargs; None = no augmentation
    augment_p=0.0,              # initial/fixed ADA probability
    ada_target=None,            # None = fixed p; else ADA heuristic target
    ada_interval=4,
    ada_kimg=500,
    g_lr=0.0025,
    d_lr=0.002,
    g_reg_interval=4,
    d_reg_interval=16,
    batch_size=4,
    batch_gpu=None,             # per-device micro-batch (ref --batch-gpu);
                                # None = whole per-device batch, no accumulation
    ema_kimg=None,              # None -> batch_size * 10 / 32 (ref train.py:372)
    ema_rampup=0.05,
    total_kimg=25000,
    kimg_per_tick=4,
    snapshot_ticks=10,
    image_snapshot_ticks=10,
    random_seed=0,
    resume_path=None,
    resume_kimg=0,
    resume_partial=False,       # fuzzy name-matched net init from a native
                                # ckpt of a DIFFERENT architecture (the ref
                                # `--resume` EG3D-pkl semantics,
                                # `training_loop.py:311-321`, applied to
                                # our own checkpoints; opt state + nimg
                                # start fresh)
    jit_phases=False,           # one jitted program per phase instead of
                                # the 6-phase monolith: ~6x smaller
                                # programs (identical math, trainer.py
                                # `make_step`).  Use when the monolith
                                # overwhelms the compiler — e.g. 512^2 +
                                # 4 accumulation rounds statically
                                # unrolled got the remote compile helper
                                # OOM-killed (round 5)
    lpips_weights=None,
    abort_fn=None,
    progress_fn=None,
    mesh=None,
):
    start_time = time.time()
    os.makedirs(run_dir, exist_ok=True)
    mesh = mesh if mesh is not None else make_mesh()
    num_devices = mesh.devices.size
    assert batch_size % num_devices == 0, \
        f"batch_size {batch_size} must divide over {num_devices} devices"
    if ema_kimg is None:
        ema_kimg = batch_size * 10 / 32

    # Dataset.
    dataset = build_dataset(**dataset_kwargs)
    loader = DataLoader(dataset, batch_size=batch_size, seed=random_seed)

    # Networks.
    g_config = dict(g_config)
    g_config.setdefault("c_dim", dataset.label_dim)
    G = build_generator(**g_config)
    sem = g_config["semantic_channels"]
    res = g_config["img_resolution"]
    d_common = dict(c_dim=dataset.label_dim, img_resolution=res,
                    **(d_kwargs or {}))
    D = DualDiscriminator(img_channels=3, **d_common)
    D_sem = DualDiscriminator(img_channels=3 + sem, **d_common) \
        if use_d_semantic else None

    lpips = LPIPS(weights_path=lpips_weights)
    augment_pipe = None
    if augment_kwargs is not None:
        from .augment import AugmentPipe
        augment_pipe = AugmentPipe(**augment_kwargs)
    loss = Pix2Pix3DLoss(G, D, D_semantic=D_sem, lpips=lpips,
                         augment_pipe=augment_pipe,
                         **(loss_kwargs or {}))
    per_device = batch_size // num_devices
    rounds = 1 if batch_gpu is None else max(per_device // batch_gpu, 1)
    trainer = Trainer(loss, g_lr=g_lr, d_lr=d_lr,
                      g_reg_interval=g_reg_interval,
                      d_reg_interval=d_reg_interval, mesh=mesh,
                      grad_accum_rounds=rounds, jit_phases=jit_phases)

    # State init / resume.
    state = trainer.init_state(jax.random.PRNGKey(random_seed))
    cur_nimg = int(resume_kimg * 1000)
    if resume_path is not None:
        if resume_path.endswith(".pkl"):
            # Reference-format pickle: partial fuzzy init (ref
            # `training_loop.py:311-321`).
            from ..utils.convert import load_reference_pickle, convert_state_dict
            modules = load_reference_pickle(resume_path)
            for name, key in [("G", "G"), ("D", "D"), ("G_ema", "G_ema")]:
                if name in modules:
                    try:
                        converted = convert_state_dict(modules[name], state[key])
                        state[key] = converted
                    except (KeyError, ValueError):
                        # fuzzy partial init for architecture mismatches
                        state[key] = copy_params_fuzzy(modules[name], state[key])
        elif resume_partial:
            # cross-architecture fine-tune (e.g. the reference's edge2car
            # recipe, `train_scripts/shapenet_edge.sh`, which resumes a
            # pretrained EG3D pkl): copy every name+shape-matched leaf of
            # the network trees, skip the rest (incl. the optimizer state)
            src, _ = load_checkpoint(resume_path)
            for key in ("G", "D", "G_ema", "D_semantic"):
                if key in src and key in state:
                    state[key] = copy_params_fuzzy(src[key], state[key],
                                                   verbose=True)
        else:
            state, step = load_checkpoint(resume_path, state)
            if step is not None:
                cur_nimg = step
    print(f"devices: {num_devices}  batch: {batch_size}  "
          f"G params: {sum(x.size for x in jax.tree_util.tree_leaves(state['G'])):,}")

    # Logs: stats.jsonl + TensorBoard events (ref `training_loop.py
    # :388-399`; wandb is not available in this environment — the TB event
    # file is the canonical sink, stats.jsonl the greppable one).
    stats_jsonl = open(os.path.join(run_dir, "stats.jsonl"), "at")
    from .tb import TBWriter
    from .wandb_sink import WandbSink
    tb_writer = TBWriter(run_dir)
    wandb_sink = WandbSink(run_dir, config=dict(g_config=g_config,
                                               loss_kwargs=loss_kwargs))
    collector = Collector()

    # Snapshot grid inputs.
    grid_n = min(batch_size, 8)
    grid_batch = next(iter(loader))
    save_image_grid(((grid_batch["image"][:grid_n] + 1) * 127.5),
                    os.path.join(run_dir, "reals.png"))
    if dataset.data_type == "seg":
        save_image_grid(color_mask(grid_batch["mask"][:grid_n, :, :, 0]),
                        os.path.join(run_dir, "mask.png"))
    grid_z = np.random.RandomState(random_seed).randn(grid_n, G.z_dim) \
        .astype(np.float32)

    rng = jax.random.PRNGKey(random_seed * 1000 + 7)
    step_idx = 0
    tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()

    # Hang watchdog: the v5e runtime has been observed to block a device
    # call forever (silent variant of the worker-crash fault, NOTES_PERF
    # round 2e).  A daemon thread flags steps stuck far beyond the worst
    # legitimate stall (a cold compile) so runs fail loudly instead of
    # idling for hours.  It cannot cancel the blocked XLA call — it logs,
    # then hard-exits so a supervisor can restart from the last snapshot.
    import threading
    watchdog_deadline = [None]

    def _watchdog():
        while True:
            time.sleep(30)
            d = watchdog_deadline[0]
            if d is not None and time.time() > d:
                print(f"WATCHDOG: step {step_idx} exceeded "
                      f"{step_timeout_sec}s (device call hung) — aborting "
                      "for supervisor restart", flush=True)
                os._exit(74)

    step_timeout_sec = 2400  # > worst cold compile observed (~20 min)
    threading.Thread(target=_watchdog, daemon=True).start()

    while True:
        batch = next(iter(loader))
        batch_dev = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in ("image", "mask", "pose")}

        rng, k_z, k_c, k_step = jax.random.split(rng, 4)
        gen_z = jax.random.normal(k_z, (4, batch_size, G.z_dim))
        gen_idx = np.random.randint(len(dataset), size=4 * batch_size)
        gen_c = jnp.asarray(np.stack(
            [dataset.get_label(i) for i in gen_idx]).reshape(
                4, batch_size, -1).astype(np.float32))

        t_step = time.time()
        watchdog_deadline[0] = t_step + step_timeout_sec
        # The remote compile helper on this image intermittently SIGKILLs
        # big (512^2-scale) compiles under load, surfacing as a
        # JaxRuntimeError mentioning remote_compile.  Successful compiles
        # ARE cached helper-side, so retrying makes monotonic progress
        # (each attempt re-hits every cached program and only pays for the
        # one that failed).  Genuine compile errors (OOM analysis, lowering
        # bugs) are not transient — re-raise after the retry budget.
        for attempt in range(4):
            try:
                state, stats = trainer.step(
                    state, batch_dev, gen_z, gen_c, k_step,
                    step_idx=step_idx, cur_nimg=cur_nimg,
                    batch_size=batch_size, ema_kimg=ema_kimg,
                    ema_rampup=ema_rampup, aug_p=augment_p)
                break
            except jax.errors.JaxRuntimeError as e:
                transient = "remote_compile" in str(e) and (
                    "SIGKILL" in str(e) or "exit code" in str(e))
                if not transient or attempt == 3:
                    raise
                print(f"step {step_idx}: remote compile helper died "
                      f"(attempt {attempt + 1}/4), retrying in 60s",
                      flush=True)
                time.sleep(60)
                watchdog_deadline[0] = time.time() + step_timeout_sec
        collector.update(dict(stats))  # ONE device->host fetch (FlatStats)
        watchdog_deadline[0] = None
        dt_step = time.time() - t_step
        # step-level heartbeat: compiles on this toolchain take minutes, so
        # the per-tick line alone leaves long silences
        if step_idx < 3 or step_idx in (4, 16) or step_idx % 100 == 0 \
                or dt_step > 60:
            print(f"step {step_idx}  {dt_step:7.1f}s  "
                  f"(nimg {cur_nimg})", flush=True)
        cur_nimg += batch_size
        step_idx += 1

        # ADA heuristic (ref training_loop.py:566-569)
        if (augment_pipe is not None and ada_target is not None
                and step_idx % ada_interval == 0):
            from .augment import ada_update_p
            signs = collector.mean("Loss/signs/real")
            if np.isfinite(signs):
                augment_p = ada_update_p(augment_p, signs, batch_size,
                                         ada_interval=ada_interval,
                                         ada_kimg=ada_kimg,
                                         ada_target=ada_target)

        done = cur_nimg >= total_kimg * 1000
        if (not done) and (cur_nimg < tick_start_nimg + kimg_per_tick * 1000):
            continue

        # --- tick
        tick_time = time.time() - tick_start_time
        kimg = cur_nimg / 1e3
        means = collector.as_means()
        fields = {
            "Progress/kimg": kimg,
            "Progress/tick": tick,
            "Timing/sec_per_kimg":
                tick_time / max((cur_nimg - tick_start_nimg) / 1e3, 1e-8),
            "Timing/total_sec": time.time() - start_time,
            "Progress/augment_p": augment_p,
        }
        fields.update(means)
        stats_jsonl.write(json.dumps(fields) + "\n")
        stats_jsonl.flush()
        tb_writer.add_scalars(fields, step=cur_nimg)
        wandb_sink.log_scalars(fields, step=cur_nimg)
        print(f"tick {tick:<5d} kimg {kimg:<8.1f} "
              f"time {format_time(time.time() - start_time):<12s} "
              f"sec/kimg {fields['Timing/sec_per_kimg']:<7.1f} "
              f"Gloss {means.get('Loss/G/loss', float('nan')):<6.3f} "
              f"Dloss {means.get('Loss/D/loss', float('nan')):<6.3f}")
        collector.reset()

        # Snapshot renders and checkpoint saves fetch device state and can
        # hit the same silent v5e device-call hang as steps (observed on an
        # end-of-run save: 0% CPU, futex wait, forever) — keep the watchdog
        # armed through them too.
        watchdog_deadline[0] = time.time() + step_timeout_sec
        if image_snapshot_ticks is not None and tick % image_snapshot_ticks == 0:
            # Image snapshots are diagnostics; the checkpoint below is the
            # artifact that costs chip-hours to reproduce.  A failed render
            # (e.g. RESOURCE_EXHAUSTED: the 512^2 frustum fakes program OOMs
            # next to the resident train state even at batch 1) must degrade
            # to a loud skip, not kill the run before the save.  Offline
            # renders from the saved checkpoint cover the lost images.
            try:
                fakes = _save_fakes(G, state["G_ema"], grid_z, grid_batch,
                                    grid_n, run_dir, cur_nimg,
                                    dataset.data_type, tb_writer=tb_writer,
                                    wandb_sink=wandb_sink)
            except Exception as e:
                fakes = None
                print(f"image snapshot FAILED (continuing to checkpoint "
                      f"save): {type(e).__name__}: {e}", flush=True)
            try:
                if fakes is None:
                    raise RuntimeError("no fakes rendered this tick")
                fd = _fd_trend_real_fake(grid_batch["image"][:grid_n], fakes)
                with open(os.path.join(run_dir, "quality.jsonl"), "a") as qf:
                    qf.write(json.dumps(
                        {"kimg": kimg, "fd_proxy_real_fake": fd}) + "\n")
                tb_writer.add_scalars(
                    {"Metrics/fd_proxy_real_fake": fd}, step=cur_nimg)
                print(f"fd_proxy_real_fake {fd:.4g}", flush=True)
            except Exception as e:  # trend is best-effort; never kill a run
                print(f"fd trend skipped: {e}", flush=True)
        # re-arm per device-touching operation: a legitimate cold snapshot
        # compile (~20 min) plus a multi-GB save must not share one deadline
        watchdog_deadline[0] = time.time() + step_timeout_sec
        if snapshot_ticks is not None and tick % snapshot_ticks == 0:
            save_checkpoint(
                os.path.join(run_dir, f"network-snapshot-{cur_nimg//1000:06d}.ckpt"),
                state, config=dict(g_config=g_config), step=cur_nimg)
        watchdog_deadline[0] = None

        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)
        if done or (abort_fn is not None and abort_fn()):
            break
        tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()

    watchdog_deadline[0] = time.time() + step_timeout_sec
    save_checkpoint(os.path.join(run_dir, "network-final.ckpt"), state,
                    config=dict(g_config=g_config), step=cur_nimg)
    watchdog_deadline[0] = None
    wandb_sink.finish()
    print(f"done: {cur_nimg / 1e3:.1f} kimg in "
          f"{format_time(time.time() - start_time)}")
    return state


def _save_fakes(G, params_ema, grid_z, grid_batch, grid_n, run_dir, cur_nimg,
                data_type, tb_writer=None, wandb_sink=None,
                multiview_yaws=(-0.35, 0.0, 0.35)):
    """Full snapshot inventory (ref `training_loop.py:602-691`): SR fakes,
    raw neural render, normalized depth, semantic label map, and a
    multi-view grid of the first seeds under yaw offsets."""
    batch = {"mask": jnp.asarray(grid_batch["mask"][:grid_n]),
             "pose": jnp.asarray(grid_batch["pose"][:grid_n])}

    # Micro-batched snapshot renders: the training state (params + opt +
    # EMA, ~2 GB) stays resident in HBM, so a full-grid G program can OOM
    # where the training step itself fits (observed with the frustum
    # sampler's sheared-texture temps at grid_n=8).  One image per program
    # bounds the working set AND reuses a single compiled batch-1 program
    # across the grid and every multi-view yaw.
    def g_chunked(z_all, pose_all, batch_all, chunk=1):
        outs = []
        for i in range(0, z_all.shape[0], chunk):
            sl = slice(i, i + chunk)
            b = {"mask": batch_all["mask"][sl], "pose": batch_all["pose"][sl]}
            outs.append(G(params_ema, z_all[sl], pose_all[sl], b,
                          noise_mode="const", det=True))
        return {k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)
                for k in outs[0] if k != "planes"}

    out = g_chunked(jnp.asarray(grid_z), batch["pose"], batch)
    tag = f"{cur_nimg // 1000:06d}"

    def emit(name, arr_uint8):
        path = os.path.join(run_dir, f"fakes{tag}{name}.png")
        grid = save_image_grid(arr_uint8, path)
        if tb_writer is not None or (wandb_sink is not None
                                     and wandb_sink.enabled):
            img = np.clip(np.rint(arr_uint8), 0, 255).astype(np.uint8)
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            if tb_writer is not None:
                tb_writer.add_image(f"fakes{name or '/sr'}", _to_grid(img),
                                    cur_nimg)
            if wandb_sink is not None:
                wandb_sink.log_images(f"fakes{name or '/sr'}", img, cur_nimg)
        return grid

    emit("", (np.asarray(out["image"]) + 1) * 127.5)
    emit("_raw", (np.asarray(out["image_raw"]) + 1) * 127.5)
    depth = np.asarray(out["image_depth"])
    lo, hi = depth.min(), depth.max()
    emit("_depth", (depth - lo) / max(hi - lo, 1e-8) * 255.0)
    if data_type == "seg":
        sem = np.argmax(np.asarray(out["semantic"]), axis=-1)
        emit("_label", color_mask(sem))

    # multi-view grid: first seeds rendered under yaw offsets around the
    # canonical orbit (ref's multi-view snapshot, `training_loop.py:643-668`)
    n_mv = min(grid_n, 3)
    views = []
    for yaw in multiview_yaws:
        c2w = LookAtPoseSampler.sample(
            None, np.pi / 2 + yaw, np.pi / 2, [0, 0, 0], radius=2.7,
            batch_size=n_mv)
        pose_mv = pose_to_conditioning(
            jnp.asarray(c2w), jnp.asarray(grid_batch["pose"][0, 16:25])
            .reshape(3, 3))
        mv = g_chunked(jnp.asarray(grid_z[:n_mv]), pose_mv,
                       {"mask": batch["mask"][:n_mv],
                        "pose": batch["pose"][:n_mv]})
        views.append((np.asarray(mv["image"]) + 1) * 127.5)
    mv_grid = np.concatenate(views, axis=0)  # [n_yaws * n_mv, H, W, 3]
    save_image_grid(mv_grid, os.path.join(run_dir, f"fakes{tag}_mv.png"),
                    grid_cols=n_mv)
    return np.asarray(out["image"])  # SR fakes in [-1, 1], for the fd trend


# Per-run cache for the real-vs-fake feature-distance trend: the detector
# and the (fixed) real-grid features are computed once per process.
_FD_TREND_CACHE = {}


def _fd_trend_real_fake(reals, fakes):
    """Frechet feature distance between the fixed real snapshot grid and
    this snapshot's generated fakes (both [n, H, W, 3] in [-1, 1]) under
    the offline detector (real Inception when PIX2PIX3D_INCEPTION_NPZ is
    set, else the documented fixed-seed random-conv proxy).  Grid-sized n
    makes the absolute value noisy; the signal is the DECREASING TREND
    across a run — the first real-vs-fake (not pipeline-vs-pipeline)
    generative-quality measurement (ref FID semantics,
    `metrics/frechet_inception_distance.py:22-43`)."""
    from ..metrics.metric_utils import get_feature_extractor
    from ..metrics.frechet_inception_distance import frechet_lowrank
    to_u8 = lambda x: np.clip((np.asarray(x) + 1) * 127.5, 0, 255) \
        .astype(np.float32)
    if "detector" not in _FD_TREND_CACHE:
        _FD_TREND_CACHE["detector"] = get_feature_extractor()
    det = _FD_TREND_CACHE["detector"]
    if "real_feats" not in _FD_TREND_CACHE:
        _FD_TREND_CACHE["real_feats"] = np.asarray(det(to_u8(reals)))
    fake_feats = np.asarray(det(to_u8(fakes)))
    return frechet_lowrank(_FD_TREND_CACHE["real_feats"], fake_feats)


def _to_grid(images):
    """[N, H, W, C] uint8 -> one [H', W', C] grid array (for TB images)."""
    n, h, w, c = images.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.zeros((rows * h, cols * w, c), dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = images[i]
    return grid
