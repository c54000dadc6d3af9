"""Optional Weights & Biases sink.

Mirrors the reference's wandb usage (`training/training_loop.py:396-399`
init; scalar logging per tick; image-table logging `:150-225`) as a
no-op-when-unavailable adapter: this container has no `wandb` package and
no egress, so the sink gates on importability AND the `PIX2PIX3D_WANDB`
env var (set it to a project name to enable).  stats.jsonl + TensorBoard
remain the canonical sinks either way.
"""

from __future__ import annotations

import os


class WandbSink:
    def __init__(self, run_dir, config=None, run_name=None):
        self._run = None
        project = os.environ.get("PIX2PIX3D_WANDB")
        if not project:
            return
        try:
            import wandb
        except ImportError:
            import warnings
            warnings.warn("PIX2PIX3D_WANDB set but the wandb package is not "
                          "installed; scalar/image logs go to stats.jsonl + "
                          "TensorBoard only.")
            return
        self._wandb = wandb
        self._run = wandb.init(project=project, dir=run_dir,
                               name=run_name or os.path.basename(run_dir),
                               config=config or {}, resume="allow")

    @property
    def enabled(self):
        return self._run is not None

    def log_scalars(self, fields, step):
        """Per-tick scalar dict (ref `training_loop.py:789-795`)."""
        if self._run is not None:
            self._run.log(dict(fields), step=int(step))

    def log_images(self, name, images_uint8, step, caption=None):
        """[N, H, W, C] uint8 grid entries (ref image tables `:150-225`)."""
        if self._run is None:
            return
        imgs = [self._wandb.Image(im, caption=caption) for im in images_uint8]
        self._run.log({name: imgs}, step=int(step))

    def finish(self):
        if self._run is not None:
            self._run.finish()
            self._run = None
