"""Interactive-editing session API (headless equivalent of the reference's
Qt demo, `applications/demo/qt_demo_seg2cat.py` + `ui_qt/`).

The Qt demo's capabilities map to this programmatic session:
- per-class brush edits on the label map  -> `set_mask` / `paint`
- yaw/pitch/roll + truncation sliders re-rendering with cached ws
  (ref `qt_demo_seg2cat.py:371-386`)       -> `render(yaw, pitch, ...)`
- "reconstruct" re-running mapping from the edited mask (ref `:202-258`)
                                           -> `reconstruct()`

Plane caching makes slider interaction one renderer+SR pass per frame
(the tri-plane backbone is NOT re-run unless the mask or z changes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.triplane import _reshape_planes
from ..render.camera import LookAtPoseSampler, pose_to_conditioning
from .common import intrinsics_for


class EditSession:
    def __init__(self, G, params, app, mask, seed=0, radius=2.7,
                 pivot=(0, 0, 0), truncation_psi=1.0):
        self.G = G
        self.params = params
        self.app = app
        self.radius = radius
        self.pivot = list(pivot)
        self.truncation_psi = truncation_psi
        self.z = jax.random.normal(jax.random.PRNGKey(seed), (1, G.z_dim))
        self._ws = None
        self._planes = None
        self.set_mask(mask)

        nrr = app["neural_rendering_resolution"]

        @jax.jit
        def _render(params, ws, planes, pose):
            out = G.synthesis(params, ws, pose, neural_rendering_resolution=nrr,
                              noise_mode="const", det=True, planes=planes)
            return out["image"][0], out["semantic"][0], out["image_depth"][0]

        self._render_fn = _render

    # ------------------------------------------------------------- mask edit
    def set_mask(self, mask):
        """mask: `[H, W]` or `[H, W, 1]` raw labels / edge uint8."""
        mask = np.asarray(mask)
        if mask.ndim == 2:
            mask = mask[:, :, None]
        self.mask = mask.copy()
        self._ws = None  # force reconstruct

    def paint(self, ys, xs, label):
        """Brush: set mask[ys, xs] = label (the demo's per-class brushes)."""
        self.mask[ys, xs] = label
        self._ws = None

    def set_seed(self, seed):
        self.z = jax.random.normal(jax.random.PRNGKey(seed), (1, self.G.z_dim))
        self._ws = None

    # ------------------------------------------------------------ inference
    def reconstruct(self):
        """Re-run conditional mapping + backbone from the current mask."""
        mask_in = jnp.asarray(self.mask, jnp.float32)[None]
        if self.G.data_type == "edge":
            mask_in = -(mask_in / 127.5 - 1)
        pose = self._pose(0.0, 0.0)
        batch = {"mask": mask_in, "pose": pose}
        self._ws = self.G.mapping(self.params, self.z, pose, batch,
                                  truncation_psi=self.truncation_psi)
        planes_img = self.G.backbone.synthesis(
            self.params["backbone"]["synthesis"], self._ws, noise_mode="const")
        self._planes = _reshape_planes(planes_img)
        return self._ws

    def _pose(self, yaw, pitch):
        c2w = LookAtPoseSampler.sample(None, np.pi / 2 + yaw,
                                       np.pi / 2 + pitch, self.pivot,
                                       radius=self.radius, batch_size=1)
        return pose_to_conditioning(c2w, intrinsics_for(self.app))

    def render(self, yaw=0.0, pitch=0.0):
        """One frame at the given camera offset; returns (rgb, semantic,
        depth) NHW[C] numpy arrays.  Cached planes: only renderer + SR run."""
        if self._ws is None:
            self.reconstruct()
        pose = self._pose(yaw, pitch)
        img, sem, depth = self._render_fn(self.params, self._ws, self._planes,
                                          pose)
        return np.asarray(img), np.asarray(sem), np.asarray(depth)
