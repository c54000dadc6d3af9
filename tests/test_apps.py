"""App-level tests with the tiny generator (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.utils.marching_cubes import marching_cubes
from pix2pix3d_tpu.apps.extract_mesh import save_ply


def test_marching_cubes_sphere():
    n = 32
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    vol = 1.0 - np.sqrt(x ** 2 + y ** 2 + z ** 2)
    verts, faces = marching_cubes(vol, 0.5)
    assert len(verts) > 100 and len(faces) > 100
    center = (n - 1) / 2
    r = np.linalg.norm(verts - center, axis=1) * (2 / (n - 1))
    assert abs(r.mean() - 0.5) < 0.01
    # watertight: every edge shared by exactly 2 faces
    edges = np.sort(np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_marching_cubes_empty():
    vol = np.zeros((8, 8, 8), np.float32)
    verts, faces = marching_cubes(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_save_ply(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    p = tmp_path / "m.ply"
    save_ply(str(p), verts, faces, colors)
    text = p.read_text()
    assert "element vertex 3" in text
    assert "element face 1" in text


def test_mesh_extraction_tiny():
    from tests.test_models import tiny_generator_config, make_inputs
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.apps.extract_mesh import extract_semantic_mesh

    cfg = tiny_generator_config()
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(0))
    z, mask, pose = make_inputs()
    ws = G.mapping(params, z, pose, {"mask": mask, "pose": pose})
    verts, faces, colors = extract_semantic_mesh(G, params, ws, resolution=24,
                                                 threshold=10.0)
    # random init: just check plumbing (shapes, finite)
    assert verts.shape[1] == 3
    assert colors.shape == (len(verts), 3)


def test_orbit_poses():
    from pix2pix3d_tpu.apps.common import APP_PRESETS
    from pix2pix3d_tpu.apps.generate_video import orbit_poses
    poses = orbit_poses(APP_PRESETS["seg2cat"], n_frames=12)
    assert poses.shape == (12, 25)
    assert np.isfinite(poses).all()


def test_app_generator_from_checkpoint_sidecar(tmp_path):
    """Apps must honor the <ckpt>.json config sidecar the training loop
    writes (`train/loop.py` save_checkpoint(config=dict(g_config=...))):
    a checkpoint whose architecture differs from the APP_PRESETS shape
    (here: the tiny 128^2 config) builds and loads without mismatch, and
    the app's neural rendering resolution scales with the checkpoint."""
    from tests.test_models import tiny_generator_config
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.train.checkpoint import save_checkpoint
    from pix2pix3d_tpu.apps.common import build_app_generator

    cfg = tiny_generator_config()
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "tiny.ckpt")
    save_checkpoint(ckpt, {"G_ema": params}, config=dict(g_config=cfg),
                    step=0)

    G2, params2, app = build_app_generator("seg2cat", checkpoint=ckpt)
    assert G2.img_resolution == cfg["img_resolution"]  # not the 512 preset
    assert app["neural_rendering_resolution"] == 64
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(params2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
