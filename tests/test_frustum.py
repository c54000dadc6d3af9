"""Frustum slab sampler: geometry, factorization conditioning, and quality
drift vs the parity (gather) renderer.

The frustum path (render/frustum.py) must (a) reproduce the exact affine
map the gather path evaluates point-by-point (validated here by comparing
against grid_sample at identical coordinates), (b) keep its shear
factorization well conditioned across the supported camera orbit, and
(c) composite to images close to the parity renderer (placement differs by
design: regular z-depth vs stratified+importance — drift is measured)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pix2pix3d_tpu.render import frustum
from pix2pix3d_tpu.render.camera import LookAtPoseSampler, fov_to_intrinsics
from pix2pix3d_tpu.render.renderer import (ImportanceRenderer,
                                           sample_from_planes, render_rays)
from pix2pix3d_tpu.render.ray_sampler import sample_rays

BW = 1.0  # box_warp


def _camera(yaw=np.pi / 2, pitch=np.pi / 2, radius=2.7, fov=18.837):
    c2w = LookAtPoseSampler.sample(None, yaw, pitch, [0, 0, 0], radius=radius)
    return jnp.asarray(c2w), jnp.asarray(fov_to_intrinsics(fov))[None]


def _smooth_planes(key, n=1, s=64, c=8, blur=4):
    x = jax.random.normal(key, (n, 3, s, s, c))
    k = jnp.ones((blur, blur)) / blur ** 2
    x = jax.vmap(jax.vmap(
        lambda img: jax.scipy.signal.convolve2d(img, k, mode="same"),
        in_axes=-1, out_axes=-1))(x.reshape(n * 3, s, s, c)).reshape(
            n, 3, s, s, c)
    return x.astype(jnp.float32)


def _frustum_points(coeffs, t, nrr, n_img=1):
    """[N, R, 3] world points of one slab, (i,j) row-major like the output."""
    ii = (jnp.arange(nrr, dtype=jnp.float32) + 0.5) / nrr
    vv, uu = jnp.meshgrid(ii, ii, indexing="ij")
    d = (uu.reshape(-1)[None, :, None] * coeffs["a_u"][:, None, :]
         + vv.reshape(-1)[None, :, None] * coeffs["a_v"][:, None, :]
         + coeffs["a_0"][:, None, :])
    # origin: recover from E0 = P*o scaled; easier to rebuild directly
    return d  # caller adds origin + scales by t


def test_factorization_reconstructs_B_across_orbit():
    s = 64
    yaws = np.pi / 2 + np.linspace(-0.6, 0.6, 7)
    pitches = np.pi / 2 + np.linspace(-0.4, 0.4, 5)
    worst = 0.0
    max_a = max_b = 0.0
    for yaw in yaws:
        for pitch in pitches:
            c2w, intr = _camera(yaw, pitch)
            co = frustum.frustum_coeffs(c2w, intr, nrr=32, plane_res=s,
                                        box_warp=BW)
            a, b, d1, d2, F0, F1, flip = frustum.factor_shears(
                co["B"], co["E0"], co["E1"])
            B = np.asarray(co["B"])[0]
            fl = np.asarray(flip)[0]
            a_, b_, d1_, d2_ = (np.asarray(v)[0] for v in (a, b, d1, d2))
            for q in range(3):
                Bq = B[q][::-1] if fl[q] else B[q]
                recon = np.array(
                    [[d1_[q] * (1 + a_[q] * b_[q]), a_[q] * d2_[q]],
                     [b_[q] * d1_[q], d2_[q]]])
                err = np.abs(recon - Bq).max() / (np.abs(Bq).max() + 1e-9)
                worst = max(worst, err)
                max_a = max(max_a, abs(a_[q]))
                max_b = max(max_b, abs(b_[q]))
    assert worst < 1e-4, f"factorization broke somewhere in the orbit: {worst}"
    # shear magnitudes must stay within the static margins
    assert max_a * s <= frustum.MARGIN, max_a
    assert max_b * (s + 2 * frustum.MARGIN) <= 2 * frustum.MARGIN + s, max_b


def test_slab_features_match_gather_axis_aligned():
    """Canonical pose -> diagonal B -> the shear passes are identity and the
    slab resample must match grid_sample near-exactly."""
    key = jax.random.PRNGKey(0)
    planes = _smooth_planes(key, s=64, c=8)
    c2w, intr = _camera()  # canonical: yaw=pitch=pi/2
    nrr, s = 32, 64
    co = frustum.frustum_coeffs(c2w, intr, nrr, s, BW)

    t_vals = jnp.asarray([[2.5, 2.7, 2.9]])  # [N=1, T=3] (slabs inside the box)
    feats = frustum.sample_slabs(planes, co, t_vals, nrr)  # [1, 3, nrr, nrr, C]

    # reference: gather at the same world points
    o = c2w[:, :3, 3]
    ii = (jnp.arange(nrr, dtype=jnp.float32) + 0.5) / nrr
    vv, uu = jnp.meshgrid(ii, ii, indexing="ij")
    dirs = (uu.reshape(-1)[None, :, None] * co["a_u"][:, None, :]
            + vv.reshape(-1)[None, :, None] * co["a_v"][:, None, :]
            + co["a_0"][:, None, :])
    for k in range(3):
        pts = o[:, None, :] + t_vals[0, k] * dirs
        ref = jnp.mean(sample_from_planes(planes, pts, BW), axis=1)  # [1,R,C]
        got = feats[:, k].reshape(1, -1, planes.shape[-1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)


@pytest.mark.parametrize("yaw,pitch", [(np.pi / 2 + 0.35, np.pi / 2 - 0.25),
                                       (np.pi / 2 - 0.3, np.pi / 2 + 0.2)])
def test_slab_features_accurate_under_rotation(yaw, pitch):
    """Rotated poses exercise the shears.  Criterion: against an ANALYTIC
    ground-truth field (a sinusoid resolvable at the texture resolution),
    the frustum chain must be as accurate as the bilinear gather itself —
    it is a different interpolant of the same texels, not a degradation.
    (On unresolvable noise fields the two interpolants legitimately
    disagree; that is not an error metric.)"""
    s, nrr = 64, 32
    yy, xx = jnp.meshgrid(jnp.arange(s, dtype=jnp.float32),
                          jnp.arange(s, dtype=jnp.float32), indexing="ij")
    f = jnp.sin(2 * np.pi * (xx + 0.7 * yy) / 16.0)  # wavelength 16 texels
    planes = jnp.tile(f[None, None, :, :, None], (1, 3, 1, 1, 1))
    c2w, intr = _camera(yaw, pitch)
    co = frustum.frustum_coeffs(c2w, intr, nrr, s, BW)
    t_vals = jnp.asarray([[2.7]])
    got = np.asarray(frustum.sample_slabs(planes, co, t_vals, nrr)
                     )[0, 0].reshape(-1)

    o = c2w[:, :3, 3]
    ii = (jnp.arange(nrr, dtype=jnp.float32) + 0.5) / nrr
    vv, uu = jnp.meshgrid(ii, ii, indexing="ij")
    dirs = (uu.reshape(-1)[None, :, None] * co["a_u"][:, None, :]
            + vv.reshape(-1)[None, :, None] * co["a_v"][:, None, :]
            + co["a_0"][:, None, :])
    pts = o[:, None, :] + 2.7 * dirs
    ref = np.asarray(jnp.mean(sample_from_planes(planes, pts, BW),
                              axis=1))[0, :, 0]

    from pix2pix3d_tpu.render.renderer import project_onto_planes
    proj = project_onto_planes((2.0 / BW) * pts)
    texel = (np.asarray(proj) + 1) * (s / 2) - 0.5  # [1, 3, M, 2]
    interior = ((texel >= 3) & (texel <= s - 4)).all(axis=(1, 3))[0]
    assert interior.sum() > 100
    true = np.sin(2 * np.pi * (texel[0, :, :, 0] + 0.7 * texel[0, :, :, 1])
                  / 16.0).mean(0)

    err_gather = np.abs(ref - true)[interior].max()
    err_frustum = np.abs(got - true)[interior].max()
    assert err_frustum < max(1.5 * err_gather, 0.01), \
        f"frustum {err_frustum:.4f} vs gather {err_gather:.4f}"
    # and the two interpolants must agree within their own truth error
    assert np.abs(got - ref)[interior].max() < 2.5 * err_gather


def test_generator_frustum_path_matches_gather():
    """End-to-end generator synthesis with sampler='frustum' vs the parity
    sampler on a random-init tiny seg2cat-style model: the rendered raw
    images must agree closely (real backbone planes are smooth)."""
    from pix2pix3d_tpu import config as cfg_mod
    from pix2pix3d_tpu.models import build_generator
    from pix2pix3d_tpu.render.camera import pose_to_conditioning

    cfg = cfg_mod.generator_config(
        cfg="afhq", resolution=128, data_type="seg", semantic_channels=6,
        cbase=1024, cmax=32, sr_num_fp16_res=0, render_mask=True,
        gen_pose_cond=True)
    cfg["rendering_kwargs"].update(depth_resolution=24,
                                   depth_resolution_importance=24)
    cfg["mapping_kwargs"]["in_resolution"] = 128
    cfg["mapping_kwargs"]["encoder_channel_base"] = 1 / 128
    G = build_generator(**cfg)
    params = G.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(1, G.z_dim).astype(np.float32))
    mask = jnp.asarray(rng.randint(0, 6, (1, 128, 128, 1)).astype(np.float32))
    c2w, intr = _camera(np.pi / 2 + 0.15, np.pi / 2 - 0.1)
    pose = pose_to_conditioning(c2w, intr[0])
    batch = {"mask": mask, "pose": pose}

    out_ref = G(params, z, pose, batch, neural_rendering_resolution=32,
                noise_mode="const", det=True)
    G.rendering_kwargs["sampler"] = "frustum"
    G.rendering_kwargs["frustum_depth_steps"] = 48
    G.rendering_kwargs["frustum_chunk"] = 16
    out_fr = G(params, z, pose, batch, neural_rendering_resolution=32,
               noise_mode="const", det=True)

    for key in ("image_raw", "semantic_raw"):
        a = np.asarray(out_ref[key])
        b = np.asarray(out_fr[key])
        rmse = np.sqrt(((a - b) ** 2).mean())
        span = a.max() - a.min() + 1e-9
        psnr = 20 * np.log10(span / (rmse + 1e-12))
        assert psnr > 25, f"{key}: PSNR {psnr:.1f} vs parity sampler"
    assert np.isfinite(np.asarray(out_fr["image"])).all()


def test_frustum_render_vs_parity_renderer():
    """Full composite vs the parity two-pass renderer on a smooth field."""
    key = jax.random.PRNGKey(2)
    planes = _smooth_planes(key, s=64, c=8)

    from pix2pix3d_tpu.models.triplane import OSGDecoder
    dec = OSGDecoder(8, {"decoder_lr_mul": 1, "decoder_output_dim": 4})
    dp = dec.init(jax.random.PRNGKey(3))
    decoder = lambda f, d: dec(dp, f, d)

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "depth_resolution": 24, "depth_resolution_importance": 24,
            "disparity_space_sampling": False, "clamp_mode": "softplus",
            "white_back": False}
    c2w, intr = _camera(np.pi / 2 + 0.2, np.pi / 2 - 0.1)
    nrr = 32

    ro, rd = sample_rays(c2w, intr, nrr)
    renderer = ImportanceRenderer()
    ref_feats, ref_depth, ref_w = renderer(planes, decoder, ro, rd, opts,
                                           rng=None, det=True)

    got_feats, got_depth, got_w = frustum.frustum_render(
        planes, decoder, c2w, intr, opts, nrr, depth_steps=96, chunk=16)

    ref = np.asarray(ref_feats)
    got = np.asarray(got_feats)
    rmse = np.sqrt(((got - ref) ** 2).mean())
    span = ref.max() - ref.min() + 1e-9
    psnr = 20 * np.log10(span / (rmse + 1e-12))
    assert psnr > 25, f"frustum composite too far from parity: PSNR {psnr:.1f}"
    # weights (alpha accumulation) should agree closely too
    w_err = np.abs(np.asarray(got_w) - np.asarray(ref_w)).mean()
    assert w_err < 0.05, w_err


@pytest.mark.parametrize("yaw,pitch", [(np.pi / 2, np.pi / 2),
                                       (np.pi / 2 + 0.6, np.pi / 2 - 0.4)])
def test_windowed_slab_resample_matches_full(yaw, pitch):
    """The windowed contraction (serving default at nrr<=128, chunk<=T/12)
    is mathematically identical to the full-ext contraction: the window
    covers every nonzero hat tap at production geometry (S=256, nrr=128,
    seg2cat depth range), including the orbit extremes."""
    S, nrr, T, chunk, C = 256, 128, 96, 8, 1
    key = jax.random.PRNGKey(5)
    planes = jax.random.normal(key, (1, 3, S, S, C), jnp.float32)

    def decoder(feats, dirs):
        return {"rgb": feats[..., :1].reshape(feats.shape[0], -1, 1),
                "sigma": feats.reshape(feats.shape[0], -1, C).sum(-1,
                                                                  keepdims=True)}

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "depth_resolution": 48, "depth_resolution_importance": 48,
            "white_back": False}
    c2w, intr = _camera(yaw, pitch)
    full = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                  depth_steps=T, chunk=chunk,
                                  window=(S + 256, S + 256))
    win = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                 depth_steps=T, chunk=chunk,
                                 window=(256, 384))
    for a, b in zip(full, win):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_frustum_render_is_differentiable():
    """Training mode: grads flow through the full frustum chain (shears,
    windowed slab contractions, per-chunk remat scan, composite) to both
    the planes and the decoder params — finite and nonzero."""
    from pix2pix3d_tpu.models.triplane import OSGDecoder
    key = jax.random.PRNGKey(7)
    planes = _smooth_planes(key, s=64, c=8)
    dec = OSGDecoder(8, {"decoder_lr_mul": 1, "decoder_output_dim": 4})
    dp = dec.init(jax.random.PRNGKey(8))
    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "white_back": False, "depth_resolution": 16,
            "depth_resolution_importance": 16}
    c2w, intr = _camera(np.pi / 2 + 0.2, np.pi / 2 - 0.1)

    def loss_fn(planes, dp):
        decoder = lambda f, d: dec(dp, f, d)
        feats, depth, w = frustum.frustum_render(
            planes, decoder, c2w, intr, opts, nrr=16, depth_steps=32,
            chunk=8)
        return jnp.mean(jnp.square(feats)) + jnp.mean(w)

    (gp, gd) = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(planes, dp)
    assert np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gp).max()) > 0
    for leaf in jax.tree_util.tree_leaves(gd):
        assert np.isfinite(np.asarray(leaf)).all()
    assert any(float(jnp.abs(l).max()) > 0
               for l in jax.tree_util.tree_leaves(gd))


def test_window_check_poisons_out_of_envelope():
    """ADVICE round 2: a window too small for the camera geometry must NaN
    the output (loud failure), not silently zero-fade; in-envelope renders
    with the default window stay finite with the check enabled."""
    S, nrr, T, chunk = 64, 32, 32, 8

    def decoder(feats, dirs):
        n = feats.shape[0]
        return {"rgb": feats.reshape(n, -1, feats.shape[-1])[..., :4],
                "sigma": feats.reshape(n, -1, feats.shape[-1]).sum(
                    -1, keepdims=True)}

    planes = jax.random.normal(jax.random.PRNGKey(1), (1, 3, S, S, 4),
                               jnp.float32)
    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "white_back": False, "frustum_window_check": True}
    c2w, intr = _camera()

    # default (full) window in-envelope: finite
    ok, _, _ = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                      depth_steps=T, chunk=chunk)
    assert np.isfinite(np.asarray(ok)).all()

    # deliberately undersized window: the guard must poison the render
    bad, _, _ = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                       depth_steps=T, chunk=chunk,
                                       window=(16, 16))
    assert np.isnan(np.asarray(bad)).any(), \
        "undersized window produced finite output — coverage guard inert"

    # same undersized window with the check disabled: silently finite
    # (documents the pre-guard behavior the guard exists to catch)
    opts_off = dict(opts, frustum_window_check=False)
    quiet, _, _ = frustum.frustum_render(planes, decoder, c2w, intr, opts_off,
                                         nrr, depth_steps=T, chunk=chunk,
                                         window=(16, 16))
    assert np.isfinite(np.asarray(quiet)).all()


@pytest.mark.parametrize("yaw,pitch", [(np.pi / 2, np.pi / 2),
                                       (np.pi / 2 + 0.6, np.pi / 2 - 0.4),
                                       (np.pi / 2 - 0.6, np.pi / 2 + 0.4)])
def test_tiled_slab_resample_matches_full(yaw, pitch):
    """The per-output-tile sub-window contraction (opt-in via
    frustum_tiles; the measured-faster chunk window is the default —
    round-4 A/B) is mathematically identical to the
    full-ext contraction: each 32-output tile's window covers every
    nonzero hat tap at production geometry (S=256, nrr=128, seg2cat depth
    range), including the orbit extremes."""
    S, nrr, T, chunk, C = 256, 128, 96, 8, 1
    key = jax.random.PRNGKey(5)
    planes = jax.random.normal(key, (1, 3, S, S, C), jnp.float32)

    def decoder(feats, dirs):
        return {"rgb": feats[..., :1].reshape(feats.shape[0], -1, 1),
                "sigma": feats.reshape(feats.shape[0], -1, C).sum(
                    -1, keepdims=True)}

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "depth_resolution": 48, "depth_resolution_importance": 48,
            "white_back": False}
    c2w, intr = _camera(yaw, pitch)
    full = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                  depth_steps=T, chunk=chunk,
                                  window=(S + 256, S + 256))
    tiled = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                   depth_steps=T, chunk=chunk,
                                   tiles=(32, 96, 32, 96, 256))
    for a, b in zip(full, tiled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nrr", [32, 64])
def test_default_window_spec_covers_small_nrr(nrr):
    """The auto-selected contraction spec (now the single (384, 448)
    chunk window; tiles are opt-in via frustum_tiles) must stay finite
    AND exact vs the full contraction across the orbit extremes at BOTH
    nrr=32 and nrr=64, not just the nrr=128 calibration point.

    History (round-3 regression, kept as the reason this test exists):
    when tiles were the default, the output-group gi had to scale with
    nrr — a fixed gi=32 tile at nrr=64 spans ~2x the texels of the
    nrr=128 calibration (per-output step = footprint/nrr), overflowing
    the 96-texel tile window, and the coverage guard NaN-poisoned EVERY
    render (found on the round-3 trained checkpoint; random-init tests
    at nrr=128 never hit it).  The opt-in tiles path keeps gi=nrr//4."""
    S, T, chunk, C = 256, 96, 8, 1
    planes = jax.random.normal(jax.random.PRNGKey(3), (1, 3, S, S, C),
                               jnp.float32)

    def decoder(feats, dirs):
        return {"rgb": feats[..., :1].reshape(feats.shape[0], -1, 1),
                "sigma": feats.reshape(feats.shape[0], -1, C).sum(
                    -1, keepdims=True)}

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "white_back": False, "frustum_window_check": True}
    for yaw, pitch in [(np.pi / 2, np.pi / 2),
                       (np.pi / 2 + 0.6, np.pi / 2 - 0.4)]:
        c2w, intr = _camera(yaw, pitch)
        auto = frustum.frustum_render(planes, decoder, c2w, intr, opts,
                                      nrr, depth_steps=T, chunk=chunk)
        assert np.isfinite(np.asarray(auto[0])).all(), \
            f"default window spec poisoned an in-envelope render (nrr={nrr})"
        full = frustum.frustum_render(planes, decoder, c2w, intr, opts,
                                      nrr, depth_steps=T, chunk=chunk,
                                      window=(S + 256, S + 256))
        for a, b in zip(auto, full):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_nonstandard_geometry_falls_back_to_full():
    """The calibrated window/tile specs assume S=256, box_warp=1; any
    other static geometry (e.g. the shapenet edge2car box_warp=1.6) must
    auto-select the exact full contraction and render finite."""
    S, nrr, T, chunk, C = 64, 32, 96, 8, 1
    planes = jax.random.normal(jax.random.PRNGKey(4), (1, 3, S, S, C),
                               jnp.float32)

    def decoder(feats, dirs):
        return {"rgb": feats[..., :1].reshape(feats.shape[0], -1, 1),
                "sigma": feats.reshape(feats.shape[0], -1, C).sum(
                    -1, keepdims=True)}

    opts = {"ray_start": 0.5, "ray_end": 2.9, "box_warp": 1.6,
            "white_back": True, "frustum_window_check": True}
    c2w, intr = _camera(np.pi / 2 + 0.9, np.pi / 2 - 0.3)
    out, _, _ = frustum.frustum_render(planes, decoder, c2w, intr, opts,
                                       nrr, depth_steps=T, chunk=chunk)
    assert np.isfinite(np.asarray(out)).all(), \
        "non-standard geometry default poisoned (should fall back to full)"


def test_tiled_window_check_poisons_out_of_envelope():
    """The coverage guard understands the tiled sub-window spec: undersized
    tile windows NaN-poison the render; the default tiled spec in-envelope
    stays finite with the check on."""
    S, nrr, T, chunk, C = 256, 128, 96, 8, 1
    planes = jax.random.normal(jax.random.PRNGKey(1), (1, 3, S, S, C),
                               jnp.float32)

    def decoder(feats, dirs):
        return {"rgb": feats[..., :1].reshape(feats.shape[0], -1, 1),
                "sigma": feats.reshape(feats.shape[0], -1, C).sum(
                    -1, keepdims=True)}

    opts = {"ray_start": 2.25, "ray_end": 3.3, "box_warp": BW,
            "white_back": False, "frustum_window_check": True}
    c2w, intr = _camera(np.pi / 2 + 0.6, np.pi / 2 - 0.4)

    ok, _, _ = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                      depth_steps=T, chunk=chunk,
                                      tiles=(32, 96, 32, 96, 256))
    assert np.isfinite(np.asarray(ok)).all(), \
        "default tiled windows flagged in-envelope camera"

    bad, _, _ = frustum.frustum_render(planes, decoder, c2w, intr, opts, nrr,
                                       depth_steps=T, chunk=chunk,
                                       tiles=(32, 16, 32, 16, 64))
    assert np.isnan(np.asarray(bad)).any(), \
        "undersized tile windows produced finite output — guard inert"
