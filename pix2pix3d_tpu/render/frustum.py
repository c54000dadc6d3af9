"""Frustum-slab tri-plane renderer — the gather-free serving fast path.

Replaces the per-point plane gather of the parity renderer (ref hot loop
`volumetric_rendering/renderer.py:55-65`) for camera-ray rendering.  The
measured v5e floor for any gather-based sampler is ~40M slices/s
(NOTES_PERF.md), capping the parity path at ~16 img/s; this path performs
ZERO per-point gathers.

Key geometry: parametrize rays by z-depth, p(u, v, t) = o + t*(u*a_u +
v*a_v + a_0) — affine in the pixel lattice (u, v) at fixed t.  Projecting a
depth slab onto a tri-plane is then an affine resample of the plane texture
whose 2x2 linear part is t*B with a DEPTH-INDEPENDENT B.  Factoring
B = Shear_x(a) * Shear_y(b) * diag(d1, d2) (a, b depth-independent because
they are ratios of B entries) turns the whole render into:

  1. two texture-side shear passes per plane image (ONCE, shared by all
     depth slabs) — banded row/column matmuls on the MXU;
  2. per-slab axis-aligned scale+translate — two banded matmuls whose
     weights are shared across the other axis (pure MXU work,
     ~0.8 GFLOP/slab/plane);
  3. decoder MLP + front-to-back compositing with a scan carry over slab
     chunks (bounded memory).

Sample placement differs from the parity renderer (regular z-depth steps
vs per-ray stratified+importance along normalized directions), so this is
a DOCUMENTED-APPROXIMATION serving path, selected with
`rendering_kwargs['sampler'] = 'frustum'`; the gather path remains the
parity/training default.  Quality drift is measured in
tests/test_frustum.py and NOTES_PERF.md.

Supported domain: static scalar ray_start/ray_end (seg2cat/seg2face
presets), cameras within the standard object-centric orbit (the shear
margins and the per-plane pivot are validated across yaw +-0.6 / pitch
+-0.4 around the canonical pose in tests).  Out-of-domain poses should use
the parity sampler.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .renderer import _INV_PLANE_AXES

# static shear margin (texels); |a|,|b| <= MARGIN/S is the supported range
MARGIN = 128


def _safe_div(x, y, eps=1e-8):
    return jnp.where(jnp.abs(y) < eps, 0.0, x / jnp.where(jnp.abs(y) < eps,
                                                          1.0, y))


def frustum_coeffs(cam2world, intrinsics, nrr, plane_res, box_warp):
    """Per-(image, plane) affine coefficients of the slab resample.

    Returns dict with:
      B     [N, 3, 2, 2]  texel linear part per unit t (columns: d/dj, d/di)
      E0,E1 [N, 3, 2]     translation = E0 + t*E1 (texel units)
      a_u, a_v, a_0 [N, 3] world-space ray basis (for ||d|| and debugging)
    """
    R = cam2world[:, :3, :3]
    o = cam2world[:, :3, 3]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    R0, R1, R2 = R[:, :, 0], R[:, :, 1], R[:, :, 2]
    # cam-space lift (matches ray_sampler.sample_rays:43-47)
    a_u = R0 / fx
    a_v = R1 / fy - R0 * sk / (fx * fy)
    a_0 = R2 - R0 * (cx - cy * sk / fy) / fx - R1 * cy / fy

    # project_onto_planes contracts coords as a ROW vector (coords @ inv),
    # renderer.py:56-62 — so the 2D projector rows are inv_axes COLUMNS
    P = jnp.asarray(np.transpose(_INV_PLANE_AXES, (0, 2, 1))[:, :2, :],
                    jnp.float32) * (2.0 / box_warp)
    s_half = plane_res / 2.0

    def proj(vec):  # [N, 3] world -> [N, 3 planes, 2] texel-scaled
        return jnp.einsum("pij,nj->npi", P, vec) * s_half

    pu, pv, p0 = proj(a_u), proj(a_v), proj(a_0)
    tau0 = jnp.einsum("pij,nj->npi", P, o) * s_half + (s_half - 0.5)

    inv = 1.0 / nrr
    B = jnp.stack([pu * inv, pv * inv], axis=-1)     # [N, 3, 2, 2]
    E1 = p0 + (pu + pv) * (0.5 * inv)                # t-linear translation
    return {"B": B, "E0": tau0, "E1": E1,
            "a_u": a_u, "a_v": a_v, "a_0": a_0}


def factor_shears(B, E0, E1):
    """B = Shx(a)*Shy(b)*diag(d1,d2), with a per-(image,plane) texture
    transpose pivot keeping the factorization well conditioned.

    Returns (a, b, d1, d2, F0, F1, flip) with translation E'' = F0 + t*F1
    already propagated through the inverse shears; flip=True means the
    texture (and B rows / E components) were transposed first."""
    flip = jnp.abs(B[..., 1, 1]) < jnp.abs(B[..., 0, 1])   # [N, 3]

    def pick(mat, vec0, vec1, f):
        swap = f[..., None, None]
        m = jnp.where(swap, mat[..., ::-1, :], mat)
        v0 = jnp.where(f[..., None], vec0[..., ::-1], vec0)
        v1 = jnp.where(f[..., None], vec1[..., ::-1], vec1)
        return m, v0, v1

    B, E0, E1 = pick(B, E0, E1, flip)
    b11, b12 = B[..., 0, 0], B[..., 0, 1]
    b21, b22 = B[..., 1, 0], B[..., 1, 1]
    a = _safe_div(b12, b22)
    d1 = b11 - a * b21
    b = _safe_div(b21, d1)
    d2 = b22
    # E'' = Shy^-1 Shx^-1 E  (per component, t-linear parts independently)
    ex0, ey0 = E0[..., 0] - a * E0[..., 1], E0[..., 1]
    ex1, ey1 = E1[..., 0] - a * E1[..., 1], E1[..., 1]
    F0 = jnp.stack([ex0, ey0 - b * ex0], -1)
    F1 = jnp.stack([ex1, ey1 - b * ex1], -1)
    return a, b, d1, d2, F0, F1, flip


def _band_weights(centers, in_len, in_offset=0.0, dtype=jnp.float32,
                  kernel="linear"):
    """Interpolation taps: W[..., o, x] = k(x + in_offset - c(o)).

    centers [..., O]; returns [..., O, in_len].  Rows whose center is
    outside the input support come out all-zero = zeros padding.

    kernel='linear' is the 2-tap hat (bilinear semantics, matches
    grid_sample); kernel='cubic' is Catmull-Rom (4-tap) — used for the
    texture-side shear passes so the intermediate resamples do not low-pass
    the content (the band matmul cost is identical: the band is dense
    either way)."""
    x = jnp.arange(in_len, dtype=jnp.float32) + in_offset
    d = jnp.abs(x - centers[..., None])
    if kernel == "linear":
        w = jnp.maximum(0.0, 1.0 - d)
    else:  # Catmull-Rom
        w_near = (1.5 * d - 2.5) * d * d + 1.0
        w_far = ((-0.5 * d + 2.5) * d - 4.0) * d + 2.0
        w = jnp.where(d < 1.0, w_near, jnp.where(d < 2.0, w_far, 0.0))
    return w.astype(dtype)


def shear_pass(tex, slope, out_len, margin, compute_dtype=jnp.float32):
    """out[l, o, c] = tex sampled at (l, (o - margin) + slope*l) with linear
    interpolation and zeros padding.  tex [L, X, C] -> [L, out_len, C].

    One banded matmul per line batch; weights are built on the fly (VPU)
    and consumed by the MXU."""
    L, X, C = tex.shape
    lines = jnp.arange(L, dtype=jnp.float32)
    centers = (jnp.arange(out_len, dtype=jnp.float32)[None, :] - margin
               + slope * lines[:, None])                       # [L, out]
    W = _band_weights(centers, X, dtype=compute_dtype, kernel="cubic")
    return jnp.einsum("lox,lxc->loc", W, tex.astype(compute_dtype),
                      preferred_element_type=jnp.float32)


def shear_texture(tex, a, b, compute_dtype=jnp.float32):
    """Apply both texture-side shears: T2[y', x'] covers the extended
    [-MARGIN, S+MARGIN) range on both axes.

    tex [S, S, C] -> [S + 2*MARGIN, S + 2*MARGIN, C]."""
    S = tex.shape[0]
    ext = S + 2 * MARGIN
    # T1[y, x'] = T(y, (x' - M) + a*y): shear along x, lines = rows y
    t1 = shear_pass(tex, a, ext, MARGIN, compute_dtype)         # [S, ext, C]
    # T2[y', x'] = T1((y' - M) + b*(x' - M), x'): shear along y, lines = x'
    t1t = jnp.swapaxes(t1, 0, 1)                                # [ext, S, C]
    lines_off = jnp.arange(ext, dtype=jnp.float32) - MARGIN
    centers = (jnp.arange(ext, dtype=jnp.float32)[None, :] - MARGIN
               + b * lines_off[:, None])                        # [ext_x, ext_y]
    W = _band_weights(centers, S, dtype=compute_dtype, kernel="cubic")
    t2t = jnp.einsum("lox,lxc->loc", W, t1t.astype(compute_dtype),
                     preferred_element_type=jnp.float32)        # [ext_x, ext_y, C]
    return jnp.swapaxes(t2t, 0, 1)                              # [ext_y, ext_x, C]


def _win_start(centers, in_len, w):
    """Start index of a window of length `w` covering `centers`' taps:
    floor(min)-2 slack, clipped to the input, rounded down to sublane
    multiples of 8 (keeps the texture's tiled layout under dynamic_slice)."""
    return (jnp.clip(jnp.floor(jnp.min(centers)) - 2.0, 0, in_len - w)
            .astype(jnp.int32) // 8) * 8


def slab_resample(t2, t_vals, d1, d2, F0, F1, nrr, compute_dtype=jnp.float32,
                  win=None, tiles=None, channels_first=False):
    """Per-slab axis-aligned scale+translate on the sheared texture.

    t2 [ext, ext, C]; t_vals [T].  Returns [T, nrr, nrr, C]:
      out[t, i, j] = t2 sampled at (y = t*d2*i + F_y(t), x = t*d1*j + F_x(t)),
    array indices offset by MARGIN.

    win=(win_y, win_x): contract only a dynamic window of the texture that
    covers every tap of this chunk's centers (the chunk's support spans
    max|t*d|*(nrr-1) + per-slab drift texels — ~230-270 at the seg2cat
    orbit vs ext=512).  Mathematically identical to the full contraction
    (the hat weights outside the support are zero; zero-padding semantics
    for off-texture centers are preserved because clamping the window to
    the texture keeps exactly the taps the full version had).  Cuts the
    banded-matmul FLOPs ~2.3x and the [T, nrr, ext, C] intermediate 25%;
    exactness vs the full path is asserted in tests/test_frustum.py.

    tiles=(gi, wy_t, gj, wx_t, wxu): per-OUTPUT-TILE sub-windows — the
    round-3 refinement of `win`.  The support of a 32-output tile spans
    only |t*d|*gi + chunk drift ~= 60 texels at the seg2cat orbit (the
    236-texel chunk-wide span is dominated by the output extent, not the
    per-output support), so each tile of gi output rows contracts its own
    wy_t-texel y-window sliced from the texture, and each tile of gj output
    columns contracts a wx_t-texel x-window sliced from the stage-1
    intermediate (itself restricted to a wxu-texel union x-window).  FLOPs
    vs the single (256, 384) window: stage 1 drops (256*384 -> wy_t*wxu),
    stage 2 drops (384 -> wx_t) — 4x combined at the default
    (32, 96, 32, 96, 256).  Same zero-padding equivalence argument as
    `win`; exactness asserted in tests/test_frustum.py, runtime coverage
    enforced by `window_coverage_violation(tiles=...)`."""
    ext = t2.shape[0]
    ii = jnp.arange(nrr, dtype=jnp.float32)
    cy = (t_vals[:, None] * d2 * ii[None, :]
          + (F0[1] + t_vals[:, None] * F1[1]) + MARGIN)         # [T, nrr]
    cx = (t_vals[:, None] * d1 * ii[None, :]
          + (F0[0] + t_vals[:, None] * F1[0]) + MARGIN)
    T, C = t_vals.shape[0], t2.shape[2]

    if tiles is not None:
        gi, wy_t, gj, wx_t, wxu = tiles
        wxu = min(wxu, ext)
        wy_t = min(wy_t, ext)
        wx_t = min(wx_t, wxu)
        # union x-window: one slice shared by every tile's stage-1 matmul
        if wxu < ext:
            x0u = _win_start(cx, ext, wxu)
            t2 = jax.lax.dynamic_slice(t2, (0, x0u, 0), (ext, wxu, C))
            cx = cx - x0u.astype(jnp.float32)
        # stage 1: per-i-tile y-windows, y contracted, x carried
        vs = []
        for i0 in range(0, nrr, gi):
            cy_t = cy[:, i0:i0 + gi]
            y0 = _win_start(cy_t, ext, wy_t)
            sl = jax.lax.dynamic_slice(t2, (y0, 0, 0), (wy_t, wxu, C))
            Wy = _band_weights(cy_t - y0.astype(jnp.float32), wy_t,
                               dtype=compute_dtype)
            vs.append(jnp.einsum("tiy,yxc->tixc", Wy,
                                 sl.astype(compute_dtype),
                                 preferred_element_type=jnp.float32))
        v = jnp.concatenate(vs, axis=1)                 # [T, nrr, wxu, C]
        # stage 2: per-j-tile x-windows sliced from the intermediate
        outs = []
        for j0 in range(0, nrr, gj):
            cx_t = cx[:, j0:j0 + gj]
            x0 = _win_start(cx_t, wxu, wx_t)
            slv = jax.lax.dynamic_slice(
                v, (0, 0, x0, 0), (T, nrr, wx_t, C))
            Wx = _band_weights(cx_t - x0.astype(jnp.float32), wx_t,
                               dtype=compute_dtype)
            eq = "tjx,tixc->tcij" if channels_first else "tjx,tixc->tijc"
            outs.append(jnp.einsum(eq, Wx, slv.astype(compute_dtype),
                                   preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=-1 if channels_first else 2)

    ext_y = ext_x = ext
    if win is not None and min(win) < ext:
        win_y, win_x = min(win[0], ext), min(win[1], ext)
        # starts rounded down to sublane multiples (8) so the slice keeps
        # the texture's tiled layout; windows carry >=8 texels of slack
        y0 = (jnp.clip(jnp.floor(jnp.min(cy)) - 2.0, 0, ext - win_y)
              .astype(jnp.int32) // 8) * 8
        x0 = (jnp.clip(jnp.floor(jnp.min(cx)) - 2.0, 0, ext - win_x)
              .astype(jnp.int32) // 8) * 8
        t2 = jax.lax.dynamic_slice(t2, (y0, x0, 0),
                                   (win_y, win_x, t2.shape[2]))
        cy = cy - y0.astype(jnp.float32)
        cx = cx - x0.astype(jnp.float32)
        ext_y, ext_x = win_y, win_x
    Wy = _band_weights(cy, ext_y, dtype=compute_dtype)          # [T, nrr, wy]
    Wx = _band_weights(cx, ext_x, dtype=compute_dtype)
    v = jnp.einsum("tiy,yxc->tixc", Wy, t2.astype(compute_dtype),
                   preferred_element_type=jnp.float32)          # [T, nrr, wx, C]
    if channels_first:
        # [T, C, nrr, nrr] for the fused decode+composite kernel: the
        # [.., C, R] staging layout has no lane padding in HBM (R is a
        # lane multiple, C=32 is not)
        return jnp.einsum("tjx,tixc->tcij", Wx, v.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("tjx,tixc->tijc", Wx, v.astype(compute_dtype),
                      preferred_element_type=jnp.float32)       # [T, nrr, nrr, C]


def sample_slabs(planes, coeffs, t_vals, nrr, compute_dtype=jnp.float32):
    """Mean-over-planes tri-plane features for a chunk of depth slabs.

    planes [N, 3, S, S, C] (already sheared? NO — raw); use
    `prepare_textures` once and pass its output instead for the hot path.
    Returns [N, T, nrr, nrr, C]."""
    prep = prepare_textures(planes, coeffs, compute_dtype)
    return sample_slabs_prepared(prep, t_vals, nrr, compute_dtype)


def prepare_textures(planes, coeffs, compute_dtype=jnp.float32):
    """Shear all plane textures once (shared across every depth slab).

    Returns dict with sheared textures [N*3, ext, ext, C] and per-plane
    factorization scalars."""
    n, q, S, _, c = planes.shape
    a, b, d1, d2, F0, F1, flip = factor_shears(coeffs["B"], coeffs["E0"],
                                               coeffs["E1"])
    tex = planes.reshape(n * q, S, S, c)
    tex = jnp.where(flip.reshape(n * q)[:, None, None, None],
                    jnp.swapaxes(tex, 1, 2), tex)

    def one(t, aa, bb):
        return shear_texture(t, aa, bb, compute_dtype)

    sheared = jax.vmap(one)(tex, a.reshape(-1), b.reshape(-1))
    return {"tex": sheared, "d1": d1.reshape(-1), "d2": d2.reshape(-1),
            "F0": F0.reshape(-1, 2), "F1": F1.reshape(-1, 2),
            "n": n, "q": q}


def sample_slabs_prepared(prep, t_vals, nrr, compute_dtype=jnp.float32,
                          win=None, tiles=None, channels_first=False):
    """[N, T, nrr, nrr, C] mean-over-planes features for depth values
    t_vals [N, T] (per image).  Result dtype is compute_dtype (f32
    accumulation happens inside).

    Structure notes (measured on v5e):
      - lax.map, NOT vmap: vmap turns the per-texture window dynamic_slice
        into a batched gather that costs more than the windowing saves
        (324 vs 218 ms/batch on the full render stage);
      - the mean over the 3 planes is folded into the map body (statically
        unrolled) so the wide pre-mean [N*3, T, r, r, C] tensor is never
        written to HBM, and the output is stored once in compute_dtype."""
    n, q = prep["n"], prep["q"]
    sh = prep["tex"].shape[1:]

    def one(args):
        texs, t, d1s, d2s, F0s, F1s = args  # texs [q, ext, ext, C]
        acc = 0.0
        for qi in range(q):
            acc = acc + slab_resample(texs[qi], t, d1s[qi], d2s[qi],
                                      F0s[qi], F1s[qi], nrr, compute_dtype,
                                      win=win, tiles=tiles,
                                      channels_first=channels_first)
        return (acc / q).astype(compute_dtype)

    return jax.lax.map(one, (prep["tex"].reshape(n, q, *sh), t_vals,
                             prep["d1"].reshape(n, q),
                             prep["d2"].reshape(n, q),
                             prep["F0"].reshape(n, q, 2),
                             prep["F1"].reshape(n, q, 2)))  # [N, T, r, r, C]


def window_coverage_violation(prep, t_vals, nrr, win, chunk, tiles=None):
    """Traced scalar bool: does ANY chunk's contraction window fail to
    cover a tap the full contraction would have used?

    Mirrors `slab_resample`'s window math exactly (same center formula,
    same floor/clip/sublane rounding of the start), but runs OUTSIDE the
    banded-matmul hot loop: centers depend only on camera geometry and
    depth values, never on texture content, so the whole check is a few
    hundred-KB of VPU scalar work per call (ADVICE round 2 — previously
    an in-loop guard here cost ~17% of serving throughput).

    Off-texture centers produce zeros on both the windowed and full paths,
    so they are clipped to the texture before the comparison.

    With `tiles` set, checks the tiled sub-window path instead: per-i-tile
    y-windows against the full texture, the union x-window against the
    full texture, and per-j-tile x-windows against the union window."""
    ext = prep["tex"].shape[1]
    n, q = prep["n"], prep["q"]
    ii = jnp.arange(nrr, dtype=jnp.float32)
    ch = t_vals.reshape(n, -1, chunk)                     # [N, CH, TC]

    def centers(d, f0, f1):
        d = d.reshape(n, q)[:, :, None, None, None]       # [N, q, 1, 1, 1]
        f0 = f0.reshape(n, q)[:, :, None, None, None]
        f1 = f1.reshape(n, q)[:, :, None, None, None]
        t = ch[:, None, :, :, None]                       # [N, 1, CH, TC, 1]
        return t * d * ii + f0 + t * f1 + MARGIN          # [N, q, CH, TC, nrr]

    def win_bad(c, cc, in_len, win_len, group=None):
        """Coverage failure of the floor(min)-2 / clip / sublane-rounded
        window over the trailing output axis (optionally split into tiles
        of `group` outputs).  `c` drives the start computation (mirrors the
        resample, which uses UNCLIPPED centers); `cc` is the texture-clipped
        centers whose taps actually carry weight.  Both may be pre-offset
        into a parent window's coordinates; `in_len` is that parent's
        extent."""
        if group is not None:
            c = c.reshape(*c.shape[:3], c.shape[3], -1, group)
            cc = cc.reshape(*cc.shape[:3], cc.shape[3], -1, group)
            red = (3, 5)                                  # (TC, tile outputs)
        else:
            red = (3, 4)
        start = (jnp.clip(jnp.floor(jnp.min(c, axis=red)) - 2.0,
                          0, in_len - win_len).astype(jnp.int32) // 8) * 8
        start = start.astype(jnp.float32)
        hi = jnp.max(cc, axis=red) > start + (win_len - 1.0)
        lo = jnp.min(cc, axis=red) < start
        return jnp.any(hi | lo)

    def clipped(c):
        return jnp.clip(c, 0.0, ext - 1.0)

    if tiles is not None:
        gi, wy_t, gj, wx_t, wxu = tiles
        wxu, wy_t = min(wxu, ext), min(wy_t, ext)
        wx_t = min(wx_t, wxu)
        cy = centers(prep["d2"], prep["F0"][:, 1], prep["F1"][:, 1])
        cx = centers(prep["d1"], prep["F0"][:, 0], prep["F1"][:, 0])
        bad = win_bad(cy, clipped(cy), ext, wy_t, group=gi) if wy_t < ext \
            else jnp.asarray(False)
        ccx = clipped(cx)
        if wxu < ext:
            bad = bad | win_bad(cx, ccx, ext, wxu)
            x0u = ((jnp.clip(jnp.floor(jnp.min(cx, axis=(3, 4))) - 2.0,
                             0, ext - wxu).astype(jnp.int32) // 8) * 8) \
                .astype(jnp.float32)[:, :, :, None, None]
            cx, ccx = cx - x0u, ccx - x0u
        if wx_t < wxu:
            bad = bad | win_bad(cx, ccx, wxu, wx_t, group=gj)
        return bad

    win_y, win_x = min(win[0], ext), min(win[1], ext)
    if win_y >= ext and win_x >= ext:
        return jnp.asarray(False)
    cy = centers(prep["d2"], prep["F0"][:, 1], prep["F1"][:, 1])
    cx = centers(prep["d1"], prep["F0"][:, 0], prep["F1"][:, 0])
    bad_y = win_bad(cy, clipped(cy), ext, win_y) if win_y < ext \
        else jnp.asarray(False)
    bad_x = win_bad(cx, clipped(cx), ext, win_x) if win_x < ext \
        else jnp.asarray(False)
    return bad_y | bad_x


def frustum_render(planes, decoder, cam2world, intrinsics, rendering_options,
                   nrr, depth_steps=None, chunk=None, window=None, tiles=None,
                   compute_dtype=jnp.float32, fused_decoder=None):
    """Full gather-free render: (features [N,R,C], depth [N,R,1],
    weights [N,R,1]) — same contract as ImportanceRenderer.__call__.

    decoder(feats [N, 3, M, C] or [N, 1, M, C]-broadcastable, dirs) must
    accept pre-meaned features; we pass [N, 1, M, C] (the reference decoder
    means over the plane axis, so a singleton is equivalent).

    fused_decoder: optional transposed lateSeparate decoder params
    (w1t, b1, w2t, b2, rgb_sigmoid, sem_sigmoid) — when given, decode AND
    composite run in one Pallas kernel (`ops/render_pallas.py`) and
    `decoder` is unused."""
    opts = rendering_options
    assert opts["ray_start"] != "auto", \
        "frustum sampler needs static ray_start/ray_end"
    n = cam2world.shape[0]
    S = planes.shape[2]
    T = depth_steps or (opts["depth_resolution"]
                        + opts["depth_resolution_importance"])
    chunk = chunk or min(T, 8)
    assert T % chunk == 0
    if window is None and tiles is None:
        # Contraction window auto-selection (see slab_resample).  Default:
        # a SINGLE per-chunk window on the calibrated seg2cat plane
        # geometry (S=256, box_warp=1; footprint in texels scales with
        # S/box_warp, so any other static geometry falls back to the
        # exact full contraction — pass window=/tiles= explicitly after
        # calibrating): (256, 384) for short chunks, (384, 448) up to
        # chunk/T <= 1/6.  Both were measured to cover every chunk's
        # hat-tap support across yaw +-0.6 / pitch +-0.4 at their
        # respective chunk ratios; anything outside that envelope (or a
        # caller passing window=(ext, ext)) gets the full contraction,
        # and runtime coverage of whichever spec is active is enforced by
        # the NaN-poison guard below.
        # Per-output-tile sub-windows remain OPT-IN via
        # rendering_kwargs['frustum_tiles'] = (gi, wy, gj, wx, union) for
        # geometries where the chunk-wide span exceeds the texture.  If
        # you enable them, gi MUST scale with nrr (use nrr//4): a tile of
        # gi outputs spans ~footprint/nrr * gi texels, so a fixed gi=32
        # calibrated at nrr=128 overflows the 96-texel tile window at
        # nrr=64 and the coverage guard NaN-poisons every render (found
        # on the round-3 trained checkpoint — random-init tests at
        # nrr=128 never hit it).
        ext_full = S + 2 * MARGIN
        std_geom = (S == 256 and float(opts["box_warp"]) == 1.0)
        if std_geom and nrr <= 128 and chunk / T <= 1 / 12:
            # Round-2 calibrated spec for short chunks (t-range <= 1/12 of
            # the depth sweep): measured FASTEST on the v5e — 63.6 img/s
            # vs 59.1 for (384, 448) at the bench config (round-4 A/B via
            # `bench.py --window HxW`; the round-3 revert of the tile
            # experiment mistakenly promoted the wider chunk/T<=1/6 spec
            # and silently cost that 7%).
            window = (256, 384)
        elif std_geom and nrr <= 128 and chunk / T <= 1 / 6:
            # Wider window for chunks spanning up to 1/6 of the sweep.
            # The round-3 per-output-tile sub-windows (nrr//4, 96, nrr//4,
            # 96, 256) cut the banded-matmul FLOPs 4x on paper but LOSE
            # 30% of end-to-end serving throughput on-device (41.0 vs 58.9
            # img/s): the narrower 96-texel contractions drop MXU
            # utilization and the extra dynamic slices/concats add HBM
            # traffic that a single window's bigger matmuls overlap for
            # free.  Tiles remain available via
            # rendering_kwargs['frustum_tiles'] for geometries where the
            # chunk-wide span exceeds the texture.
            window = (384, 448)
        else:
            window = (ext_full, ext_full)

    coeffs = frustum_coeffs(cam2world, intrinsics, nrr, S, opts["box_warp"])
    prep = prepare_textures(planes, coeffs, compute_dtype)

    # per-ray direction norms (z-depth t -> Euclidean depth t*|d|)
    ii = (jnp.arange(nrr, dtype=jnp.float32) + 0.5) / nrr
    vv, uu = jnp.meshgrid(ii, ii, indexing="ij")
    d = (uu.reshape(-1)[None, :, None] * coeffs["a_u"][:, None, :]
         + vv.reshape(-1)[None, :, None] * coeffs["a_v"][:, None, :]
         + coeffs["a_0"][:, None, :])                       # [N, R, 3]
    dnorm = jnp.linalg.norm(d, axis=-1)                     # [N, R]
    dirs = d / dnorm[..., None]

    # z-depth grid covering [ray_start, ray_end] Euclidean for every ray
    t_lo = opts["ray_start"] / jnp.max(dnorm, axis=1)       # [N]
    t_hi = opts["ray_end"] / jnp.min(dnorm, axis=1)
    steps = jnp.linspace(0.0, 1.0, T)
    t_vals = t_lo[:, None] + steps[None, :] * (t_hi - t_lo)[:, None]  # [N, T]

    r = nrr * nrr

    # Coverage guard for the windowed contraction (ADVICE round 2): cameras
    # outside the assumed orbit envelope NaN-poison the render instead of
    # silently zero-fading.  Runs ONCE, outside the banded-matmul hot loop
    # (centers depend only on geometry) — see `window_coverage_violation`.
    # The poison rides INTO the depth grid (`t + nan*0 = nan`) rather than
    # onto the output: consuming it at the end of the program was measured
    # to cost ~16% serving throughput (XLA scheduling interaction), while
    # the input-side dependency is free — the checker runs before the slab
    # loop starts.
    if bool(opts.get("frustum_window_check", True)):
        bad = window_coverage_violation(prep, t_vals, nrr, window, chunk,
                                        tiles=tiles)
        t_vals = t_vals + jnp.where(bad, jnp.nan, 0.0) * 0.0

    if fused_decoder is not None:
        from ..ops.render_pallas import fused_decode_composite
        ch_n = T // chunk
        chunk_ts = t_vals.reshape(n, ch_n, chunk).transpose(1, 0, 2)

        def one_chunk(t_chunk):
            # [N, TC, C, nrr, nrr] channels-first slab features
            f = sample_slabs_prepared(prep, t_chunk, nrr, compute_dtype,
                                      win=window, tiles=tiles,
                                      channels_first=True)
            return f.reshape(n, chunk, -1, r)

        feats = jax.lax.map(one_chunk, chunk_ts)       # [CH, N, TC, C, r]
        w1t, b1, w2t, b2, rgb_sig, sem_sig = fused_decoder
        acc_rgb_t, acc_d, acc_w = fused_decode_composite(
            feats, t_vals, dnorm, w1t, b1, w2t, b2, rgb_sigmoid=rgb_sig,
            sem_sigmoid=sem_sig, compute_dtype=compute_dtype,
            interpret=jax.default_backend() == "cpu",
            # opt-in: one grid step per chunk of slabs (TC x fewer grid
            # steps).  Chip-validated round 5: +0.8% only — the per-slab
            # grid was not launch-overhead bound (see
            # ops/render_pallas._make_kernel_chunk).
            chunk_grid=bool(opts.get("fused_chunk_grid", False)),
            # opt-in: f32 colors through the composite carry (near-free
            # precision knob for the semantic mIoU gate)
            carry_f32=bool(opts.get("fused_carry_f32", False)))
        acc_rgb = acc_rgb_t.transpose(0, 2, 1)         # [N, r, 64]
        return _finalize(acc_rgb, acc_d, acc_w, t_vals, dnorm, opts)

    def decode_chunk(t_chunk):
        feats = sample_slabs_prepared(prep, t_chunk, nrr, compute_dtype,
                                      win=window, tiles=tiles)
        tc = t_chunk.shape[1]
        # run the decoder MLP in the compute dtype (bf16 in serving mode):
        # it is HBM-bandwidth bound ([pts, 64] hidden dominates), and the
        # matmuls accumulate in f32 regardless; compositing is f32
        feats = feats.reshape(n, 1, tc * r, -1).astype(compute_dtype)
        dirs_b = jnp.broadcast_to(dirs[:, None, :, :], (n, tc, r, 3)) \
            .reshape(n, tc * r, 3)
        out = decoder(feats, dirs_b)
        # colors stay in the compute dtype: the composite contracts them
        # once with f32 accumulation, so bf16 storage halves the dominant
        # HBM stream of the decode+composite stage
        colors = out["rgb"].reshape(n, tc, r, -1).astype(compute_dtype)
        sigmas = out["sigma"].reshape(n, tc, r).astype(jnp.float32)
        depths = t_chunk[:, :, None] * dnorm[:, None, :]    # [N, tc, R]
        return colors, sigmas, depths

    def composite_step(carry, colors, sigmas, depths):
        """Front-to-back midpoint compositing of one decoded slab chunk,
        seamed to the previous chunk's last sample via the carry.

        The color payload (the wide [N, tc, R, 64] tensor) is contracted
        exactly once: the midpoint sum  sum_k w_k (c_{k-1} + c_k)/2  is
        regrouped per sample as
            prev_c * w_0/2 + sum_k c_k (w_k + w_{k+1})/2,   w_tc := 0,
        so no concatenated/averaged copy of `colors` is ever materialized
        (the last sample's remaining w/2 share is carried to the next
        chunk as prev_c)."""
        (prev_c, prev_s, prev_d, trans, acc_rgb, acc_d, acc_w) = carry
        ss = jnp.concatenate([prev_s[:, None], sigmas], axis=1)
        dd = jnp.concatenate([prev_d[:, None], depths], axis=1)
        deltas = dd[:, 1:] - dd[:, :-1]
        sig_mid = jax.nn.softplus((ss[:, :-1] + ss[:, 1:]) / 2 - 1)
        alpha = 1 - jnp.exp(-sig_mid * deltas)              # [N, tc, R]
        # running transmittance (the reference's shifted cumprod of
        # (1 - alpha + 1e-10), ray_marcher.py:39-42)
        one_m = 1 - alpha + 1e-10
        trans_in = trans[:, None] * jnp.concatenate(
            [jnp.ones_like(one_m[:, :1]),
             jnp.cumprod(one_m[:, :-1], axis=1)], axis=1)
        w = alpha * trans_in
        w_shift = 0.5 * (w + jnp.concatenate(
            [w[:, 1:], jnp.zeros_like(w[:, :1])], axis=1))
        acc_rgb = (acc_rgb
                   + prev_c.astype(jnp.float32) * (0.5 * w[:, 0])[..., None]
                   + jnp.einsum("ntr,ntrc->nrc", w_shift, colors,
                                preferred_element_type=jnp.float32))
        acc_d = (acc_d + prev_d * 0.5 * w[:, 0]
                 + jnp.sum(w_shift * depths, axis=1))
        acc_w = acc_w + jnp.sum(w, axis=1)
        trans = trans * jnp.prod(one_m, axis=1)
        return (colors[:, -1], sigmas[:, -1], depths[:, -1], trans,
                acc_rgb, acc_d, acc_w)

    # Per-chunk rematerialization: each chunk's decode+composite is
    # recomputed in the backward pass instead of saving its slab features,
    # hidden activations, and colors as residuals — only the small carry
    # survives per chunk.  Training through the frustum path at nrr=128
    # would otherwise store O(T * nrr^2 * 64) activations; forward-only
    # (serving) cost is unchanged (checkpoint is identity without a
    # cotangent).  Opt out with rendering_kwargs['frustum_remat'] = False.
    remat = (jax.checkpoint if opts.get("frustum_remat", True)
             else (lambda f: f))

    # first chunk initializes the carry with its own first sample, then
    # composites its remaining samples (no re-decode)
    @remat
    def first_chunk(t_chunk):
        colors0, sigmas0, depths0 = decode_chunk(t_chunk)
        c_dim = colors0.shape[-1]
        carry = (colors0[:, 0], sigmas0[:, 0], depths0[:, 0],
                 jnp.ones((n, r), jnp.float32),
                 jnp.zeros((n, r, c_dim), jnp.float32),
                 jnp.zeros((n, r), jnp.float32),
                 jnp.zeros((n, r), jnp.float32))
        return composite_step(carry, colors0[:, 1:], sigmas0[:, 1:],
                              depths0[:, 1:])

    carry = first_chunk(t_vals[:, :chunk])

    n_chunks = (T - chunk) // chunk
    if n_chunks > 0:
        @remat
        def scan_body(carry, t_chunk):
            colors, sigmas, depths = decode_chunk(t_chunk)
            return composite_step(carry, colors, sigmas, depths), None

        rest = t_vals[:, chunk:].reshape(n, n_chunks, chunk) \
            .transpose(1, 0, 2)
        carry, _ = jax.lax.scan(scan_body, carry, rest)

    _, _, _, trans, acc_rgb, acc_d, acc_w = carry
    return _finalize(acc_rgb, acc_d, acc_w, t_vals, dnorm, opts)


def _finalize(acc_rgb, acc_d, acc_w, t_vals, dnorm, opts):
    depth = acc_d / jnp.maximum(acc_w, 1e-10)
    depth = jnp.clip(jnp.nan_to_num(depth, nan=jnp.inf),
                     jnp.min(t_vals * jnp.min(dnorm)),
                     jnp.max(t_vals * jnp.max(dnorm)))
    if opts.get("white_back", False):
        acc_rgb = acc_rgb + (1 - acc_w)[..., None]
    acc_rgb = acc_rgb * 2 - 1
    return acc_rgb, depth[..., None], acc_w[..., None]
