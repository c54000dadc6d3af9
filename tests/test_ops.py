"""Golden-value tests for the ops layer.

Oracles:
- upfirdn2d: a literal numpy implementation of the documented pipeline
  (zero-insert upsample -> pad/crop -> correlate flipped filter -> decimate),
  written here from the spec, exercised over a grid of up/down/pad configs.
- grid_sample / resize / bias_act: torch CPU functions.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from pix2pix3d_tpu.ops import (
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
    bias_act,
    grid_sample_2d,
    resize_bilinear,
)
from pix2pix3d_tpu.ops.bias_act import activation_funcs


def np_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Numpy oracle, NCHW like the spec; x [N,C,H,W], f [fh,fw] or [taps]."""
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 1:
        f = np.outer(f, f) * (gain ** 1)  # two 1D passes = gain^(1/2) each
    else:
        f = f * gain
    if not flip_filter:
        f = f[::-1, ::-1]

    n, c, h, w = x.shape
    # 1. zero-insert upsample
    up_img = np.zeros((n, c, h * upy, w * upx), dtype=np.float64)
    up_img[:, :, ::upy, ::upx] = x
    # 2. pad / crop
    hh, ww = up_img.shape[2], up_img.shape[3]
    out = np.zeros((n, c, hh + max(py0, 0) + max(py1, 0), ww + max(px0, 0) + max(px1, 0)))
    out[:, :, max(py0, 0):max(py0, 0) + hh, max(px0, 0):max(px0, 0) + ww] = up_img
    out = out[:, :, max(-py0, 0):out.shape[2] - max(-py1, 0), max(-px0, 0):out.shape[3] - max(-px1, 0)]
    # 3. correlate, valid
    fh, fw = f.shape
    oh = out.shape[2] - fh + 1
    ow = out.shape[3] - fw + 1
    res = np.zeros((n, c, oh, ow))
    for i in range(fh):
        for j in range(fw):
            res += f[i, j] * out[:, :, i:i + oh, j:j + ow]
    # 4. decimate
    return res[:, :, ::downy, ::downx].astype(np.float32)


def to_nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0),
    (1, 1, 2),
    (2, 1, [2, 1, 2, 1]),
    (1, 2, [1, 1, 1, 1]),
    (2, 2, [3, 2, 3, 2]),
    (1, 1, [-1, 2, 0, -1]),
    (4, 1, [3, 1, 3, 1]),
])
@pytest.mark.parametrize("ftaps", [None, [1, 3, 3, 1], [1, 2, 1]])
def test_upfirdn2d_matches_numpy_oracle(up, down, padding, ftaps):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    f = setup_filter(ftaps) if ftaps is not None else None
    f_np = np.asarray(f) if f is not None else None
    want = np_upfirdn2d(x, f_np, up=up, down=down, padding=padding)
    got = from_nhwc(upfirdn2d(to_nhwc(x), f, up=up, down=down, padding=padding))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_separable_matches_2d():
    # >= 8 taps triggers the separable path in setup_filter.
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 16, 16).astype(np.float32)
    taps = [1, 2, 3, 4, 4, 3, 2, 1]
    f_sep = setup_filter(taps)  # 1D (separable)
    f_2d = setup_filter(taps, separable=False)  # 2D outer product
    assert f_sep.ndim == 1 and f_2d.ndim == 2
    a = upfirdn2d(to_nhwc(x), f_sep, up=2, padding=[4, 3, 4, 3], gain=4)
    b = upfirdn2d(to_nhwc(x), f_2d, up=2, padding=[4, 3, 4, 3], gain=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_upsample_downsample_roundtrip_shapes():
    rng = np.random.RandomState(2)
    x = to_nhwc(rng.randn(2, 4, 16, 16).astype(np.float32))
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (2, 32, 32, 4)
    down = downsample2d(up, f)
    assert down.shape == (2, 16, 16, 4)
    flt = filter2d(x, f)
    assert flt.shape == x.shape


def test_upsample2d_dc_gain():
    # Constant image must stay (approximately) constant in the interior.
    x = jnp.ones((1, 16, 16, 1), dtype=jnp.float32)
    f = setup_filter([1, 3, 3, 1])
    y = np.asarray(upsample2d(x, f))
    np.testing.assert_allclose(y[0, 4:-4, 4:-4, 0], 1.0, rtol=1e-5)


@pytest.mark.parametrize("act", list(activation_funcs.keys()))
def test_bias_act_matches_torch(act):
    rng = np.random.RandomState(3)
    x = rng.randn(4, 7).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act=act))

    tx = torch.from_numpy(x) + torch.from_numpy(b)
    tfn = {
        "linear": lambda t: t,
        "relu": torch.nn.functional.relu,
        "lrelu": lambda t: torch.nn.functional.leaky_relu(t, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "elu": torch.nn.functional.elu,
        "selu": torch.nn.functional.selu,
        "softplus": torch.nn.functional.softplus,
        "swish": lambda t: torch.sigmoid(t) * t,
    }[act]
    gain = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}.get(act, 1.0)
    want = (tfn(tx) * gain).numpy()
    # XLA's transcendental approximations (tanh/softplus/...) differ from
    # libm by up to ~1e-4 absolute in f32.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bias_act_clamp_and_gain():
    x = jnp.asarray(np.linspace(-10, 10, 21, dtype=np.float32))
    y = np.asarray(bias_act(x, act="linear", gain=3.0, clamp=5.0))
    np.testing.assert_allclose(y, np.clip(np.linspace(-10, 10, 21) * 3, -5, 5), rtol=1e-6)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(padding_mode):
    rng = np.random.RandomState(4)
    feats = rng.randn(2, 5, 9, 11).astype(np.float32)  # NCHW for torch
    coords = (rng.rand(2, 33, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB

    want = F.grid_sample(
        torch.from_numpy(feats),
        torch.from_numpy(coords).unsqueeze(1),  # [N, 1, M, 2]
        mode="bilinear", padding_mode=padding_mode, align_corners=False,
    ).squeeze(2).permute(0, 2, 1).numpy()  # -> [N, M, C]

    got = np.asarray(grid_sample_2d(
        to_nhwc(feats), jnp.asarray(coords), padding_mode=padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("size,antialias", [(16, False), (16, True), (64, False)])
def test_resize_bilinear_matches_torch(size, antialias):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=(size, size), mode="bilinear",
        align_corners=False, antialias=antialias,
    ).numpy()
    got = from_nhwc(resize_bilinear(to_nhwc(x), size, antialias=antialias))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
