"""Numerical parity vs the reference implementation.

Strategy (SURVEY.md §4): import the reference PyTorch code from
/root/reference, build modules with random init on CPU (where its custom ops
fall back to the pure `impl='ref'` paths), convert the state_dict with our
checkpoint converter, and compare forward outputs elementwise.  This is the
same oracle that validates released-checkpoint loading.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

from pix2pix3d_tpu import nn as tnn
from pix2pix3d_tpu.utils.convert import convert_state_dict

torch.manual_seed(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc, np.float32), (0, 3, 1, 2)))


def nhwc(x_nchw_t):
    return jnp.asarray(np.transpose(x_nchw_t.detach().numpy(), (0, 2, 3, 1)))


@pytest.fixture(scope="module")
def ref_networks():
    from training import networks_stylegan2 as ref
    return ref


def _convert(ref_module, ours_params_template):
    return convert_state_dict(ref_module.state_dict(), ours_params_template)


def test_fully_connected_parity(ref_networks):
    ref_fc = ref_networks.FullyConnectedLayer(16, 8, activation="lrelu",
                                              lr_multiplier=0.01, bias_init=1)
    ours = tnn.FullyConnected(16, 8, activation="lrelu", lr_multiplier=0.01,
                              bias_init=1)
    params = _convert(ref_fc, ours.init(jax.random.PRNGKey(0)))
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    want = ref_fc(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("up,down", [(1, 1), (2, 1), (1, 2)])
def test_conv2d_layer_parity(ref_networks, up, down):
    ref_conv = ref_networks.Conv2dLayer(6, 9, kernel_size=3, activation="lrelu",
                                        up=up, down=down, conv_clamp=256)
    ours = tnn.Conv2d(6, 9, kernel_size=3, activation="lrelu", up=up, down=down,
                      conv_clamp=256)
    params = _convert(ref_conv, ours.init(jax.random.PRNGKey(0)))
    x = np.random.RandomState(1).randn(2, 16, 16, 6).astype(np.float32)
    want = nhwc(ref_conv(nchw(x)))
    got = ours(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_mapping_network_parity(ref_networks):
    ref_map = ref_networks.MappingNetwork(z_dim=32, c_dim=12, w_dim=32, num_ws=5,
                                          num_layers=2)
    ours = tnn.MappingNetwork(z_dim=32, c_dim=12, w_dim=32, num_ws=5, num_layers=2)
    params = _convert(ref_map, ours.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(2)
    z = rng.randn(3, 32).astype(np.float32)
    c = rng.randn(3, 12).astype(np.float32)
    want = ref_map(torch.from_numpy(z), torch.from_numpy(c)).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(z), jnp.asarray(c)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_synthesis_network_parity(ref_networks):
    kwargs = dict(w_dim=32, img_resolution=32, img_channels=6, channel_base=512,
                  channel_max=32, num_fp16_res=0)
    ref_syn = ref_networks.SynthesisNetwork(**kwargs)
    ours = tnn.SynthesisNetwork(**kwargs)
    assert ours.num_ws == ref_syn.num_ws
    params = _convert(ref_syn, ours.init(jax.random.PRNGKey(0)))
    ws = np.random.RandomState(3).randn(2, ref_syn.num_ws, 32).astype(np.float32)
    want = nhwc(ref_syn(torch.from_numpy(ws), noise_mode="const"))
    got = ours(params, jnp.asarray(ws), noise_mode="const")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_discriminator_parity(ref_networks):
    kwargs = dict(c_dim=0, img_resolution=32, img_channels=3, channel_base=512,
                  channel_max=32, num_fp16_res=0)
    ref_d = ref_networks.Discriminator(**kwargs)
    ours = tnn.Discriminator(**kwargs)
    params = _convert(ref_d, ours.init(jax.random.PRNGKey(0)))
    x = np.random.RandomState(4).randn(4, 32, 32, 3).astype(np.float32)
    want = ref_d(nchw(x), None).detach().numpy()
    got = np.asarray(ours(params, jnp.asarray(x), None))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_dual_discriminator_parity():
    from training import dual_discriminator as ref_dd
    kwargs = dict(c_dim=25, img_resolution=64, img_channels=3, channel_base=512,
                  channel_max=32, num_fp16_res=0)
    ref_d = ref_dd.DualDiscriminator(**kwargs)
    ours = tnn.DualDiscriminator(**kwargs)
    params = _convert(ref_d, ours.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(5)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    raw = rng.randn(2, 16, 16, 3).astype(np.float32)
    c = rng.randn(2, 25).astype(np.float32)
    want = ref_d({"image": nchw(img), "image_raw": nchw(raw)},
                 torch.from_numpy(c)).detach().numpy()
    got = np.asarray(ours(params, {"image": jnp.asarray(img),
                                   "image_raw": jnp.asarray(raw)}, jnp.asarray(c)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_modulated_conv_parity(ref_networks):
    """SynthesisLayer with up=2 exercises modconv + noise-free path."""
    ref_layer = ref_networks.SynthesisLayer(8, 12, w_dim=16, resolution=16, up=2,
                                            use_noise=False, conv_clamp=256)
    from pix2pix3d_tpu.nn.synthesis import SynthesisLayer
    ours = SynthesisLayer(8, 12, w_dim=16, resolution=16, up=2, use_noise=False,
                          conv_clamp=256)
    params = _convert(ref_layer, ours.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(6)
    x = rng.randn(2, 8, 8, 8).astype(np.float32)
    w = rng.randn(2, 16).astype(np.float32)
    want = nhwc(ref_layer(nchw(x), torch.from_numpy(w), noise_mode="none",
                          fused_modconv=False))
    got = ours(params, jnp.asarray(x), jnp.asarray(w), noise_mode="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)
