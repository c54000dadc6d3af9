"""StyleGAN3 alias-free stack: parity vs reference torch CPU."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

from pix2pix3d_tpu.nn.stylegan3 import GeneratorS3, design_lowpass_filter
from pix2pix3d_tpu.ops.filtered_lrelu import filtered_lrelu
from pix2pix3d_tpu.utils.convert import convert_state_dict

torch.manual_seed(0)


def test_filtered_lrelu_parity():
    from torch_utils.ops import filtered_lrelu as ref_fl
    from torch_utils.ops import upfirdn2d as ref_up
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 12, 12).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    fu = ref_up.setup_filter([1, 3, 3, 1], gain=1)
    fd = ref_up.setup_filter([1, 3, 3, 1], gain=1)

    want = ref_fl.filtered_lrelu(
        torch.from_numpy(x), fu=fu, fd=fd, b=torch.from_numpy(b), up=2, down=2,
        padding=3, clamp=256, impl="ref").numpy()

    from pix2pix3d_tpu.ops.upfirdn2d import setup_filter
    got = filtered_lrelu(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), fu=setup_filter([1, 3, 3, 1]),
        fd=setup_filter([1, 3, 3, 1]), b=jnp.asarray(b), up=2, down=2,
        padding=3, clamp=256)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=1e-4, atol=1e-4)


def test_lowpass_filter_design_matches_reference():
    from training.networks_stylegan3 import SynthesisLayer as RefLayer
    for kwargs in [dict(numtaps=12, cutoff=2.0, width=1.5, fs=16),
                   dict(numtaps=24, cutoff=6.0, width=4.0, fs=32, radial=True)]:
        want = RefLayer.design_lowpass_filter(**kwargs).numpy()
        got = np.asarray(design_lowpass_filter(**kwargs))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_stylegan3_generator_parity():
    from training import networks_stylegan3 as ref_s3
    kwargs = dict(z_dim=32, c_dim=0, w_dim=32, img_resolution=32,
                  img_channels=3, channel_base=1024, channel_max=32,
                  num_layers=5, num_critical=2, num_fp16_res=0,
                  mapping_kwargs=dict(num_layers=2))
    ref_g = ref_s3.Generator(**kwargs)
    ours = GeneratorS3(**kwargs)
    assert ours.num_ws == ref_g.num_ws
    params = convert_state_dict(ref_g.state_dict(),
                                ours.init(jax.random.PRNGKey(0)))
    rng = np.random.RandomState(1)
    z = rng.randn(2, 32).astype(np.float32)
    with torch.no_grad():
        want = ref_g(torch.from_numpy(z), None).numpy()
    got = np.transpose(np.asarray(ours(params, jnp.asarray(z), None)),
                       (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
