"""Golden offline tests for the pretrained-weight converter contracts.

The real torchvision / lpips weights are unreachable from this container
(no egress); what CAN be validated offline is the full naming/layout
contract between the converter scripts and the JAX consumers:

- `scripts/validate_inception.py` holds the exact shape manifest of the
  torchvision Inception-v3 state_dict (post OIHW->HWIO conversion); the
  feature graph must consume every manifest entry and nothing else.
- `scripts/convert_lpips.py` emits conv{0..12}_{w,b} + lin{0..4}_w; the
  LPIPS module must load such an npz and score images with it.

When run in an online environment, `scripts/validate_inception.py`
additionally cross-checks features against torchvision numerically.
"""

import sys
import os

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_inception_manifest_consumed(tmp_path):
    from validate_inception import (inception_shape_manifest, synthetic_npz,
                                    validate_offline)
    manifest = inception_shape_manifest()
    # spot-check documented torchvision channel plan
    assert manifest["Conv2d_1a_3x3/conv/weight"] == (3, 3, 3, 32)
    assert manifest["Mixed_5b/branch_pool/conv/weight"] == (1, 1, 192, 32)
    assert manifest["Mixed_6b/branch7x7_2/conv/weight"] == (1, 7, 128, 128)
    assert manifest["Mixed_7c/branch3x3dbl_1/conv/weight"] == (1, 1, 2048, 448)
    assert manifest["fc/weight"] == (1000, 2048)
    # 5 stem + 3*7 + 4 + 4*10 + 6 + 2*9 = 94 conv/bn stacks + fc
    n_convs = sum(1 for k in manifest if k.endswith("conv/weight"))
    assert n_convs == 94, n_convs

    path = synthetic_npz(str(tmp_path / "inc.npz"))
    validate_offline(path)  # raises on any contract violation


def test_lpips_converter_contract(tmp_path):
    from pix2pix3d_tpu.train.lpips import LPIPS, _VGG_BLOCKS

    rng = np.random.RandomState(0)
    out = {}
    in_ch, idx = 3, 0
    for out_ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            out[f"conv{idx}_w"] = rng.randn(3, 3, in_ch, out_ch) \
                .astype(np.float32) * 0.05
            out[f"conv{idx}_b"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
            idx += 1
    assert idx == 13  # convert_lpips.py asserts 13 VGG16 convs
    for i, (out_ch, _) in enumerate(_VGG_BLOCKS):
        out[f"lin{i}_w"] = rng.rand(out_ch).astype(np.float32)
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **out)

    lp = LPIPS(weights_path=path)
    assert lp.has_pretrained
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    y = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    d = np.asarray(lp(x, y))
    assert d.shape[0] == 2
    assert np.isfinite(d).all()
    assert (d >= 0).all()
    # identical inputs -> zero distance
    d0 = np.asarray(lp(x, x))
    np.testing.assert_allclose(d0, 0.0, atol=1e-6)
