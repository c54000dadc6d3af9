"""Validate the JAX Inception-v3 feature graph (`metrics/inception.py`).

Two modes:

- OFFLINE (this container): builds a synthetic weight set from the
  torchvision Inception-v3 shape manifest below, runs the JAX graph, and
  asserts (a) every manifest parameter is consumed, (b) the output is a
  finite [N, 2048] feature map.  This proves the converter's naming/layout
  contract end-to-end without the real weights.

- ONLINE (torchvision available): additionally loads
  `inception_v3(weights="IMAGENET1K_V1")`, converts its state_dict with the
  same transform as `scripts/convert_inception.py`, checks every shape
  against the manifest, and compares JAX pool3 features against the torch
  model on a fixed input (reports max abs / rel error).

Usage:
    python scripts/validate_inception.py            # auto-selects mode
    python scripts/validate_inception.py --npz f.npz  # validate a converted npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def inception_shape_manifest():
    """{param_key: shape} for every tensor the feature graph consumes.

    Conv weights are HWIO (post-conversion); bn entries are per-channel
    vectors.  Channel plan follows torchvision inception_v3 (aux tower
    excluded — the feature graph does not use it)."""
    m = {}

    def conv_bn(prefix, cin, cout, kh, kw):
        m[f"{prefix}/conv/weight"] = (kh, kw, cin, cout)
        for k in ("weight", "bias", "running_mean", "running_var"):
            m[f"{prefix}/bn/{k}"] = (cout,)

    # stem
    conv_bn("Conv2d_1a_3x3", 3, 32, 3, 3)
    conv_bn("Conv2d_2a_3x3", 32, 32, 3, 3)
    conv_bn("Conv2d_2b_3x3", 32, 64, 3, 3)
    conv_bn("Conv2d_3b_1x1", 64, 80, 1, 1)
    conv_bn("Conv2d_4a_3x3", 80, 192, 3, 3)

    # InceptionA x3
    for name, cin, pool in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                            ("Mixed_5d", 288, 64)):
        conv_bn(f"{name}/branch1x1", cin, 64, 1, 1)
        conv_bn(f"{name}/branch5x5_1", cin, 48, 1, 1)
        conv_bn(f"{name}/branch5x5_2", 48, 64, 5, 5)
        conv_bn(f"{name}/branch3x3dbl_1", cin, 64, 1, 1)
        conv_bn(f"{name}/branch3x3dbl_2", 64, 96, 3, 3)
        conv_bn(f"{name}/branch3x3dbl_3", 96, 96, 3, 3)
        conv_bn(f"{name}/branch_pool", cin, pool, 1, 1)

    # InceptionB
    conv_bn("Mixed_6a/branch3x3", 288, 384, 3, 3)
    conv_bn("Mixed_6a/branch3x3dbl_1", 288, 64, 1, 1)
    conv_bn("Mixed_6a/branch3x3dbl_2", 64, 96, 3, 3)
    conv_bn("Mixed_6a/branch3x3dbl_3", 96, 96, 3, 3)

    # InceptionC x4 (c7 = 128/160/160/192)
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                     ("Mixed_6e", 192)):
        cin = 768
        conv_bn(f"{name}/branch1x1", cin, 192, 1, 1)
        conv_bn(f"{name}/branch7x7_1", cin, c7, 1, 1)
        conv_bn(f"{name}/branch7x7_2", c7, c7, 1, 7)
        conv_bn(f"{name}/branch7x7_3", c7, 192, 7, 1)
        conv_bn(f"{name}/branch7x7dbl_1", cin, c7, 1, 1)
        conv_bn(f"{name}/branch7x7dbl_2", c7, c7, 7, 1)
        conv_bn(f"{name}/branch7x7dbl_3", c7, c7, 1, 7)
        conv_bn(f"{name}/branch7x7dbl_4", c7, c7, 7, 1)
        conv_bn(f"{name}/branch7x7dbl_5", c7, 192, 1, 7)
        conv_bn(f"{name}/branch_pool", cin, 192, 1, 1)

    # InceptionD
    conv_bn("Mixed_7a/branch3x3_1", 768, 192, 1, 1)
    conv_bn("Mixed_7a/branch3x3_2", 192, 320, 3, 3)
    conv_bn("Mixed_7a/branch7x7x3_1", 768, 192, 1, 1)
    conv_bn("Mixed_7a/branch7x7x3_2", 192, 192, 1, 7)
    conv_bn("Mixed_7a/branch7x7x3_3", 192, 192, 7, 1)
    conv_bn("Mixed_7a/branch7x7x3_4", 192, 192, 3, 3)

    # InceptionE x2
    for name, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        conv_bn(f"{name}/branch1x1", cin, 320, 1, 1)
        conv_bn(f"{name}/branch3x3_1", cin, 384, 1, 1)
        conv_bn(f"{name}/branch3x3_2a", 384, 384, 1, 3)
        conv_bn(f"{name}/branch3x3_2b", 384, 384, 3, 1)
        conv_bn(f"{name}/branch3x3dbl_1", cin, 448, 1, 1)
        conv_bn(f"{name}/branch3x3dbl_2", 448, 384, 3, 3)
        conv_bn(f"{name}/branch3x3dbl_3a", 384, 384, 1, 3)
        conv_bn(f"{name}/branch3x3dbl_3b", 384, 384, 3, 1)
        conv_bn(f"{name}/branch_pool", cin, 192, 1, 1)

    m["fc/weight"] = (1000, 2048)
    m["fc/bias"] = (1000,)
    return m


def synthetic_npz(path, seed=0):
    """Write a random-weight npz following the manifest (bn var > 0)."""
    rng = np.random.RandomState(seed)
    out = {}
    for k, shape in inception_shape_manifest().items():
        if k.endswith("running_var"):
            out[k] = rng.rand(*shape).astype(np.float32) + 0.5
        else:
            out[k] = (rng.randn(*shape) * 0.05).astype(np.float32)
    np.savez(path, **out)
    return path


class _TrackedParams(dict):
    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def validate_offline(npz_path=None):
    import jax
    if jax.default_backend() not in ("cpu",):
        pass  # runs anywhere; CPU is fine
    from pix2pix3d_tpu.metrics.inception import InceptionV3Features

    if npz_path is None:
        npz_path = synthetic_npz("/tmp/inception_synthetic.npz")
        print("offline mode: synthetic manifest weights ->", npz_path)
    net = InceptionV3Features(npz_path)
    # track which params the graph actually reads
    tracked = _TrackedParams(net.params)
    net.params = tracked
    net._fn = net._features  # un-jit so dict tracking sees accesses

    x = (np.random.RandomState(1).rand(2, 64, 64, 3) * 255).astype(np.float32)
    feats = net(x)
    assert feats.shape == (2, 2048), feats.shape
    assert np.isfinite(feats).all()
    logits = net.logits(x)
    assert logits.shape == (2, 1000), logits.shape

    manifest = set(inception_shape_manifest())
    missing = manifest - tracked.accessed
    extra = tracked.accessed - manifest
    assert not missing, f"graph never consumed: {sorted(missing)[:10]}"
    assert not extra, f"graph read unknown keys: {sorted(extra)[:10]}"
    print(f"offline validation OK: {len(manifest)} params all consumed, "
          f"features [2, 2048] finite")


def validate_online():
    import torch
    import torchvision
    from pix2pix3d_tpu.metrics.inception import InceptionV3Features

    model = torchvision.models.inception_v3(weights="IMAGENET1K_V1",
                                            aux_logits=True)
    model.eval()
    manifest = inception_shape_manifest()
    conv = {}
    for name, p in model.state_dict().items():
        v = p.detach().numpy()
        if v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
        conv[name.replace(".", "/")] = v
    for k, shape in manifest.items():
        assert k in conv, f"missing {k} in torchvision state_dict"
        assert tuple(conv[k].shape) == tuple(shape), \
            f"{k}: manifest {shape} vs torchvision {conv[k].shape}"
    np.savez("/tmp/inception_real.npz", **conv)
    net = InceptionV3Features("/tmp/inception_real.npz")

    x = (np.random.RandomState(1).rand(2, 299, 299, 3) * 255).astype(np.float32)
    feats = net(x)
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)) / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        xt = (xt - mean) / std
        # run up to pool3 features
        m = model
        h = m.Conv2d_1a_3x3(xt); h = m.Conv2d_2a_3x3(h); h = m.Conv2d_2b_3x3(h)
        h = m.maxpool1(h)
        h = m.Conv2d_3b_1x1(h); h = m.Conv2d_4a_3x3(h); h = m.maxpool2(h)
        for blk in (m.Mixed_5b, m.Mixed_5c, m.Mixed_5d, m.Mixed_6a, m.Mixed_6b,
                    m.Mixed_6c, m.Mixed_6d, m.Mixed_6e, m.Mixed_7a, m.Mixed_7b,
                    m.Mixed_7c):
            h = blk(h)
        ref = h.mean(dim=(2, 3)).numpy()
    err = np.abs(feats - ref).max()
    rel = err / (np.abs(ref).max() + 1e-9)
    print(f"online validation: max abs err {err:.2e} (rel {rel:.2e})")
    assert rel < 1e-3, "JAX inception features diverge from torchvision"
    print("online validation OK")


def main():
    npz = None
    if "--npz" in sys.argv:
        npz = sys.argv[sys.argv.index("--npz") + 1]
    try:
        import torchvision  # noqa: F401
        have_tv = True
    except ImportError:
        have_tv = False
    if npz is not None:
        validate_offline(npz)
    elif have_tv:
        validate_online()
    else:
        print("torchvision unavailable -> offline structural validation")
        validate_offline()


if __name__ == "__main__":
    main()
