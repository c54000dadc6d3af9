"""Convert torchvision Inception-v3 weights to an npz for exact FID.

Run on a machine with torchvision + network access:

    python scripts/convert_inception.py inception_v3.npz

then export PIX2PIX3D_INCEPTION_NPZ=inception_v3.npz before computing
metrics.  (This offline container cannot download the weights; the metric
registry falls back to fixed-seed random conv features with a warning —
fine for relative progress, not comparable to published FID.)
"""

import sys

import numpy as np


def main(out_path):
    import torch
    import torchvision

    model = torchvision.models.inception_v3(weights="IMAGENET1K_V1",
                                            aux_logits=True)
    model.eval()
    out = {}
    for name, p in model.state_dict().items():
        v = p.detach().numpy()
        if v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[name.replace(".", "/")] = v
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "inception_v3.npz")
