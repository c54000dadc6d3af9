"""Convert lpips-package VGG16 weights to the npz consumed by
`pix2pix3d_tpu/train/lpips.py`.

Run on a machine WITH network access / the pip packages (this container has
neither):

    pip install lpips torchvision
    python scripts/convert_lpips.py lpips_vgg.npz

then point `--lpips_weights lpips_vgg.npz` at the result (or set it in
training_loop kwargs).
"""

import sys

import numpy as np


def main(out_path):
    import lpips as lpips_pkg  # noqa: requires network for first download

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}

    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
            [m for m in model.net.slice5]
    idx = 0
    for m in convs:
        if m.__class__.__name__ == "Conv2d":
            # torch OIHW -> HWIO
            out[f"conv{idx}_w"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
            out[f"conv{idx}_b"] = m.bias.detach().numpy()
            idx += 1
    assert idx == 13, f"expected 13 VGG16 convs, got {idx}"

    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}_w"] = w.reshape(-1)

    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
