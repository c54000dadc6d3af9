"""Label-consistency metrics: mIoU / pixel accuracy of rendered semantics vs
the input masks.

This is the paper's semantic-alignment metric family (mIoU for seg configs);
unlike FID it needs no pretrained weights, so it is exact in this offline
environment and serves as the primary quality signal during training.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def confusion_matrix(pred, target, num_classes):
    """pred/target int `[...]` -> [C, C] counts (rows = target)."""
    idx = target.reshape(-1) * num_classes + pred.reshape(-1)
    return np.bincount(np.asarray(idx), minlength=num_classes ** 2) \
        .reshape(num_classes, num_classes)


def miou_from_confusion(cm):
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - np.diag(cm)
    valid = union > 0
    return float((inter[valid] / union[valid]).mean())


def compute_miou(opts, num_items=500, batch_size=8):
    """Render under each dataset sample's own mask+pose; compare the argmax
    of the rendered semantics to the input mask."""
    G, params, ds = opts.G, opts.G_params, opts.dataset
    assert ds.data_type == "seg", "mIoU is defined for seg configs"
    num_classes = G.semantic_channels
    rng = np.random.RandomState(opts.rng_seed)
    key = jax.random.PRNGKey(opts.rng_seed)
    cm = np.zeros((num_classes, num_classes), np.int64)
    correct = total = 0

    done = 0
    while done < num_items:
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (batch_size, G.z_dim))
        items = [ds[rng.randint(len(ds))] for _ in range(batch_size)]
        mask = np.stack([it["mask"] for it in items]).astype(np.float32)
        pose = jnp.asarray(np.stack([it["pose"] for it in items]), jnp.float32)
        out = G(params, z, pose, {"mask": jnp.asarray(mask), "pose": pose},
                noise_mode="const", det=True)
        pred = np.argmax(np.asarray(out["semantic"]), axis=-1)
        target = mask[..., 0].astype(np.int64)
        if pred.shape[1] != target.shape[1]:
            # nearest-resize target to the render resolution
            step = target.shape[1] / pred.shape[1]
            sel = (np.arange(pred.shape[1]) * step).astype(np.int64)
            target = target[:, sel][:, :, sel]
        cm += confusion_matrix(pred, target, num_classes)
        correct += int((pred == target).sum())
        total += pred.size
        done += batch_size
    return {"miou": miou_from_confusion(cm),
            "pixel_acc": correct / max(total, 1)}
