"""Dataset/pipeline tests over a synthetic on-disk dataset."""

import json
import os
import zipfile

import numpy as np
import PIL.Image
import pytest

from pix2pix3d_tpu.train.dataset import (
    ImageSegFolderDataset, ImageEdgeFolderDataset, InfiniteSampler, DataLoader)


@pytest.fixture(scope="module")
def synthetic_seg(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "imgs"
    mask_dir = root / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    labels = []
    for i in range(6):
        img = rng.randint(0, 255, size=(32, 32, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(img_dir / f"img{i:04d}.png")
        mask = rng.randint(0, 6, size=(32, 32), dtype=np.uint8)
        PIL.Image.fromarray(mask).save(mask_dir / f"img{i:04d}.png")
        labels.append([f"img{i:04d}.png", list(np.linspace(0, 1, 25))])
    with open(img_dir / "dataset.json", "w") as f:
        json.dump({"labels": labels}, f)
    return str(img_dir), str(mask_dir)


def test_seg_dataset(synthetic_seg):
    img_dir, mask_dir = synthetic_seg
    ds = ImageSegFolderDataset(img_dir, mask_dir, use_labels=True)
    assert len(ds) == 6
    assert ds.resolution == 32
    assert ds.label_dim == 25
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32, 1)
    assert item["pose"].shape == (25,)
    std = ds.get_label_std()
    assert std.shape == (25,)


def test_xflip_doubles(synthetic_seg):
    img_dir, mask_dir = synthetic_seg
    ds = ImageSegFolderDataset(img_dir, mask_dir, use_labels=True, xflip=True)
    assert len(ds) == 12
    a = ds[0]["image"]
    b = ds[6]["image"]
    np.testing.assert_array_equal(a, b[:, ::-1])


def test_zip_dataset(synthetic_seg, tmp_path):
    img_dir, mask_dir = synthetic_seg
    img_zip = tmp_path / "imgs.zip"
    mask_zip = tmp_path / "masks.zip"
    for src, dst in [(img_dir, img_zip), (mask_dir, mask_zip)]:
        with zipfile.ZipFile(dst, "w") as z:
            for f in os.listdir(src):
                z.write(os.path.join(src, f), f)
    ds = ImageSegFolderDataset(str(img_zip), str(mask_zip), use_labels=True)
    assert len(ds) == 6
    assert ds[1]["image"].shape == (32, 32, 3)


def test_edge_dataset(synthetic_seg):
    img_dir, mask_dir = synthetic_seg
    ds = ImageEdgeFolderDataset(img_dir, mask_dir, use_labels=True)
    item = ds[0]
    assert item["mask"].shape == (32, 32, 1)
    assert item["mask"].dtype == np.uint8


def test_infinite_sampler_shards():
    s0 = list(__import__("itertools").islice(
        iter(InfiniteSampler(10, rank=0, num_replicas=2, seed=1)), 20))
    s1 = list(__import__("itertools").islice(
        iter(InfiniteSampler(10, rank=1, num_replicas=2, seed=1)), 20))
    assert all(0 <= i < 10 for i in s0 + s1)
    assert s0 != s1


def test_dataloader_batches(synthetic_seg):
    img_dir, mask_dir = synthetic_seg
    ds = ImageSegFolderDataset(img_dir, mask_dir, use_labels=True)
    loader = DataLoader(ds, batch_size=4)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["image"].min() >= -1 and batch["image"].max() <= 1
    assert batch["mask"].shape == (4, 32, 32, 1)
    assert batch["pose"].shape == (4, 25)
