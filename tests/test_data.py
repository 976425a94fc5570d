"""Data-layer tests with synthetic on-disk fixtures (PFM/PNG round-trips,
filename-list datasets, transforms, the host pipeline)."""
import os

import numpy as np
import pytest
from PIL import Image

from aanet_tpu.data import file_io
from aanet_tpu.data.datasets import StereoDataset
from aanet_tpu.data.pipeline import make_train_loader, make_val_loader
from aanet_tpu.data import transforms as T


def test_pfm_roundtrip(tmp_path):
    disp = (np.random.RandomState(0).rand(12, 17) * 100).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    file_io.write_pfm(p, disp)
    back, scale = file_io.read_pfm(p)
    np.testing.assert_allclose(disp, back)


def test_kitti_png_roundtrip(tmp_path):
    disp = (np.random.RandomState(1).rand(8, 9) * 120).astype(np.float32)
    enc = (disp * 256).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(enc).save(p)
    back = file_io.read_disp(p)
    np.testing.assert_allclose(back, enc.astype(np.float32) / 256.0)


def _make_fixture(tmp_path, n=6, h=40, w=64):
    """Create a tiny SceneFlow-style dataset + filename lists."""
    data_dir = tmp_path / "data"
    lists_dir = tmp_path / "lists" / "filenames"
    os.makedirs(lists_dir, exist_ok=True)
    lines = []
    rs = np.random.RandomState(7)
    for i in range(n):
        for side in ("left", "right"):
            os.makedirs(data_dir / side, exist_ok=True)
        os.makedirs(data_dir / "disp", exist_ok=True)
        img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(data_dir / "left" / f"{i:04d}.png")
        Image.fromarray(img[:, ::-1]).save(data_dir / "right" / f"{i:04d}.png")
        disp = (rs.rand(h, w) * 50).astype(np.float32)
        file_io.write_pfm(str(data_dir / "disp" / f"{i:04d}.pfm"), disp)
        lines.append(
            f"left/{i:04d}.png right/{i:04d}.png disp/{i:04d}.pfm"
        )
    for name in (
        "SceneFlow_finalpass_train.txt",
        "SceneFlow_finalpass_val.txt",
        "SceneFlow_finalpass_test.txt",
    ):
        (lists_dir / name).write_text("\n".join(lines) + "\n")
    return str(data_dir), str(tmp_path / "lists")


def test_dataset_and_train_loader(tmp_path):
    data_dir, fn_root = _make_fixture(tmp_path)
    ds = StereoDataset(
        data_dir,
        dataset_name="SceneFlow",
        mode="train",
        filename_root=fn_root,
        transform=T.train_transform(32, 48),
    )
    assert len(ds) == 6
    s = ds.load(0, np.random.default_rng(0))
    assert s["left"].shape == (32, 48, 3)
    assert s["disp"].shape == (32, 48)
    assert s["left"].dtype == np.float32

    batches = list(
        make_train_loader(
            ds, global_batch_size=4, epoch=0, num_workers=2,
            process_index=0, process_count=1,
        )
    )
    assert len(batches) == 1  # drop_last: 6 // 4
    b = batches[0]
    assert b["left"].shape == (4, 32, 48, 3)
    assert b["disp"].shape == (4, 32, 48)


def test_train_loader_host_sharding(tmp_path):
    data_dir, fn_root = _make_fixture(tmp_path)
    ds = StereoDataset(
        data_dir, mode="train", filename_root=fn_root,
        transform=T.val_transform(32, 48),
    )
    seen = []
    for pi in range(2):
        for b in make_train_loader(
            ds, global_batch_size=4, epoch=3, num_workers=1,
            process_index=pi, process_count=2,
        ):
            assert b["left"].shape[0] == 2  # local batch = 4 / 2 hosts
            seen.extend(b["left_name"])
    assert len(seen) == len(set(seen)) == 4  # disjoint shards


def test_train_loader_epoch_reshuffles(tmp_path):
    data_dir, fn_root = _make_fixture(tmp_path)
    ds = StereoDataset(
        data_dir, mode="train", filename_root=fn_root,
        transform=T.val_transform(32, 48),
    )
    def names(epoch):
        out = []
        for b in make_train_loader(
            ds, global_batch_size=2, epoch=epoch, num_workers=1,
            process_index=0, process_count=1,
        ):
            out.extend(b["left_name"])
        return out
    assert names(0) != names(1)
    assert names(0) == names(0)  # deterministic per epoch


def test_val_loader_keeps_remainder(tmp_path):
    data_dir, fn_root = _make_fixture(tmp_path)
    ds = StereoDataset(
        data_dir, mode="val", filename_root=fn_root,
        transform=T.val_transform(32, 48),
    )
    batches = list(make_val_loader(ds, batch_size=4, num_workers=1))
    assert [b["left"].shape[0] for b in batches] == [4, 2]


def test_random_crop_pads_top_right():
    sample = {
        "left": np.ones((10, 12, 3), np.float32),
        "right": np.ones((10, 12, 3), np.float32),
        "disp": np.ones((10, 12), np.float32),
    }
    out = T.RandomCrop(16, 20)(sample, np.random.default_rng(0))
    assert out["left"].shape == (16, 20, 3)
    assert out["disp"].shape == (16, 20)
    assert (out["disp"][:6, :] == 0).all()  # top pad
    assert (out["disp"][:, 12:] == 0).all()  # right pad
    assert (out["disp"][6:, :12] == 1).all()


def test_random_color_applies_same_jitter_to_both_views():
    rs = np.random.RandomState(3)
    img = (rs.rand(16, 16, 3) * 255).astype(np.float32)
    sample = {"left": img.copy(), "right": img.copy()}
    out = T.RandomColor()(sample, np.random.default_rng(5))
    np.testing.assert_allclose(out["left"], out["right"])
    assert out["left"].dtype == np.float32


def test_normalize_imagenet():
    sample = {
        "left": np.full((4, 4, 3), 128.0, np.float32),
        "right": np.full((4, 4, 3), 128.0, np.float32),
    }
    out = T.Normalize()(T.ToArray()(sample, None), None)
    want = (128 / 255.0 - np.array(T.IMAGENET_MEAN)) / np.array(T.IMAGENET_STD)
    np.testing.assert_allclose(out["left"][0, 0], want, rtol=1e-5)
