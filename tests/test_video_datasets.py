"""REDS / Vimeo90K training datasets (reference
realDenoising/basicsr/data/{reds,vimeo90k}_dataset.py) on synthetic clips."""

import os
import random

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import tpuir.train  # noqa: F401  (registers datasets)
from tpuir.train.data import build_dataset


def _write_png(path, seed, h=32, w=40):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    cv2.imwrite(path, img)


def _make_reds(root, clips=("000", "001", "015"), frames=6, flow=False):
    gt, lq = os.path.join(root, "gt"), os.path.join(root, "lq")
    fl = os.path.join(root, "flow")
    meta = os.path.join(root, "meta.txt")
    with open(meta, "w") as f:
        for c in clips:
            f.write(f"{c} {frames} (32,40,3)\n")
            for i in range(frames):
                _write_png(os.path.join(gt, c, f"{i:08d}.png"), hash((c, i)) % 1000)
                _write_png(os.path.join(lq, c, f"{i:08d}.png"), hash((c, i, 1)) % 1000)
                if flow:
                    for tag in ("p1", "n1"):
                        p = os.path.join(fl, c, f"{i:08d}_{tag}.png")
                        os.makedirs(os.path.dirname(p), exist_ok=True)
                        arr = (np.random.RandomState(i).rand(64, 40) * 254).astype(np.uint8)
                        cv2.imwrite(p, arr)
    return gt, lq, fl, meta


def test_reds_dataset_partition_and_shapes(tmp_path):
    gt, lq, fl, meta = _make_reds(str(tmp_path))
    opt = {
        "type": "REDSDataset", "dataroot_gt": gt, "dataroot_lq": lq,
        "dataroot_flow": None, "meta_info_file": meta,
        "val_partition": "REDS4", "io_backend": {"type": "disk"},
        "num_frame": 3, "gt_size": 16, "interval_list": [1],
        "random_reverse": False, "use_flip": True, "use_rot": True,
        "scale": 1, "rng": random.Random(0),
    }
    ds = build_dataset(opt)
    # REDS4 removes clips 000 and 015 -> only clip 001 remains (6 frames)
    assert len(ds) == 6
    assert all(k.split("/")[0] == "001" for k in ds.keys)
    item = ds[2]
    assert item["lq"].shape == (3, 16, 16, 3)
    assert item["gt"].shape == (16, 16, 3)
    assert item["lq"].dtype == np.float32 and item["lq"].max() <= 1.0
    assert item["key"] == "001/00000002"


def test_reds_dataset_official_partition_and_flow(tmp_path):
    gt, lq, fl, meta = _make_reds(str(tmp_path), flow=True)
    opt = {
        "type": "REDSDataset", "dataroot_gt": gt, "dataroot_lq": lq,
        "dataroot_flow": fl, "meta_info_file": meta,
        "val_partition": "official", "io_backend": {"type": "disk"},
        "num_frame": 3, "gt_size": 16, "interval_list": [1],
        "random_reverse": True, "use_flip": True, "use_rot": True,
        "scale": 1, "rng": random.Random(1),
    }
    ds = build_dataset(opt)
    assert len(ds) == 18  # official partition removes 240-269: none here
    item = ds[1]
    assert item["lq"].shape == (3, 16, 16, 3)
    assert item["flow"].shape == (3, 16, 16, 2)
    # center flow is the inserted zero flow
    np.testing.assert_array_equal(item["flow"][1], 0.0)


def test_reds_rejects_bad_partition_and_even_frames(tmp_path):
    gt, lq, fl, meta = _make_reds(str(tmp_path))
    base = {
        "type": "REDSDataset", "dataroot_gt": gt, "dataroot_lq": lq,
        "dataroot_flow": None, "meta_info_file": meta,
        "io_backend": {"type": "disk"}, "num_frame": 3, "gt_size": 16,
        "interval_list": [1], "random_reverse": False, "use_flip": False,
        "use_rot": False, "scale": 1,
    }
    with pytest.raises(ValueError):
        build_dataset({**base, "val_partition": "bogus"})
    with pytest.raises(ValueError):
        build_dataset({**base, "val_partition": "REDS4", "num_frame": 4})


def test_vimeo90k_dataset(tmp_path):
    root = str(tmp_path)
    gt, lq = os.path.join(root, "gt"), os.path.join(root, "lq")
    meta = os.path.join(root, "meta.txt")
    keys = ["00001/0001", "00001/0002"]
    with open(meta, "w") as f:
        for k in keys:
            f.write(f"{k} 7 (32,40,3)\n")
            clip, seq = k.split("/")
            for i in range(1, 8):
                _write_png(os.path.join(gt, clip, seq, f"im{i}.png"), i)
                _write_png(os.path.join(lq, clip, seq, f"im{i}.png"), i + 10)
    opt = {
        "type": "Vimeo90KDataset", "dataroot_gt": gt, "dataroot_lq": lq,
        "meta_info_file": meta, "io_backend": {"type": "disk"},
        "num_frame": 5, "gt_size": 16, "random_reverse": False,
        "use_flip": False, "use_rot": False, "scale": 1,
        "rng": random.Random(0),
    }
    ds = build_dataset(opt)
    assert len(ds) == 2
    assert ds.neighbor_list == [2, 3, 4, 5, 6]  # centered on im4
    item = ds[0]
    assert item["lq"].shape == (5, 16, 16, 3)
    assert item["gt"].shape == (16, 16, 3)
    assert item["key"] == "00001/0001"
