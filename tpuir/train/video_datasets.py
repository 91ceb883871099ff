"""Fork-B extra datasets: single-folder (FFHQ-style) and per-clip video
test datasets (reds/vimeo90k-style layouts).

Equivalents of /root/reference/src/mair/realDenoising/basicsr/data's extra
datasets, scoped to the disk backend. These are outside the reference's
tested restoration matrix, but keep the framework surface complete for
training on those layouts.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, List

import numpy as np

from tpuir.registry import DATASET_REGISTRY
from tpuir.train.data import _imread
from tpuir.utils.natsort import natsorted


@DATASET_REGISTRY.register()
class FFHQDataset:
    """Flat GT-only folder; returns {'gt': HWC float32 BGR [0,1]}."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.paths = natsorted(glob(os.path.join(opt["dataroot_gt"], "*.*")))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict:
        img = _imread(self.paths[index])
        return {"gt": np.ascontiguousarray(img, np.float32),
                "gt_path": self.paths[index]}


@DATASET_REGISTRY.register()
class VideoTestDataset:
    """Per-clip frame folders: dataroot_lq/<clip>/*.png paired with
    dataroot_gt/<clip>/*.png. Yields one frame (+ neighbors) at a time."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.num_frame = opt.get("num_frame", 1)
        lq_root, gt_root = opt["dataroot_lq"], opt["dataroot_gt"]
        self.items: List = []
        for clip in natsorted(os.listdir(lq_root)):
            lq_frames = natsorted(glob(os.path.join(lq_root, clip, "*.*")))
            gt_frames = natsorted(glob(os.path.join(gt_root, clip, "*.*")))
            for i in range(len(gt_frames)):
                self.items.append((clip, i, lq_frames, gt_frames))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict:
        clip, i, lq_frames, gt_frames = self.items[index]
        half = self.num_frame // 2
        idxs = [min(max(i + d, 0), len(lq_frames) - 1)
                for d in range(-half, half + 1)]
        lq = np.stack([_imread(lq_frames[j]) for j in idxs])
        if self.num_frame == 1:
            lq = lq[0]
        gt = _imread(gt_frames[i])
        return {
            "lq": np.ascontiguousarray(lq, np.float32),
            "gt": np.ascontiguousarray(gt, np.float32),
            "lq_path": lq_frames[i],
            "gt_path": gt_frames[i],
            "folder": clip,
            "idx": f"{i}/{len(gt_frames)}",
        }
