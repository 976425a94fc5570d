"""Generate a synthetic constant-shift stereo fixture.

The TPU-native analog of the reference's overfit harness
(`/root/reference/dataloader/dataloader.py:31-42` + the
`fileNames_overfit/` split mode): a small, fully controlled dataset with
EXACT integer ground-truth disparity, usable to demonstrate full-preset
training convergence without SceneFlow/KITTI on disk
(docs/CONVERGENCE_r04.md).

Each pair i gets its own disparity d_i in [min_disp, max_disp_gt]:
left[x] = right[x - d_i] (horizontally smoothed noise so bilinear shifts
are learnable), disp = d_i everywhere. Lists are written for
train/val/test so the same fixture drives the CLI's train, evaluate and
inference subcommands.

Usage:
  python tools/synthetic_dataset.py --out /tmp/conv --pairs 16 \
      --height 96 --width 192 --min_disp 3 --max_disp_gt 10
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aanet_tpu.data.file_io import write_pfm  # noqa: E402


def generate(
    out: str,
    pairs: int = 16,
    height: int = 96,
    width: int = 192,
    min_disp: int = 3,
    max_disp_gt: int = 10,
    seed: int = 0,
) -> None:
    data_dir = os.path.join(out, "data")
    lists_dir = os.path.join(out, "lists", "filenames")
    os.makedirs(lists_dir, exist_ok=True)
    for side in ("left", "right", "disp"):
        os.makedirs(os.path.join(data_dir, side), exist_ok=True)

    rs = np.random.RandomState(seed)
    lines = []
    for i in range(pairs):
        d = int(rs.randint(min_disp, max_disp_gt + 1))
        base = rs.rand(height, width + max_disp_gt + 1, 3)
        # smooth horizontally so sub-pixel bilinear shifts are learnable
        base = (base + np.roll(base, 1, 1) + np.roll(base, 2, 1)) / 3
        right = (base[:, :width] * 255).astype(np.uint8)
        left = (base[:, d : width + d] * 255).astype(np.uint8)
        Image.fromarray(left).save(os.path.join(data_dir, "left", f"{i}.png"))
        Image.fromarray(right).save(os.path.join(data_dir, "right", f"{i}.png"))
        write_pfm(
            os.path.join(data_dir, "disp", f"{i}.pfm"),
            np.full((height, width), float(d), np.float32),
        )
        lines.append(f"left/{i}.png right/{i}.png disp/{i}.pfm")

    for split in ("train", "val", "test"):
        with open(
            os.path.join(lists_dir, f"SceneFlow_finalpass_{split}.txt"), "w"
        ) as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {pairs} pairs under {data_dir}, lists under {lists_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--min_disp", type=int, default=3)
    ap.add_argument("--max_disp_gt", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    generate(**vars(ap.parse_args()))


if __name__ == "__main__":
    main()
