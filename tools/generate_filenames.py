"""Regenerate dataset split lists (filename files).

Equivalent of the reference's `filenames/generate_filenames.py:5` but
covering all three dataset families. Lists use the reference's exact
format — `left right [disp]` per line, paths relative to the data root —
so lists generated here drive either framework.

Usage:
  python tools/generate_filenames.py kitti2015 /data/kitti_2015 out_dir/
  python tools/generate_filenames.py kitti2012 /data/kitti_2012 out_dir/
  python tools/generate_filenames.py sceneflow /data/SceneFlow out_dir/ \
      [--pass finalpass] [--subset N]
"""
from __future__ import annotations

import os
import sys
from glob import glob


def _write(path: str, lines: list[str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"{path}: {len(lines)} samples")


def gen_kitti_2015(data_dir: str, out_dir: str) -> None:
    """4:1 train/val split by image id (reference generate_filenames.py:12),
    plus train_all and test lists."""
    train, val, train_all = [], [], []
    left_imgs = sorted(glob(os.path.join(data_dir, "training", "image_2", "*_10.png")))
    for left in left_imgs:
        right = left.replace("image_2", "image_3")
        disp = left.replace("image_2", "disp_occ_0")
        rel = lambda p: os.path.relpath(p, data_dir)
        line = f"{rel(left)} {rel(right)} {rel(disp)}"
        img_id = int(os.path.basename(left).split("_")[0])
        (val if img_id % 5 == 0 else train).append(line)
        train_all.append(line)
    _write(os.path.join(out_dir, "KITTI_2015_train.txt"), train)
    _write(os.path.join(out_dir, "KITTI_2015_val.txt"), val)
    _write(os.path.join(out_dir, "KITTI_2015_train_all.txt"), train_all)

    test = []
    for left in sorted(glob(os.path.join(data_dir, "testing", "image_2", "*_10.png"))):
        right = left.replace("image_2", "image_3")
        rel = lambda p: os.path.relpath(p, data_dir)
        test.append(f"{rel(left)} {rel(right)}")
    _write(os.path.join(out_dir, "KITTI_2015_test.txt"), test)


def gen_kitti_2012(data_dir: str, out_dir: str) -> None:
    """Same 4:1 split recipe for KITTI 2012 (colored_0/1, disp_occ)."""
    train, val, train_all = [], [], []
    left_imgs = sorted(glob(os.path.join(data_dir, "training", "colored_0", "*_10.png")))
    for left in left_imgs:
        right = left.replace("colored_0", "colored_1")
        disp = left.replace("colored_0", "disp_occ")
        rel = lambda p: os.path.relpath(p, data_dir)
        line = f"{rel(left)} {rel(right)} {rel(disp)}"
        img_id = int(os.path.basename(left).split("_")[0])
        (val if img_id % 5 == 0 else train).append(line)
        train_all.append(line)
    _write(os.path.join(out_dir, "KITTI_2012_train.txt"), train)
    _write(os.path.join(out_dir, "KITTI_2012_val.txt"), val)
    _write(os.path.join(out_dir, "KITTI_2012_train_all.txt"), train_all)

    test = []
    for left in sorted(glob(os.path.join(data_dir, "testing", "colored_0", "*_10.png"))):
        right = left.replace("colored_0", "colored_1")
        rel = lambda p: os.path.relpath(p, data_dir)
        test.append(f"{rel(left)} {rel(right)}")
    _write(os.path.join(out_dir, "KITTI_2012_test.txt"), test)


def gen_sceneflow(
    data_dir: str, out_dir: str, render_pass: str = "finalpass", subset: int = 0
) -> None:
    """SceneFlow FlyingThings3D-style layout: frames_<pass>/TRAIN|TEST and
    disparity/ trees; left images under .../left/NNNN.png."""
    for split, name in (("TRAIN", "train"), ("TEST", "test")):
        lines = []
        pattern = os.path.join(
            data_dir, f"frames_{render_pass}", split, "**", "left", "*.png"
        )
        for left in sorted(glob(pattern, recursive=True)):
            right = left.replace("/left/", "/right/")
            disp = (
                left.replace(f"frames_{render_pass}", "disparity").replace(
                    ".png", ".pfm"
                )
            )
            rel = lambda p: os.path.relpath(p, data_dir)
            lines.append(f"{rel(left)} {rel(right)} {rel(disp)}")
        if split == "TRAIN" and subset:
            lines = lines[:subset]
        _write(
            os.path.join(out_dir, f"SceneFlow_{render_pass}_{name}.txt"), lines
        )


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        raise SystemExit(1)
    family, data_dir, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    if family == "kitti2015":
        gen_kitti_2015(data_dir, out_dir)
    elif family == "kitti2012":
        gen_kitti_2012(data_dir, out_dir)
    elif family == "sceneflow":
        rp = (
            sys.argv[sys.argv.index("--pass") + 1]
            if "--pass" in sys.argv
            else "finalpass"
        )
        sub = (
            int(sys.argv[sys.argv.index("--subset") + 1])
            if "--subset" in sys.argv
            else 0
        )
        gen_sceneflow(data_dir, out_dir, rp, sub)
    else:
        raise SystemExit(f"unknown dataset family {family!r}")


if __name__ == "__main__":
    main()
