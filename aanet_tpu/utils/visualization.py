"""Visualization: KITTI-style error maps, disparity colormaps, image
panels and signed-error histograms for TensorBoard.

Capability parity with the reference's `utils/visualization.py`:
  * 10-bin blue->red error colormap (`visualization.py:9-27`)
  * error image with joint abs/rel thresholds (`visualization.py:30-65`)
  * image grids to TensorBoard (`visualization.py:68-83`)
  * signed-error histograms (`visualization.py:98-126`)

TensorBoard is optional: `SummaryWriterLike` resolves to
`torch.utils.tensorboard.SummaryWriter` when available and otherwise to a
filesystem writer that dumps PNG panels + a scalars JSONL — observability
never blocks training.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

# ---------------------------------------------------------------------------
# Colormaps
# ---------------------------------------------------------------------------

# 10 log-spaced error bins, blue (small) -> red (large); the KITTI devkit
# colormap reproduced by the reference (`utils/visualization.py:9-27`).
_ERROR_BINS = np.array(
    [
        [0 / 3.0, 0.1875 / 3.0, 49, 54, 149],
        [0.1875 / 3.0, 0.375 / 3.0, 69, 117, 180],
        [0.375 / 3.0, 0.75 / 3.0, 116, 173, 209],
        [0.75 / 3.0, 1.5 / 3.0, 171, 217, 233],
        [1.5 / 3.0, 3 / 3.0, 224, 243, 248],
        [3 / 3.0, 6 / 3.0, 254, 224, 144],
        [6 / 3.0, 12 / 3.0, 253, 174, 97],
        [12 / 3.0, 24 / 3.0, 244, 109, 67],
        [24 / 3.0, 48 / 3.0, 215, 48, 39],
        [48 / 3.0, np.inf, 165, 0, 38],
    ],
    dtype=np.float64,
)


def gen_error_colormap() -> np.ndarray:
    """[10, 5] rows of (lo, hi, R, G, B); thresholds relative to 3px/5%."""
    return _ERROR_BINS.copy()


def disp_error_img(
    d_est: np.ndarray,
    d_gt: np.ndarray,
    abs_thres: float = 3.0,
    rel_thres: float = 0.05,
    dilate_radius: int = 1,
) -> np.ndarray:
    """KITTI error visualization (`utils/visualization.py:30-65`).

    Args:
      d_est, d_gt: [H, W] (or [B, H, W] — batched) disparities.
      abs_thres/rel_thres: D1 thresholds normalising the error.
    Returns:
      float32 RGB image(s) in [0, 1], [..., H, W, 3]; invalid GT black.
    """
    d_est = np.asarray(d_est, np.float32)
    d_gt = np.asarray(d_gt, np.float32)
    mask = d_gt > 0
    error = np.abs(d_est - d_gt)
    # normalized error: min(err/abs_thres, (err/gt)/rel_thres)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.where(mask, error / np.maximum(d_gt, 1e-8) / rel_thres, 0.0)
    err_norm = np.minimum(error / abs_thres, rel)

    img = np.zeros(d_gt.shape + (3,), np.float32)
    for lo, hi, r, g, b in _ERROR_BINS:
        sel = mask & (err_norm >= lo) & (err_norm < hi)
        img[sel] = (r / 255.0, g / 255.0, b / 255.0)

    if dilate_radius > 0:
        try:
            import cv2

            kernel = np.ones((2 * dilate_radius + 1,) * 2, np.uint8)
            if img.ndim == 3:
                img = cv2.dilate(img, kernel)
            else:
                img = np.stack([cv2.dilate(im, kernel) for im in img])
        except Exception:
            pass  # dilation is cosmetic only
    return img


# Cyclic KITTI disparity colormap (devkit `disp_to_color`); piecewise-linear
# interpolation through 8 anchor colours weighted by band widths.
_DISP_MAP = np.array(
    [
        [0, 0, 0, 114],
        [0, 0, 1, 185],
        [1, 0, 0, 114],
        [1, 0, 1, 174],
        [0, 1, 0, 114],
        [0, 1, 1, 185],
        [1, 1, 0, 114],
        [1, 1, 1, 0],
    ],
    dtype=np.float64,
)


def disp_to_color(disp: np.ndarray, max_disp: Optional[float] = None) -> np.ndarray:
    """Map disparity to the KITTI devkit rainbow; [H, W] -> [H, W, 3] in [0,1]."""
    disp = np.asarray(disp, np.float64)
    if max_disp is None:
        max_disp = max(float(disp.max()), 1e-6)
    x = np.clip(disp / max_disp, 0.0, 1.0)

    weights = _DISP_MAP[:-1, 3]
    cum = np.concatenate([[0.0], np.cumsum(weights)])
    cum /= cum[-1]

    out = np.zeros(x.shape + (3,), np.float64)
    for i in range(len(_DISP_MAP) - 1):
        lo, hi = cum[i], cum[i + 1]
        sel = (x >= lo) & (x <= hi if i == len(_DISP_MAP) - 2 else x < hi)
        t = np.zeros_like(x)
        denom = max(hi - lo, 1e-12)
        t[sel] = (x[sel] - lo) / denom
        c0 = _DISP_MAP[i, :3]
        c1 = _DISP_MAP[i + 1, :3]
        for ch in range(3):
            out[..., ch][sel] = (1 - t[sel]) * c0[ch] + t[sel] * c1[ch]
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------


class FileSummaryWriter:
    """Filesystem fallback for TensorBoard: PNG panels + scalars JSONL."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._scalars = os.path.join(log_dir, "scalars.jsonl")

    def add_scalar(self, tag: str, value, global_step: int = 0):
        with open(self._scalars, "a") as f:
            f.write(
                json.dumps(
                    {"tag": tag, "value": float(value), "step": int(global_step)}
                )
                + "\n"
            )

    def add_image(self, tag: str, img: np.ndarray, global_step: int = 0):
        """img: [3, H, W] or [H, W, 3] float in [0,1]."""
        from PIL import Image

        img = np.asarray(img)
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = np.transpose(img, (1, 2, 0))
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        safe = tag.replace("/", "_")
        path = os.path.join(self.log_dir, f"{safe}_step{global_step:08d}.png")
        Image.fromarray(arr).save(path)

    def add_histogram(self, tag: str, values, global_step: int = 0, bins=None):
        values = np.asarray(values).ravel()
        hist, edges = np.histogram(values, bins=bins if bins is not None else 64)
        with open(self._scalars, "a") as f:
            f.write(
                json.dumps(
                    {
                        "tag": tag + "/hist",
                        "step": int(global_step),
                        "counts": hist.tolist(),
                        "edges": np.round(edges, 5).tolist(),
                    }
                )
                + "\n"
            )

    def flush(self):
        pass

    def close(self):
        pass


def make_summary_writer(log_dir: str):
    """TensorBoard writer when available, file writer otherwise."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir)
    except Exception:
        return FileSummaryWriter(log_dir)


# ---------------------------------------------------------------------------
# Panel / histogram helpers (reference save_images / save_hist)
# ---------------------------------------------------------------------------


def _to_chw(img: np.ndarray) -> np.ndarray:
    """[H, W] / [H, W, C] -> [3, H, W] float in [0, 1]."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        mx = max(float(img.max()), 1e-6)
        img = np.stack([img / mx] * 3, axis=0)
    elif img.ndim == 3 and img.shape[-1] in (1, 3):
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.max() > 1.5:  # raw 0..255 image
            img = img / 255.0
        img = np.transpose(img, (2, 0, 1))
    return np.clip(img, 0.0, 1.0)


def save_images(
    writer,
    mode_tag: str,
    images_dict: Dict[str, np.ndarray],
    epoch: int,
    max_items: int = 1,
):
    """Write a dict of images/disparities as TB panels
    (reference `utils/visualization.py:68-83`; batched inputs use the
    first `max_items` samples)."""
    for tag, value in images_dict.items():
        value = np.asarray(value)
        batched = value.ndim == 4 or (value.ndim == 3 and value.shape[-1] not in (1, 3))
        items = value[:max_items] if batched else [value]
        for i, item in enumerate(items):
            full_tag = f"{mode_tag}/{tag}" + (f"/{i}" if len(items) > 1 else "")
            writer.add_image(full_tag, _to_chw(item), epoch)


def disp_error_hist(
    d_est: np.ndarray, d_gt: np.ndarray, mask: Optional[np.ndarray] = None
) -> np.ndarray:
    """Signed error (est - gt) over valid pixels
    (reference `utils/visualization.py:98-126`)."""
    d_est = np.asarray(d_est, np.float32)
    d_gt = np.asarray(d_gt, np.float32)
    if mask is None:
        mask = d_gt > 0
    return (d_est - d_gt)[mask]


def save_hist(writer, mode_tag: str, d_est, d_gt, epoch: int, mask=None):
    errors = disp_error_hist(d_est, d_gt, mask)
    if errors.size:
        writer.add_histogram(f"{mode_tag}/signed_error", errors, epoch)
