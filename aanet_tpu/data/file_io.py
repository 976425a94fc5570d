"""Image / disparity file IO.

Format behaviours follow the reference (`utils/file_io.py`):
  * images: RGB float32 (SceneFlow finalpass webp/png, KITTI png)
  * PFM disparities (SceneFlow; bottom-up scanline order, endian marker
    in the scale line; 'subset' variants store negated values)
  * KITTI disparity png: uint16 / 256.0
  * npy passthrough

The hot decode path (PNG/PFM) goes through the native C++ library
(`_native/loader.cpp`, ctypes-bridged by `native_io.py`) when present —
it releases the GIL so the loader thread pool decodes in parallel — and
falls back to PIL/numpy per file otherwise.
"""
from __future__ import annotations

import re
import sys

import numpy as np
from PIL import Image

from aanet_tpu.data import native_io


def read_img(filename: str) -> np.ndarray:
    """[H, W, 3] float32 RGB."""
    native = native_io.decode(filename)
    if native is not None and native.ndim == 3 and native.shape[-1] == 3:
        return native
    return np.array(Image.open(filename).convert("RGB"), dtype=np.float32)


def read_pfm(filename: str) -> tuple[np.ndarray, float]:
    """Read a PFM file -> (data, scale); rows flipped to top-down."""
    with open(filename, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{filename}: not a PFM file")
        dims = f.readline().decode("ascii")
        m = re.match(r"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{filename}: malformed PFM header")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    data = np.reshape(data, shape)
    return np.flipud(data).copy(), scale


def write_pfm(filename: str, image: np.ndarray, scale: float = 1.0) -> None:
    if image.dtype.name != "float32":
        raise ValueError("PFM image must be float32")
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
    else:
        raise ValueError("image must be HxWx3, HxWx1 or HxW")
    image = np.flipud(image)
    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(b"%d %d\n" % (image.shape[1], image.shape[0]))
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and sys.byteorder == "little"):
            scale = -scale
        f.write(b"%f\n" % scale)
        image.tofile(f)


def read_kitti_disp(filename: str) -> np.ndarray:
    """KITTI uint16 png / 256 -> float32 disparity (0 == invalid)."""
    native = native_io.decode(filename)
    if native is not None and native.ndim == 2:
        return native / 256.0
    depth = np.array(Image.open(filename))
    return depth.astype(np.float32) / 256.0


def read_disp(filename: str, subset: bool = False) -> np.ndarray:
    """[H, W] float32 disparity; dispatch on extension."""
    if filename.endswith("pfm"):
        disp = native_io.decode(filename)
        if disp is None or disp.ndim != 2:
            disp = np.ascontiguousarray(read_pfm(filename)[0])
        if subset:
            disp = -disp
        return disp
    if filename.endswith("png"):
        return read_kitti_disp(filename)
    if filename.endswith("npy"):
        return np.load(filename)
    raise ValueError(f"unknown disparity format: {filename}")
