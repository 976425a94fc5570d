"""Data layer: file IO, transforms, filename-list datasets, host pipeline."""

from aanet_tpu.data.file_io import read_img, read_disp, read_pfm, write_pfm
from aanet_tpu.data.datasets import StereoDataset
from aanet_tpu.data.pipeline import make_train_loader, make_val_loader

__all__ = [
    "read_img",
    "read_disp",
    "read_pfm",
    "write_pfm",
    "StereoDataset",
    "make_train_loader",
    "make_val_loader",
]
