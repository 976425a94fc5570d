"""MATLAB-format analysis export (.mat files via scipy.io).

Capability parity with the reference fork's `utils/utilsForMatlab.py`:
  * `LossRecord` — per-epoch arrays of losses/metrics (`getLossRecord`,
    `utilsForMatlab.py:8-31`)
  * `save_loss_for_matlab` — dump the record to `<dir>/lossRecord.mat`
    (`utilsForMatlab.py:32-44`)
  * `save_img_error_analysis` — per-sample image + prediction-pyramid +
    error-map dumps at fixed validation indices
    (`utilsForMatlab.py:51-89`)

scipy is available in the image; import is nevertheless deferred so the
module can be imported without it.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np

# The reference dumps analysis for these fixed validation sample indices
# (`utilsForMatlab.py:64-66`).
DEFAULT_ANALYSIS_INDICES = (0, 100, 200, 300, 400, 500)


class LossRecord:
    """Accumulates per-epoch scalar arrays for MATLAB analysis."""

    def __init__(self, keys: Optional[Iterable[str]] = None):
        self.data: Dict[str, List[float]] = {}
        if keys:
            for k in keys:
                self.data[k] = []

    def append(self, record: Dict[str, float]):
        for k, v in record.items():
            self.data.setdefault(k, []).append(float(v))

    def as_arrays(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v, np.float64) for k, v in self.data.items()}


def save_loss_for_matlab(
    record: LossRecord, checkpoint_dir: str, filename: str = "lossRecord.mat"
) -> str:
    """Write the accumulated record as a .mat file (utilsForMatlab.py:32-44)."""
    from scipy.io import savemat

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, filename)
    savemat(path, record.as_arrays())
    return path


def save_img_error_analysis(
    checkpoint_dir: str,
    epoch: int,
    sample_index: int,
    left: np.ndarray,
    gt_disp: np.ndarray,
    pred_pyramid: Iterable[np.ndarray],
    analysis_indices: Iterable[int] = DEFAULT_ANALYSIS_INDICES,
) -> Optional[str]:
    """Dump one validation sample's analysis bundle to .mat.

    Only fires for `sample_index` in `analysis_indices` (the reference's
    index gate, `utilsForMatlab.py:64-66`). The bundle holds the left
    image, GT, every pyramid level, and the final signed error map.
    """
    if sample_index not in set(analysis_indices):
        return None
    from scipy.io import savemat

    out_dir = os.path.join(checkpoint_dir, "matlab_analysis")
    os.makedirs(out_dir, exist_ok=True)
    pyramid = [np.asarray(p, np.float32) for p in pred_pyramid]
    final = pyramid[-1]
    bundle = {
        "left": np.asarray(left, np.float32),
        "gt_disp": np.asarray(gt_disp, np.float32),
        "error": final - np.asarray(gt_disp, np.float32),
        "epoch": np.asarray(epoch),
    }
    for i, p in enumerate(pyramid):
        bundle[f"pred_scale_{i}"] = p
    path = os.path.join(out_dir, f"epoch{epoch:03d}_sample{sample_index:05d}.mat")
    savemat(path, bundle)
    return path
