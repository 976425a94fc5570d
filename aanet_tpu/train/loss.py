"""Multi-scale disparity supervision loss.

Reference `/root/reference/model.py:89-137`:
  * pyramid weights [1/3, 2/3, 1, 1, 1] for 5 outputs (4: [1/3,2/3,1,1];
    3: [1,1,1]; 1: [1])
  * low-res predictions are bilinearly upsampled to GT resolution and
    value-rescaled by W_gt/W_pred before the loss
  * masked smooth-L1 (beta=1) over valid pixels
  * optional pseudo-GT term on (~mask & pseudo_valid) pixels
  * highest_loss_only keeps only the final full-res output (fine-tuning)
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from aanet_tpu.ops.resize import upsample_disparity

PYRAMID_WEIGHTS = {
    5: (1 / 3, 2 / 3, 1.0, 1.0, 1.0),
    4: (1 / 3, 2 / 3, 1.0, 1.0),
    3: (1.0, 1.0, 1.0),
    1: (1.0,),
}


def smooth_l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise smooth-L1 (huber, beta=1) — torch F.smooth_l1_loss."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def _masked_mean(value: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(value * m) / jnp.maximum(jnp.sum(m), 1.0)


def pyramid_loss(
    pred_pyramid: List[jax.Array],
    gt_disp: jax.Array,
    mask: jax.Array,
    pseudo_gt_disp: Optional[jax.Array] = None,
    pseudo_mask: Optional[jax.Array] = None,
    highest_loss_only: bool = False,
) -> Tuple[jax.Array, dict]:
    """Weighted multi-scale smooth-L1 loss.

    Args:
      pred_pyramid: list of [B, h_s, w_s] predictions, coarse->fine.
      gt_disp: [B, H, W].
      mask: [B, H, W] bool validity.
      pseudo_gt_disp/pseudo_mask: optional pseudo-GT supervision.
    Returns:
      (total_loss, aux) with aux['disp_loss'], aux['pyramid_losses'],
      aux['pseudo_loss'].
    """
    if highest_loss_only:
        pred_pyramid = [pred_pyramid[-1]]
    n = len(pred_pyramid)
    if n not in PYRAMID_WEIGHTS:
        raise NotImplementedError(f"no weights for pyramid of length {n}")
    weights = PYRAMID_WEIGHTS[n]

    gt_hw = gt_disp.shape[1:]
    disp_loss = 0.0
    pseudo_loss = 0.0
    per_scale = []
    for pred, w in zip(pred_pyramid, weights):
        if pred.shape[1:] != gt_hw:
            pred = upsample_disparity(pred, gt_hw)
        curr = _masked_mean(smooth_l1(pred, gt_disp), mask)
        disp_loss = disp_loss + w * curr
        per_scale.append(curr)
        if pseudo_gt_disp is not None:
            pcurr = _masked_mean(smooth_l1(pred, pseudo_gt_disp), pseudo_mask)
            pseudo_loss = pseudo_loss + w * pcurr

    total = disp_loss + pseudo_loss
    aux = {
        "disp_loss": disp_loss,
        "pseudo_loss": pseudo_loss,
        "pyramid_losses": per_scale,
    }
    return total, aux
