"""Disparity metrics: EPE, D1, >Npx — masked, jittable.

Reference `/root/reference/metric.py:7-57`. The reference boolean-indexes
with the mask (d_est[mask]); the jittable equivalent is a weighted mean
with the mask as weights — identical values, static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-8


def _masked_mean(value: jax.Array, mask: jax.Array) -> jax.Array:
    mask = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(value.astype(jnp.float32) * mask) / denom


def epe_metric(d_est: jax.Array, d_gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean absolute disparity error over valid pixels."""
    return _masked_mean(jnp.abs(d_est - d_gt), mask)


def d1_metric(d_est: jax.Array, d_gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Fraction of valid pixels with error > 3px AND > 5% of GT."""
    e = jnp.abs(d_est - d_gt)
    err = (e > 3.0) & (e / jnp.maximum(d_gt, EPSILON) > 0.05)
    return _masked_mean(err, mask)


def thres_metric(
    d_est: jax.Array, d_gt: jax.Array, mask: jax.Array, thres: float
) -> jax.Array:
    """Fraction of valid pixels with error > thres px."""
    e = jnp.abs(d_est - d_gt)
    return _masked_mean(e > thres, mask)


def validity_mask(d_gt: jax.Array, max_disp: int) -> jax.Array:
    """(gt > 0) & (gt < max_disp) — KITTI convention, model.py:71."""
    return (d_gt > 0) & (d_gt < max_disp)


def all_metrics(d_est, d_gt, mask):
    """The reference's full metric suite (model.py:327-341)."""
    out = {
        "epe": epe_metric(d_est, d_gt, mask),
        "d1": d1_metric(d_est, d_gt, mask),
    }
    for t in (1.0, 2.0, 3.0, 10.0, 20.0):
        out[f"thres{int(t)}"] = thres_metric(d_est, d_gt, mask, t)
    return out
