"""Bilinear / nearest resize with PyTorch `F.interpolate` semantics.

Matches the reference's `F.interpolate(..., mode='bilinear',
align_corners=False)` (used in `nets/aanet.py:180-203`,
`nets/refinement.py:46,87`, `nets/aggregation.py:395`, `model.py:114-119`)
and `mode='nearest'` (`nets/feature.py:223-224`).

torch bilinear is NOT anti-aliased, so on downscale it differs from
`jax.image.resize`. We therefore implement it directly as two separable
1-D interpolations expressed as dense [out, in] weight-matrix matmuls —
exact semantics, static shapes, and the work lands on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] matrix implementing half-pixel-center linear resampling
    (align_corners=False, no antialias — torch semantics)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    t = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - t)
    np.add.at(w, (rows, hi), t)
    return w


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """torch legacy-nearest index map: src = floor(i * in/out)."""
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def _apply_separable(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """x: [B, H, W, C] -> [B, H', W', C] via two weight-matrix contractions."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    wh = jnp.asarray(_linear_weights(h, oh))
    ww = jnp.asarray(_linear_weights(w, ow))
    x = jnp.einsum("ih,bhwc->biwc", wh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("jw,bhwc->bhjc", ww, x, preferred_element_type=jnp.float32)
    return x


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize (align_corners=False, no antialias).

    Args:
      x: [B, H, W, C] or [B, H, W].
      out_hw: target (H', W').
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    elif x.ndim != 4:
        raise ValueError(f"expected rank 3/4, got {x.ndim}")
    if x.shape[1:3] != tuple(out_hw):
        dtype = x.dtype
        x = _apply_separable(x.astype(jnp.float32), tuple(out_hw)).astype(dtype)
    return x[..., 0] if squeeze else x


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize (torch legacy 'nearest' index map)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    elif x.ndim != 4:
        raise ValueError(f"expected rank 3/4, got {x.ndim}")
    b, h, w, c = x.shape
    if (h, w) != tuple(out_hw):
        x = jnp.take(x, jnp.asarray(_nearest_indices(h, out_hw[0])), axis=1)
        x = jnp.take(x, jnp.asarray(_nearest_indices(w, out_hw[1])), axis=2)
    return x[..., 0] if squeeze else x


def resize_trilinear(x: jax.Array, out_dhw: tuple[int, int, int]) -> jax.Array:
    """Trilinear resize of a [B, D, H, W, C] volume (torch semantics,
    align_corners=False, no antialias) — PSMNet cost upsampling."""
    if x.ndim != 5:
        raise ValueError(f"expected rank 5, got {x.ndim}")
    b, d, h, w, c = x.shape
    od, oh, ow = out_dhw
    if (d, h, w) == (od, oh, ow):
        return x
    dtype = x.dtype
    x = x.astype(jnp.float32)
    wd = jnp.asarray(_linear_weights(d, od))
    wh = jnp.asarray(_linear_weights(h, oh))
    ww = jnp.asarray(_linear_weights(w, ow))
    x = jnp.einsum("id,bdhwc->bihwc", wd, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("jh,bdhwc->bdjwc", wh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("kw,bdhwc->bdhkc", ww, x, preferred_element_type=jnp.float32)
    return x.astype(dtype)


def upsample_disparity(disp: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear-upsample a disparity map and rescale its values.

    Disparities are horizontal pixel offsets, so resizing width by a factor
    s must multiply the values by s (the reference's upsample-x-rescale
    convention, `model.py:114-119`).

    Args:
      disp: [B, H, W] disparity.
      out_hw: target (H', W').
    """
    if disp.shape[1:] == tuple(out_hw):
        return disp
    scale = out_hw[1] / disp.shape[2]
    return resize_bilinear(disp, out_hw) * scale
