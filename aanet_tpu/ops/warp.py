"""Backward warping of the right image by disparity.

Reference `/root/reference/nets/warp.py:41-64`: build a meshgrid, subtract
the disparity from x, bilinear `grid_sample` with border padding
(align_corners=True <=> plain pixel coordinates), and a validity mask from
sampling an all-ones image with zero padding, thresholded at 0.9999.

The warp is purely horizontal, so this implementation works directly in
pixel space with a 1-D gather along W — no normalized grids.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def disp_warp(
    img: jax.Array, disp: jax.Array, padding_mode: str = "border"
) -> tuple[jax.Array, jax.Array]:
    """Warp `img` (right view) to the left view using `disp`.

    Args:
      img: [B, H, W, C].
      disp: [B, H, W] non-negative disparity (pixels).
      padding_mode: 'border' or 'zeros' for out-of-image samples.
    Returns:
      (warped [B, H, W, C], valid_mask [B, H, W, 1] in {0, 1}).
    """
    b, h, w, c = img.shape
    x = jnp.arange(w, dtype=jnp.float32)[None, None, :] - disp.astype(jnp.float32)

    # Border clamp for the image sample; validity from the raw position.
    xc = jnp.clip(x, 0.0, w - 1.0)
    x0 = jnp.clip(jnp.floor(xc), 0, w - 2).astype(jnp.int32)
    t = xc - x0.astype(jnp.float32)  # [B, H, W]

    # ONE flat-table row-gather of [img[x0], img[x0+1]] pairs instead of
    # two take_along_axis calls on the [B, H, W, C] operand: the 4-D
    # gather with C=3 rows takes XLA's generic slow path (~9 ns/sample —
    # measured 6.3 ms at 384x1248), the flat 2-D row lookup ~3 ns.
    pair = jnp.concatenate([img, jnp.roll(img, -1, axis=2)], axis=-1)
    table = pair.reshape(b * h * w, 2 * c)
    row_base = (
        jnp.arange(b, dtype=jnp.int32)[:, None, None] * h
        + jnp.arange(h, dtype=jnp.int32)[None, :, None]
    ) * w
    v = jnp.take(table, (row_base + x0).reshape(-1), axis=0).reshape(
        b, h, w, 2 * c
    )
    # x0 <= w-2, so the rolled column (img[x0+1]) is always in-image and
    # the roll's wrap-around row x = w-1 is never read.
    warped = v[..., :c] * (1.0 - t[..., None]) + v[..., c:] * t[..., None]

    # Validity: bilinear sample of an all-ones image with zero padding.
    xf = jnp.floor(x)
    tf = x - xf
    in0 = (xf >= 0) & (xf <= w - 1)
    in1 = (xf + 1 >= 0) & (xf + 1 <= w - 1)
    cover = jnp.where(in0, 1.0 - tf, 0.0) + jnp.where(in1, tf, 0.0)
    valid = (cover >= 0.9999).astype(img.dtype)[..., None]

    if padding_mode == "zeros":
        warped = warped * valid
    elif padding_mode != "border":
        raise ValueError(padding_mode)
    return warped.astype(img.dtype), valid
