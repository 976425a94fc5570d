"""Stereo cost-volume construction.

Reference semantics (`/root/reference/nets/cost.py:19-76`): for left/right
feature maps and a disparity budget D, the cost at pixel (h, w) and
candidate d compares L[..., w] with R[..., w-d]; positions with w < d are
zero-filled.

TPU-first design: instead of the reference's Python loop over D writing
strided slices, the correlation volume is computed as a *banded matmul*:

  M[w, v] = sum_c L[w, c] * R[v, c]           (an MXU contraction)
  cost[w, d] = M[w, w - d] / C                (a band of M)

W is tiled; for a tile of tW output columns only the band [w0-D, w0+tW) of
R is needed, so the contraction is [tW, C] x [C, tW+D] per (b, h, tile).
The diagonal band is then extracted with a static "skew reshape" (pad one
element per row, reflatten) — no gather, no dynamic indexing:

  flat[i*(L0+1) + j] == M[i, i+j]   where L0 = tW + D

Layouts are NHWC: features [B, H, W, C], correlation cost [B, H, W, D]
(D on the minor axis so downstream softmax / soft-argmin reduce over
lanes), 4D difference/concat volumes [B, D, H, W, C] (NDHWC for 3D convs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Correlation (3D) cost volume
# ---------------------------------------------------------------------------


def correlation_cost_volume_reference(
    left: jax.Array, right: jax.Array, max_disp: int
) -> jax.Array:
    """Naive shift-multiply correlation volume (reference semantics).

    cost[b, h, w, d] = mean_c left[b,h,w,c] * right[b,h,w-d,c], 0 if w < d.
    Mirrors `nets/cost.py:40-48` of the reference (layout transposed).
    """
    b, h, w, c = left.shape
    slices = []
    prod = left * right
    slices.append(jnp.mean(prod, axis=-1))
    for d in range(1, max_disp):
        corr = jnp.mean(left[:, :, d:, :] * right[:, :, :-d, :], axis=-1)
        corr = jnp.pad(corr, ((0, 0), (0, 0), (d, 0)))
        slices.append(corr)
    return jnp.stack(slices, axis=-1)  # [B, H, W, D]


def _skew_band_extract(m: jax.Array, max_disp: int) -> jax.Array:
    """Extract cost[i, d] = m[..., i, i + D - d] via a static skew reshape.

    m: [..., tW, tW + D]; returns [..., tW, D]. Pure pad/reshape/slice —
    compiles to relayouts, no gather.
    """
    *lead, tw, l0 = m.shape
    d = max_disp
    assert l0 == tw + d, (tw, l0, d)
    flat = m.reshape(*lead, tw * l0)
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, tw)])
    skew = flat.reshape(*lead, tw, l0 + 1)
    # skew[..., i, j] == m[..., i, i + j] for i + j < L0.
    band = skew[..., 1 : d + 1]  # j = 1..D  <=>  d = D-1..0
    return band[..., ::-1]


def correlation_cost_volume(
    left: jax.Array,
    right: jax.Array,
    max_disp: int,
    *,
    tile_w: int = 128,
) -> jax.Array:
    """Banded-matmul correlation cost volume (MXU formulation).

    Equivalent to :func:`correlation_cost_volume_reference`; W is tiled and
    each tile is one [tW, C] x [C, tW+D] contraction per (b, h).
    """
    b, h, w, c = left.shape
    d = max_disp
    tw = min(tile_w, max(8, w))
    tw = max(tw, d)  # the D-tail of a window must fit in one tile
    n_tiles = -(-w // tw)
    w_pad = n_tiles * tw

    lpad = jnp.pad(left, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    # Left-pad right features by D so that zero-fill of the w < d region
    # (reference `nets/cost.py:41`) falls out of the zero padding; pad the
    # right end far enough for the shifted reshape below.
    rpad = jnp.pad(right, ((0, 0), (0, 0), (d, w_pad - w + tw - d), (0, 0)))

    l_tiles = lpad.reshape(b, h, n_tiles, tw, c)
    # Window for tile t covers original columns [t*tW - D, t*tW + tW), i.e.
    # padded columns [t*tW, t*tW + tW + D). Built from two aligned reshapes:
    # head tile [t*tW, t*tW+tW) plus the first D of the next-aligned tile.
    r_head = rpad[:, :, :w_pad, :].reshape(b, h, n_tiles, tw, c)
    r_tail = rpad[:, :, tw : tw + w_pad, :].reshape(b, h, n_tiles, tw, c)[
        ..., :d, :
    ]
    r_win = jnp.concatenate([r_head, r_tail], axis=-2)  # [B,H,T,tW+D,C]

    m = jnp.einsum(
        "bhtic,bhtjc->bhtij", l_tiles, r_win, preferred_element_type=jnp.float32
    )
    # m[i, j] = L[w0+i] . R[w0+j-D]  => cost[i, d] = m[i, i + D - d]
    cost = _skew_band_extract(m, d) / c
    cost = cost.reshape(b, h, w_pad, d)[:, :, :w, :]
    return cost.astype(left.dtype)


# ---------------------------------------------------------------------------
# Difference / concat (4D) cost volumes — ablation paths
# ---------------------------------------------------------------------------


def _shifted_right(right: jax.Array, d: int) -> jax.Array:
    if d == 0:
        return right
    return jnp.pad(right[:, :, :-d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))


def difference_cost_volume(
    left: jax.Array, right: jax.Array, max_disp: int
) -> jax.Array:
    """cost[b,d,h,w,c] = L - R_shifted, zeroed where w < d.

    Reference `nets/cost.py:22-29` (layout [B,C,D,H,W] -> ours NDHWC).
    """
    b, h, w, c = left.shape
    wcoord = jnp.arange(w)
    vols = []
    for d in range(max_disp):
        diff = left - _shifted_right(right, d)
        valid = (wcoord >= d)[None, None, :, None]
        vols.append(jnp.where(valid, diff, 0.0))
    return jnp.stack(vols, axis=1)  # [B, D, H, W, C]


def concat_cost_volume(
    left: jax.Array, right: jax.Array, max_disp: int
) -> jax.Array:
    """cost[b,d,h,w,:] = concat(L, R_shifted), zeroed where w < d.

    Reference `nets/cost.py:31-38`; channels 2C.
    """
    b, h, w, c = left.shape
    wcoord = jnp.arange(w)
    vols = []
    for d in range(max_disp):
        cat = jnp.concatenate([left, _shifted_right(right, d)], axis=-1)
        valid = (wcoord >= d)[None, None, :, None]
        vols.append(jnp.where(valid, cat, 0.0))
    return jnp.stack(vols, axis=1)  # [B, D, H, W, 2C]


def cost_volume(
    left: jax.Array,
    right: jax.Array,
    max_disp: int,
    feature_similarity: str = "correlation",
) -> jax.Array:
    """Dispatch on similarity type (reference `nets/cost.py:19-55`)."""
    if feature_similarity == "correlation":
        return correlation_cost_volume(left, right, max_disp)
    if feature_similarity == "difference":
        return difference_cost_volume(left, right, max_disp)
    if feature_similarity == "concat":
        return concat_cost_volume(left, right, max_disp)
    raise NotImplementedError(feature_similarity)


def cost_volume_pyramid(
    left_pyramid,
    right_pyramid,
    max_disp: int,
    feature_similarity: str = "correlation",
):
    """Per-scale volumes with D halved per level (`nets/cost.py:58-76`)."""
    out = []
    for s, (lf, rf) in enumerate(zip(left_pyramid, right_pyramid)):
        out.append(cost_volume(lf, rf, max_disp // (2**s), feature_similarity))
    return out
