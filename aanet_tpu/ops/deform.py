"""(Modulated) deformable 2-D convolution, TPU-native.

The reference implements this as a hand-written CUDA extension
(`/root/reference/nets/deform_conv/src/deform_conv_cuda.cpp:152-699` and
`deform_conv_cuda_kernel.cu`): deformable im2col into a column buffer, a
grouped GEMM, and atomicAdd scatter kernels for the backward.

TPU-first design: for each of the K*K kernel taps (static unroll), the
input is bilinearly *gathered* at `p + p_k*dilation + delta_p_k` with
zero-padding semantics (out-of-image corners contribute 0, matching the
CUDA `deformable_im2col_bilinear`), modulated by `m_k`, and contracted
against that tap's weight slice on the MXU. The backward needs no custom
kernel: XLA transposes the gather into a scatter-add — the same
computation the CUDA `col2im`/`col2im_coord` atomicAdd kernels perform.

Offset layout (our choice — training is from scratch, only the zero-init
behaviour must match): offset[..., g, k, 0] = dy, [..., g, k, 1] = dx with
k = ki * kw + kj, g the deformable group. At zero offsets and unit mask
the op is exactly a regular dilated conv (reference `nets/deform.py:74-76`
zero-init guarantee, used as the correctness anchor in tests).

Layouts: x [B, H, W, Cin], weight [Kh, Kw, Cin, Cout] (HWIO).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _out_size(size: int, k: int, stride: int, pad: int, dil: int) -> int:
    eff = dil * (k - 1) + 1
    return (size + 2 * pad - eff) // stride + 1


def _make_patches(x: jax.Array, g: int) -> jax.Array:
    """Precompute the 2x2 neighbour patches over a zero-padded grid.

    Returns [B*G*(H+2)*(W+2), 4*Cg] where (for batch b, group g) flat
    position (i, j) on the padded grid (i = y+1, j = x+1) holds the four
    corners [x(y,x), x(y,x+1), x(y+1,x), x(y+1,x+1)] — out-of-image
    corners are exact zeros (the reference's zero-pad sampling,
    `deform_conv_cuda_kernel.cu:85-116`).

    One bilinear sample then needs ONE dynamic gather of 4*Cg instead of
    four masked gathers of Cg: 4x fewer index computations, no `where`
    masks at all (the pad rows/cols carry the zeros), and the clipped
    fractional weights (see caller) handle far-outside samples for free.

    The table is FLAT 2-D on purpose: on TPU, `jnp.take(table_2d, idx_1d,
    axis=0)` lowers to a row-gather at ~2.4-3.5 ns/index, while the same
    gather phrased as `take_along_axis` on a [B, P, G, 4Cg] operand takes
    the generic path at ~9 ns/index — a measured ~3x difference at any
    table size (round-5 microbenchmark with reduction-forced consumers;
    the gather is index-rate-bound, not bandwidth-bound).
    """
    b, h, w, c = x.shape
    cg = c // g
    # pad (1 before, 2 after): patch grid positions i in [-1, h] need
    # rows y in [-1, h+1] => h+3 padded rows.
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    hp, wp = h + 2, w + 2
    corners = [
        xp[:, :hp, :wp], xp[:, :hp, 1 : wp + 1],
        xp[:, 1 : hp + 1, :wp], xp[:, 1 : hp + 1, 1 : wp + 1],
    ]
    patches = jnp.concatenate(
        [p.reshape(b, hp, wp, g, cg) for p in corners], axis=-1
    )
    # [B, Hp, Wp, G, 4Cg] -> [B, G, Hp*Wp, 4Cg] -> flat rows
    patches = patches.reshape(b, hp * wp, g, 4 * cg).transpose(0, 2, 1, 3)
    return patches.reshape(b * g * hp * wp, 4 * cg)


def _sample_coords(py: jax.Array, px: jax.Array, h: int, w: int, b: int,
                   g: int):
    """Flat-table row indices + bilinear corner weights for sample points.

    py/px: [B, Ho, Wo, G, K2] f32 coordinates (coordinates are ALWAYS f32
    — bf16's 8-bit mantissa would quantise positions by ~1px at W~1000).
    Returns (idx int32 same shape, cw [..., 4] f32).

    Clamp the anchor into the padded grid and the fractional weights to
    [0, 1]: inside the image this is exact; far-outside samples either
    land on all-zero pad rows (py > h) or get zero weight (py < -1).
    """
    y0 = jnp.clip(jnp.floor(py), -1.0, float(h))
    x0 = jnp.clip(jnp.floor(px), -1.0, float(w))
    ty = jnp.clip(py - y0, 0.0, 1.0)
    tx = jnp.clip(px - x0, 0.0, 1.0)

    hp, wp = h + 2, w + 2
    idx = ((y0 + 1.0) * wp + (x0 + 1.0)).astype(jnp.int32)
    # Per-(batch, group) row offset into the flat table; index order
    # (b, ho, wo, g, k) matches the gather-output layout so no transpose
    # is needed after the gather.
    base = (
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None, None] * g
        + jnp.arange(g, dtype=jnp.int32)[None, None, None, :, None]
    ) * (hp * wp)
    cw = jnp.stack(
        [
            (1.0 - ty) * (1.0 - tx),
            (1.0 - ty) * tx,
            ty * (1.0 - tx),
            ty * tx,
        ],
        axis=-1,
    )  # [B, Ho, Wo, G, K2, 4]
    return idx + base, cw


def modulated_deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array | None,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Modulated deformable conv (DCNv2 semantics, zero-pad sampling).

    Args:
      x: [B, H, W, Cin].
      offset: [B, Ho, Wo, G*K2*2] with layout (g, k, (dy, dx)).
      mask: [B, Ho, Wo, G*K2] modulation (already in [0, 2]); None => 1.
      weight: [Kh, Kw, Cin, Cout].
      bias: [Cout] or None.
    Returns:
      [B, Ho, Wo, Cout].
    """
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    assert wcin == cin, (wcin, cin)
    g = deformable_groups
    assert cin % g == 0
    cg = cin // g
    k2 = kh * kw

    ho = _out_size(h, kh, stride, padding, dilation)
    wo = _out_size(w, kw, stride, padding, dilation)

    vdtype = x.dtype
    # Sample COORDINATES always in f32 (bf16's 8-bit mantissa would quantise
    # positions by up to ~1px at W~1000); sampled VALUES in the compute dtype.
    offset = offset.reshape(b, ho, wo, g, k2, 2).astype(jnp.float32)
    if mask is not None:
        mask = mask.reshape(b, ho, wo, g, k2).astype(vdtype)

    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)[:, None]
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)[None, :]
    ky = (jnp.arange(kh, dtype=jnp.float32) * dilation).repeat(kw)
    kx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)
    py = base_y[None, :, :, None, None] + ky + offset[..., 0]  # [B,Ho,Wo,G,K2]
    px = base_x[None, :, :, None, None] + kx + offset[..., 1]
    idx, cw = _sample_coords(py, px, h, w, b, g)
    if mask is not None:
        cw = cw * mask[..., None].astype(jnp.float32)
    cw = cw.astype(vdtype)

    # Flat row-gathers (958k 512-byte rows at the flagship's scale-0 ISA
    # shape — index-rate bound at ~3.5 ns/row; the same gather phrased
    # as take_along_axis on a 4-D operand costs ~9 ns/row). The bilinear
    # blend and modulation ride INSIDE the matmul: rows are scaled by
    # lane-replicated corner weights and contracted over 4*Cg(*taps) —
    # the gathered rows are never split along the lane dim (a (4, Cg)
    # reshape + corner slicing costs a full cross-lane relayout,
    # measured +15 ms per conv).
    #
    # One gather for ALL taps + one K=K2*4*Cg contraction is fastest at
    # inference scale (9.2 vs 10.2 ms at scale-0), but it materializes
    # a [B, Ho, Wo, G, K2, 4*Cg] tensor — multi-GB at training batches
    # or full-resolution deform layers (AANet+ hourglass refinement),
    # which blows HBM traffic and crashes the remote compile helper.
    # Above a byte cap, stream per tap instead (9 gathers, 9 K=4*Cg
    # contractions, one-ninth the live memory).
    # The contraction runs at HIGHEST precision: the bilinear corner
    # weights ride inside it, and default (bf16-input) MXU rounding of
    # the weighted rows quantises sub-pixel sampling — the offset-conv
    # gradients come back through this product, and 8-bit-mantissa noise
    # there visibly degrades deformable-offset learning. For bf16
    # compute the inputs are already bf16, so this only affects f32.
    patches = _make_patches(x, g)
    w_taps = jnp.tile(
        weight.reshape(1, k2, g, cg, cout), (4, 1, 1, 1, 1)
    ).transpose(1, 2, 0, 3, 4).reshape(k2, g, 4 * cg, cout).astype(vdtype)

    vals_bytes = b * ho * wo * g * k2 * 4 * cg * jnp.dtype(vdtype).itemsize
    if vals_bytes <= 512 * 1024 * 1024:
        vals = jnp.take(patches, idx.reshape(-1), axis=0).reshape(
            b, ho, wo, g, k2, 4 * cg
        )
        cwx = jnp.broadcast_to(cw[..., None], (*cw.shape, cg)).reshape(
            b, ho, wo, g, k2, 4 * cg
        )
        out = jnp.einsum(
            "bhwgkz,kgzf->bhwf",
            vals * cwx,
            w_taps,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        out = jnp.zeros((b, ho, wo, cout), jnp.float32)
        for k in range(k2):
            vals = jnp.take(
                patches, idx[..., k].reshape(-1), axis=0
            ).reshape(b, ho, wo, g, 4 * cg)
            cwk = cw[..., k, :]
            cwx = jnp.broadcast_to(cwk[..., None], (*cwk.shape, cg)).reshape(
                b, ho, wo, g, 4 * cg
            )
            out = out + jnp.einsum(
                "bhwgz,gzf->bhwf",
                vals * cwx,
                w_taps[k],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(vdtype)


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Non-modulated deformable conv (DCNv1; reference `DeformConv`)."""
    return modulated_deform_conv2d(
        x,
        offset,
        None,
        weight,
        bias,
        stride=stride,
        padding=padding,
        dilation=dilation,
        deformable_groups=deformable_groups,
    )
