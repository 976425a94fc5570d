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

    Returns [B, (H+2)*(W+2), G, 4*Cg] where flat position (i, j) on the
    padded grid (i = y+1, j = x+1) holds the four corners
    [x(y,x), x(y,x+1), x(y+1,x), x(y+1,x+1)] — out-of-image corners are
    exact zeros (the reference's zero-pad sampling,
    `deform_conv_cuda_kernel.cu:85-116`).

    One bilinear sample then needs ONE dynamic gather of 4*Cg instead of
    four masked gathers of Cg: 4x fewer index computations, no `where`
    masks at all (the pad rows/cols carry the zeros), and the clipped
    fractional weights (see caller) handle far-outside samples for free.
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
    return patches.reshape(b, hp * wp, g, 4 * cg)


def _bilinear_gather_grouped(
    patches: jax.Array,  # [B, (H+2)*(W+2), G, 4*Cg] from _make_patches
    py: jax.Array,  # [B, Ho, Wo, G] float sample rows
    px: jax.Array,  # [B, Ho, Wo, G] float sample cols
    h: int,
    w: int,
) -> jax.Array:
    """Zero-padded bilinear sample per deformable group.

    Returns [B, Ho, Wo, G, Cg]. Coordinates are f32 (bf16's 8-bit mantissa
    would quantise positions by ~1px at W~1000); values stay in the
    compute dtype.
    """
    b, ho, wo, g = py.shape
    cg = patches.shape[-1] // 4
    vdtype = patches.dtype

    # Clamp the anchor into the padded grid and the fractional weights to
    # [0, 1]: inside the image this is exact; far-outside samples either
    # land on all-zero pad rows (py > h) or get zero weight (py < -1).
    y0 = jnp.clip(jnp.floor(py), -1.0, float(h))
    x0 = jnp.clip(jnp.floor(px), -1.0, float(w))
    ty = jnp.clip(py - y0, 0.0, 1.0).astype(vdtype)
    tx = jnp.clip(px - x0, 0.0, 1.0).astype(vdtype)

    wp = w + 2
    idx = ((y0 + 1.0) * wp + (x0 + 1.0)).astype(jnp.int32)
    vals = jnp.take_along_axis(
        patches, idx.reshape(b, ho * wo, g, 1), axis=1
    ).reshape(b, ho, wo, g, 4, cg)

    # Explicit 4-corner fused multiply-add, NOT an einsum: a k=4
    # dot-general takes a slow non-MXU path (measured: bf16 aggregation
    # 0.66 ms vs 0.45 ms f32 in round 3, docs/PERF_r03.md); elementwise
    # FMAs fuse on the VPU in any dtype. ty/tx are already in vdtype.
    ty = ty[..., None]
    tx = tx[..., None]
    top = vals[..., 0, :] + tx * (vals[..., 1, :] - vals[..., 0, :])
    bot = vals[..., 2, :] + tx * (vals[..., 3, :] - vals[..., 2, :])
    return top + ty * (bot - top)


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

    patches = _make_patches(x, g)
    w_taps = weight.reshape(k2, g, cg, cout).astype(vdtype)

    out = jnp.zeros((b, ho, wo, cout), dtype=jnp.float32)
    for k in range(k2):
        ki, kj = divmod(k, kw)
        py = base_y[None, :, :, None] + ki * dilation + offset[..., k, 0]
        px = base_x[None, :, :, None] + kj * dilation + offset[..., k, 1]
        val = _bilinear_gather_grouped(patches, py, px, h, w)  # [B,Ho,Wo,G,Cg]
        if mask is not None:
            val = val * mask[..., k, None]
        out = out + jnp.einsum(
            "bhwgc,gcf->bhwf", val, w_taps[k], preferred_element_type=jnp.float32
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
