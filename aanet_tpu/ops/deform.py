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


def _bilinear_gather_grouped(
    x_flat: jax.Array,  # [B, H*W, G, Cg]
    py: jax.Array,  # [B, Ho, Wo, G] float sample rows
    px: jax.Array,  # [B, Ho, Wo, G] float sample cols
    h: int,
    w: int,
) -> jax.Array:
    """Zero-padded bilinear sample per deformable group.

    Returns [B, Ho, Wo, G, Cg].
    """
    b, ho, wo, g = py.shape
    cg = x_flat.shape[-1]
    vdtype = x_flat.dtype  # gather + blend in the compute dtype (bf16-safe:
    # only the *values* are low precision; coordinates stay f32)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ty = py - y0
    tx = px - x0

    out = jnp.zeros((b, ho, wo, g, cg), dtype=vdtype)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        wgt = (ty if dy else (1.0 - ty)) * (tx if dx else (1.0 - tx))
        inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat_idx = (yi * w + xi).reshape(b, ho * wo, g, 1)
        vals = jnp.take_along_axis(x_flat, flat_idx, axis=1)
        vals = vals.reshape(b, ho, wo, g, cg)
        wgt = jnp.where(inb, wgt, 0.0).astype(vdtype)
        out = out + vals * wgt[..., None]
    return out


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

    x_flat = x.reshape(b, h * w, g, cg)
    w_taps = weight.reshape(k2, g, cg, cout).astype(vdtype)

    out = jnp.zeros((b, ho, wo, cout), dtype=jnp.float32)
    for k in range(k2):
        ki, kj = divmod(k, kw)
        py = base_y[None, :, :, None] + ki * dilation + offset[..., k, 0]
        px = base_x[None, :, :, None] + kj * dilation + offset[..., k, 1]
        val = _bilinear_gather_grouped(x_flat, py, px, h, w)  # [B,Ho,Wo,G,Cg]
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
