"""Space-to-depth (pixel-unshuffle) execution of small-channel convs.

Why: the refinement heads run 3x3 convs with 16-32 channels at (up to)
full image resolution (reference `nets/refinement.py:18-106`). On a TPU
the MXU contracts 128x128 tiles, so a C=32 conv uses a quarter of the
lanes in both contraction and output — measured 5.5 TF/s at
[384, 1248, 32] vs 39 TF/s at C=128 on the same chip (round-5
microbenchmark). Folding a 2x2 pixel block into channels
([B, H, W, C] -> [B, H/2, W/2, 4C]) and running an algebraically
EQUIVALENT conv with an expanded kernel quadruples the channel width and
keeps the MXU fed. The expansion costs extra zero-FLOPs (the expanded
kernel is 25% dense for dilation 1, block-diagonal for even dilations)
but nets ~2x wall-clock at C=32, more in bf16.

The transform is exact (same taps, same zero padding, f32 summation
order aside):

  out[2i+p, 2j+q] = sum_{a,b} W[a,b] . in[2i+p+a, 2j+q+b]

with p+a = 2*alpha + p' (alpha in {-1,0,1}, p' the source phase) turns a
dilation-1 3x3 conv into a 3x3 conv over phase-expanded channels, and a
dilation-2d conv into a phase-preserving (block-diagonal) dilation-d
conv. Only stride-1 convs are supported (all refinement convs are).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, f: int = 2) -> jax.Array:
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C]; channel order (pi, pj, c)."""
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(x: jax.Array, f: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    b, hh, ww, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(b, hh, ww, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * f, ww * f, c)


@functools.lru_cache(maxsize=None)
def _phase_map() -> np.ndarray:
    """M[a, p, alpha, q] = 1 iff p + (a-1) == 2*(alpha-1) + q,
    for tap index a in 0..2, phases p, q in {0, 1}, alpha in 0..2."""
    m = np.zeros((3, 2, 3, 2), np.float32)
    for a in range(3):
        for p in range(2):
            s = p + a - 1
            alpha, q = s // 2, s % 2
            m[a, p, alpha + 1, q] = 1.0
    return m


def expand_kernel_s2d(w: jax.Array, dilation: int):
    """Expand a [3, 3, Ci, Co] stride-1 conv kernel to s2d(2) space.

    Returns (kernel [3, 3, 4Ci, 4Co], s2d_dilation, s2d_padding) such
    that conv(x, w, dilation, padding=dilation) at full resolution equals
    depth_to_space(conv(space_to_depth(x), kernel, s2d_dilation,
    s2d_padding)).
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    if dilation % 2 == 0:
        # even dilation: phases never mix; block-diagonal expansion
        eye = jnp.eye(2, dtype=w.dtype)
        k = jnp.einsum("abcf,qp,QP->abqQcpPf", w, eye, eye)
        d = dilation // 2
    else:
        assert dilation == 1, dilation  # general odd not needed
        m = jnp.asarray(_phase_map(), w.dtype)
        # K[alpha,beta,qi,qj,ci,pi,pj,co] = sum_{a,b} M[a,pi,alpha,qi] *
        #                                   M[b,pj,beta,qj] * w[a,b,ci,co]
        k = jnp.einsum("apAq,bPBQ,abcf->ABqQcpPf", m, m, w)
        d = 1
    k = k.reshape(3, 3, 4 * ci, 4 * co)
    return k, d, d


def conv_s2d(x: jax.Array, w: jax.Array, bias, dilation: int) -> jax.Array:
    """Apply a canonical [3,3,Ci,Co] stride-1 'same' dilated conv to an
    s2d(2)-layout input [B, H/2, W/2, 4Ci]. Returns [B, H/2, W/2, 4Co]."""
    k, d, p = expand_kernel_s2d(w.astype(x.dtype), dilation)
    out = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=[(p, p), (p, p)],
        rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), 4)
    return out
