"""Soft-argmin disparity estimation.

Reference `/root/reference/nets/estimation.py:13-30`: softmax over the
disparity axis, then the expectation against candidates 0..D-1. When the
input is a matching *cost* (not a similarity) it is negated first.

Ours keeps D on the minor (lane) axis — softmax + expectation reduce over
lanes and fuse into one VPU pass under XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmin(cost: jax.Array, match_similarity: bool = True) -> jax.Array:
    """Expected disparity under softmax(cost).

    Args:
      cost: [B, H, W, D] similarity (or cost, if match_similarity=False).
    Returns:
      disparity [B, H, W], float32. (Always f32 — under a bf16 compute
      policy a bf16 disparity would quantise values near D=192 by ~0.75px.)
    """
    assert cost.ndim == 4
    d = cost.shape[-1]
    logits = cost if match_similarity else -cost
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    candidates = jnp.arange(d, dtype=jnp.float32)
    return jnp.sum(prob * candidates, axis=-1)
