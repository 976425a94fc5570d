"""Mixed-precision policy.

TPU MXUs run bfloat16 at twice the f32 rate and HBM traffic halves, so
inference and most of training want bf16 *compute* with f32 *parameters*
(the standard JAX mixed-precision recipe). The reference is f32-only CUDA
(`environment.yml`: pytorch 1.2 without AMP), so this is a TPU-native
extension, not a parity item.

A module-level compute dtype is consulted by every layer wrapper at trace
time. `AANet.__call__` installs the model's configured dtype for the
duration of the trace, so a single flag on the model flips the whole
network; parameters and BatchNorm statistics stay float32 (flax
`param_dtype` default), and numerically-sensitive ops (softmax/soft-argmin,
losses, metrics) explicitly compute in float32 regardless.
"""
from __future__ import annotations

import contextlib

import jax.numpy as jnp

_COMPUTE_DTYPE = None  # None => infer from inputs (flax default)


def set_compute_dtype(dtype):
    """Set the global compute dtype (None, jnp.float32, jnp.bfloat16)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def canonical_dtype(name):
    """'float32' | 'bfloat16' | None/'none' -> jnp dtype or None."""
    if name is None or name in ("none", ""):
        return None
    if isinstance(name, str):
        return jnp.dtype(name)
    return name


@contextlib.contextmanager
def precision(dtype):
    """Scoped compute-dtype override (used around model traces)."""
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev
