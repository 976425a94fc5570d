"""Intra-sample spatial sharding over the 'model' mesh axis.

The reference has no analog: its only parallelism is data-parallel DDP
(`train.py:113-123`). On TPU, the memory-pressure case the reference
cannot address — a single very-high-resolution pair whose cost-volume
pyramid and full-res refinement activations exceed one chip's HBM — is
handled by sharding the *width* dimension of the stereo pair over the
mesh's 'model' axis (SURVEY §5 "long-context analog").

TPU-first design: no manual halo code. Inputs carry a
``P('data', None, 'model', None)`` sharding, the whole forward runs under
one global-view jit, and XLA's SPMD partitioner inserts the halo
exchanges for every conv / the band all-gathers for the correlation
cost volume (which compares column w with columns [w-D, w]) as
collective-permutes over ICI. Width is the right axis to cut: stereo
disparity is a horizontal correspondence, so H-sharding would make every
cost-volume band cross-device instead of only the D-pixel left halo.

Numerics are IDENTICAL to the unsharded forward (same XLA program
semantics, only partitioned) — asserted by `tests/test_spatial.py`.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC images: batch over 'data', width over 'model'."""
    return NamedSharding(mesh, P("data", None, "model", None))


def make_spatial_forward(model, mesh: Mesh, train: bool = False):
    """Jit the model forward with batch x width sharding over the mesh.

    Returns ``fwd(variables, left, right) -> disparity pyramid`` with
    replicated (fully addressable) outputs. `variables` are replicated;
    activations inherit the width sharding by propagation.
    """
    rep = NamedSharding(mesh, P())
    img = image_sharding(mesh)

    def fwd(variables, left, right):
        return model.apply(variables, left, right, train=train)

    return jax.jit(
        fwd, in_shardings=(rep, img, img), out_shardings=rep
    )


def shard_images(batch: dict, mesh: Mesh) -> dict:
    """Place left/right (and any other NHWC array) with width sharding;
    per-batch arrays over 'data'; anything that cannot legally carry a
    'data' spec (scalars, leading dims not divisible by the data axis)
    is replicated rather than raising mid-pipeline."""
    img = image_sharding(mesh)
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    data_size = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "shape"):
            out[k] = v
        elif (
            getattr(v, "ndim", 0) == 4
            and v.shape[2] % mesh.shape["model"] == 0
            and v.shape[0] % data_size == 0
        ):
            out[k] = jax.device_put(v, img)
        elif getattr(v, "ndim", 0) >= 1 and v.shape[0] % data_size == 0:
            out[k] = jax.device_put(v, dp)
        else:
            out[k] = jax.device_put(v, rep)
    return out
