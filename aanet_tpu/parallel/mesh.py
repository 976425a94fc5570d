"""Mesh construction and sharding rules.

The reference's only parallelism is single-node data-parallel DDP over
NCCL (`train.py:113-123,188-191`, `dataloader/dataloader.py:173`). The
TPU-native replacement is a `jax.sharding.Mesh` with a `data` axis: the
global batch is sharded over it, parameters are replicated, and a single
global-view jit makes XLA insert the gradient all-reduce and the
cross-replica BN statistics reductions (SyncBatchNorm) automatically over
ICI/DCN. Multi-host extends this by calling `jax.distributed.initialize`
before mesh construction — no backend plumbing in user code.

A second `model` axis carries optional intra-sample width sharding of
the cost-volume pyramid / refinement (SURVEY §5) — see
`aanet_tpu.parallel.spatial`.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """Create a ('data', 'model') mesh; data defaults to all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    n = data * model
    assert n <= len(devices), (data, model, len(devices))
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def auto_data_size(batch_size: int, n_devices: Optional[int] = None) -> int:
    """Largest divisor of batch_size that is <= n_devices — the usable
    data-parallel degree for this batch."""
    import math

    n = n_devices if n_devices is not None else len(jax.devices())
    d = math.gcd(batch_size, n)
    # gcd may undershoot (e.g. batch 6, 4 devices -> 2); prefer the
    # largest divisor of batch_size not exceeding n.
    for cand in range(min(batch_size, n), 0, -1):
        if batch_size % cand == 0:
            return cand
    return d


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a dict of [B, ...] arrays with B sharded over 'data'.
    Non-array values (e.g. filename lists) pass through untouched.

    Multi-process: each host passes its LOCAL shard of the global batch
    (what `make_train_loader` yields) and the global array is assembled
    across hosts — the multi-host analog of the reference's per-process
    DistributedSampler batches (`dataloader/dataloader.py:173,180`)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            if hasattr(v, "shape")
            else v
            for k, v in batch.items()
        }
    return {
        k: jax.device_put(v, sh) if hasattr(v, "shape") else v
        for k, v in batch.items()
    }


def pad_batch(batch: dict, batch_size: int) -> dict:
    """Pad dim 0 to `batch_size` and add a 'sample_valid' flag array —
    keeps eval shapes static (one XLA program) for ragged final batches."""
    first = next(v for v in batch.values() if hasattr(v, "shape"))
    b = first.shape[0]
    out = {}
    valid = np.zeros((batch_size,), np.float32)
    valid[:b] = 1.0
    for k, v in batch.items():
        if hasattr(v, "shape"):
            if v.shape[0] < batch_size:
                pads = [(0, batch_size - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
                v = np.pad(np.asarray(v), pads)
            out[k] = v
        else:
            out[k] = v
    out["sample_valid"] = valid
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
