"""Host-side input pipeline: epoch-seeded shuffling, per-host sharding,
threaded prefetch, batching.

Replaces the reference's `DataLoader(num_workers=8) + DistributedSampler`
(`dataloader/dataloader.py:147-205`): each host loads only its shard of
the *global* batch (shard by `jax.process_index()`), samples are decoded
and augmented by a thread pool, and batches are prefetched ahead of the
training step. `set_epoch` determinism comes from seeding the shuffle
with (seed, epoch) (`train.py:259-260`).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


def _collate(samples) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals  # e.g. left_name strings
    return out


class _Prefetcher:
    """Iterate batches on a background thread with a bounded queue."""

    def __init__(self, gen, depth: int = 2, length: Optional[int] = None):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.done = object()
        self.err: Optional[BaseException] = None
        self._length = length

        def worker():
            try:
                for item in gen:
                    self.q.put(item)
            except BaseException as e:  # propagate into the consumer
                self.err = e
            finally:
                self.q.put(self.done)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __len__(self):
        if self._length is None:
            raise TypeError("loader length unknown")
        return self._length

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self.done:
                if self.err is not None:
                    raise self.err
                return
            yield item


def _batches(
    dataset,
    indices: np.ndarray,
    batch_size: int,
    num_workers: int,
    seed: int,
    drop_last: bool,
) -> Iterator[Dict[str, np.ndarray]]:
    n = len(indices)
    usable = (n // batch_size) * batch_size if drop_last else n
    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for start in range(0, usable, batch_size):
            chunk = indices[start : start + batch_size]
            rngs = [np.random.default_rng((seed, int(i))) for i in chunk]
            samples = list(pool.map(dataset.load, chunk, rngs))
            yield _collate(samples)


def make_train_loader(
    dataset,
    global_batch_size: int,
    epoch: int,
    seed: int = 326,
    num_workers: int = 8,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    prefetch: int = 2,
):
    """Shuffled, host-sharded, drop-last train batches for one epoch.

    Each host yields [global_batch_size // process_count, ...] arrays;
    under a single-process mesh that is the full global batch.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch_size % pc == 0, (global_batch_size, pc)
    local_bs = global_batch_size // pc

    rng = np.random.default_rng((seed, epoch))
    order = rng.permutation(len(dataset))
    # pad to a multiple of pc so every host sees the same #samples
    if len(order) % pc:
        order = np.concatenate([order, order[: pc - len(order) % pc]])
    shard = order[pi::pc]

    gen = _batches(
        dataset, shard, local_bs, num_workers, seed=seed * 1000 + epoch,
        drop_last=True,
    )
    return _Prefetcher(gen, depth=prefetch, length=len(shard) // local_bs)


def make_val_loader(
    dataset,
    batch_size: int,
    num_workers: int = 8,
    prefetch: int = 2,
):
    """Sequential validation/test batches (no shuffle, keep remainder)."""
    indices = np.arange(len(dataset))
    gen = _batches(dataset, indices, batch_size, num_workers, seed=0, drop_last=False)
    n_batches = (len(dataset) + batch_size - 1) // batch_size
    return _Prefetcher(gen, depth=prefetch, length=n_batches)
