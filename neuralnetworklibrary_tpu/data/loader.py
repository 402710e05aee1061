"""Host-side data loading with static batch shapes.

The reference uses torch DataLoaders with worker processes and lets the last
minibatch of an epoch be short (Learner.py:503-505 rescales lr for it).  XLA
compiles one program per input shape, so the TPU-native loader instead:

- always emits batches of exactly ``bs`` rows, padding the final short batch by
  repeating its last valid row, together with a float mask and the valid count
  (losses are mask-aware, see core.metrics; the Learner rescales lr by
  ``n_valid/bs`` to reproduce the reference's last-batch semantics),
- shuffles with a seeded ``np.random.Generator`` re-keyed per epoch —
  deterministic input order, the property the reference's num_workers=1
  workaround was protecting (SURVEY §5 'race detection'),
- prefetches batches on a background thread so host collation overlaps device
  compute (the analogue of pin_memory + worker processes).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


@dataclass
class Batch:
    """One fixed-shape minibatch: ``xs`` is always a tuple of arrays."""

    xs: tuple
    y: Any
    mask: np.ndarray  # (bs,) float32, 1 for valid rows
    n_valid: int


class ArrayDataset:
    """Dataset over pre-built arrays: item i is ``(arrays[0][i], ..., arrays[-1][i])``.
    The last array is the target; the rest are inputs."""

    def __init__(self, *arrays):
        if not arrays:
            raise ValueError("need at least one array")
        n = len(arrays[0])
        if any(len(a) != n for a in arrays):
            raise ValueError("all arrays must have equal length")
        self.arrays = arrays

    def __len__(self):
        return len(self.arrays[0])

    def __getitem__(self, idx):
        return tuple(a[idx] for a in self.arrays)


def default_collate(samples: Sequence[tuple]) -> tuple:
    """Stack a list of per-sample tuples into a tuple of batched arrays."""
    n_fields = len(samples[0])
    return tuple(np.stack([s[i] for s in samples]) for i in range(n_fields))


class DataLoader:
    """Minibatch iterator over a dataset of (x..., y) tuples.

    Every batch has exactly ``bs`` rows (final short batch padded + masked).
    ``len()`` is the number of batches per epoch.  Iteration advances an
    internal epoch counter so each epoch reshuffles deterministically.
    """

    def __init__(
        self,
        dataset,
        bs: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        collate: Callable = default_collate,
        prefetch: int = 2,
        transform: Optional[Callable] = None,
        num_workers: int = 0,
        host_shard: bool = False,
    ):
        self.dataset = dataset
        self.bs = bs
        self.shuffle = shuffle
        # multi-host: each process iterates only its contiguous slice of the
        # (globally shuffled) epoch order; combine with
        # parallel.multihost.global_batch to build globally-sharded batches
        self.host_shard = host_shard
        self.drop_last = drop_last
        self.seed = seed
        self.collate = collate
        self.prefetch = prefetch
        self.transform = transform  # applied to the collated batch tuple
        self.epoch = 0
        # >0: fetch samples with a thread pool — cv2/numpy release the GIL,
        # so image decode+resize parallelizes (the analogue of torch
        # DataLoader worker processes without the IPC cost)
        self.num_workers = num_workers
        self._pool = None

    def _get_pool(self):
        if self._pool is None and self.num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def __del__(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)

    def __len__(self):
        n = len(self.dataset)
        if self.host_shard:
            from neuralnetworklibrary_tpu.parallel.multihost import process_info

            _, pc = process_info()
            n = -(-n // pc)  # this host's (padded) share of the epoch
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def peek(self) -> Batch:
        """First batch of the dataset in natural order, without advancing the
        epoch counter — used by the Learner to initialize model params."""
        n = min(self.bs, len(self.dataset))
        return self._make_batch(np.arange(n))

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idxs = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idxs)
        if self.host_shard:
            from neuralnetworklibrary_tpu.parallel.multihost import host_shard

            idxs = np.asarray(host_shard(list(idxs)))
        return idxs

    def _make_batch(self, idxs: np.ndarray) -> Batch:
        n_valid = len(idxs)
        if n_valid < self.bs:  # pad by repeating the last valid row
            idxs = np.concatenate([idxs, np.full(self.bs - n_valid, idxs[-1])])
        # Datasets exposing getitem_rng get a per-(seed, epoch, index) rng —
        # deterministic regardless of fetch-thread scheduling (the property
        # the reference's num_workers=1 workaround protected, SURVEY §5)
        if hasattr(self.dataset, "getitem_rng"):
            def fetch(i):
                return self.dataset.getitem_rng(
                    int(i), np.random.default_rng((self.seed, self.epoch, int(i))))
        else:
            def fetch(i):
                return self.dataset[int(i)]

        pool = self._get_pool()
        if pool is not None:
            samples = list(pool.map(fetch, idxs))
        else:
            samples = [fetch(i) for i in idxs]
        fields = self.collate(samples)
        if self.transform is not None:
            fields = self.transform(fields, self.epoch)
        mask = np.zeros(self.bs, np.float32)
        mask[:n_valid] = 1.0
        return Batch(xs=tuple(fields[:-1]), y=fields[-1], mask=mask, n_valid=n_valid)

    def _iter_batches(self) -> Iterator[Batch]:
        idxs = self._epoch_indices()
        # batch count from THIS epoch's index set (host_shard slices it)
        n = len(idxs)
        n_batches = n // self.bs if self.drop_last else -(-n // self.bs)
        for b in range(n_batches):
            yield self._make_batch(idxs[b * self.bs : (b + 1) * self.bs])
        self.epoch += 1

    def __iter__(self) -> Iterator[Batch]:
        if self.prefetch and self.prefetch > 0:
            return _prefetched(self._iter_batches(), self.prefetch)
        return self._iter_batches()


def _prefetched(it: Iterator, size: int) -> Iterator:
    """Run ``it`` on a daemon thread, buffering up to ``size`` items."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
