"""Minimal host-side data loader (numpy batching, no torch dependency).

Replaces the reference's torch ``DataLoader`` + ``my_collate``
(``/root/reference/data.py:42-48``): items that return ``None`` (rejected
patches) are dropped from the batch; an all-``None`` batch yields ``None``.

``prefetch > 0`` overlaps host-side loading (NIfTI IO, patch crops,
normalisation) with device compute via a background thread and a bounded
queue — the TPU analog of torch's ``num_workers`` (the reference defaults
to 0 workers, ``/root/reference/train.py:56``; on TPU the chip would stall
on IO without this).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class _PrefetchIterator:
    """Drains ``iterable`` on a daemon thread into a bounded queue.

    The worker closure deliberately does NOT capture ``self``: when the
    consumer drops the iterator mid-epoch, ``__del__`` can fire, set the
    stop event, and the worker unblocks from its bounded-``put`` wait and
    exits — instead of pinning the dataset and in-flight batches forever.
    """

    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._err_box: list = []

        def worker(it, q, stop, err_box, sentinel):
            def put(item) -> bool:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                for item in it:
                    if not put(item):
                        return
            except BaseException as e:  # propagate to the consumer
                err_box.append(e)
            finally:
                put(sentinel)

        self._thread = threading.Thread(
            target=worker,
            args=(iterable, self._q, self._stop, self._err_box,
                  self._SENTINEL),
            daemon=True,
        )
        self._thread.start()

    def close(self):
        self._stop.set()
        # drain so a worker blocked between Full-checks sees the event fast
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # pragma: no cover - GC timing dependent
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err_box:
                raise self._err_box[0]
            raise StopIteration
        return item


def collate_drop_none(items):
    """Stack tuple-of-array items, dropping Nones (reference ``my_collate``)."""
    items = [it for it in items if it is not None]
    if not items:
        return None
    first = items[0]
    if isinstance(first, (tuple, list)):
        return tuple(
            np.stack([np.asarray(it[i]) for it in items], axis=0)
            for i in range(len(first))
        )
    return np.stack([np.asarray(it) for it in items], axis=0)


class DataLoader:
    """Iterates a map-style dataset in batches with optional shuffling."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 drop_last: bool = False, collate_fn=collate_drop_none,
                 seed: int = 0, prefetch: int = 0, worker_map=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        # applied to each collated batch before it is handed to the
        # consumer; with prefetch > 0 it runs on the worker thread, so an
        # expensive map (dtype cast + jax.device_put) overlaps device
        # compute — host->device prefetch, the TPU analog of torch's
        # pin_memory+non_blocking copies
        self.worker_map = worker_map
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        # advance the dataset's epoch so per-(epoch, idx)-seeded crops vary
        # across passes without touching the global np.random stream
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        if self.prefetch > 0:
            return _PrefetchIterator(self._iterate(), depth=self.prefetch)
        return self._iterate()

    def _iterate(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            batch = self.collate_fn([self.dataset[int(i)] for i in idx])
            if batch is None:
                continue
            if self.worker_map is not None:
                batch = self.worker_map(batch)
            yield batch
