"""Minimal host-side data loader (numpy batching, no torch dependency).

Replaces the reference's torch ``DataLoader`` + ``my_collate``
(``/root/reference/data.py:42-48``): items that return ``None`` (rejected
patches) are dropped from the batch; an all-``None`` batch yields ``None``.
"""

from __future__ import annotations

import numpy as np


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
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
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
            yield batch
