"""Minimal batching loader with optional background prefetch.

Replaces torch's DataLoader (reference ``data/build.py:79-87``).  The active
reference configs all use ``NUM_WORKERS: 0`` (synchronous loading), so the
default here is synchronous too; ``prefetch > 0`` adds a daemon thread that
keeps up to that many collated batches ready while the TPU step runs —
host/device overlap without multiprocessing.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size, collate_fn, shuffle=False,
                 drop_last=False, seed=0, prefetch=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            batches.append(idx)
        return batches

    def _produce(self, idx):
        return self.collate_fn([self.dataset[int(i)] for i in idx])

    def __iter__(self):
        batches = self._index_batches()
        if self.prefetch <= 0:
            for idx in batches:
                yield self._produce(idx)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for idx in batches:
                    q.put(self._produce(idx))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
