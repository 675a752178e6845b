"""Minimal batching loader with optional background prefetch + MP workers.

Replaces torch's DataLoader (reference ``data/build.py:79-87``).  The active
reference configs all use ``NUM_WORKERS: 0`` (synchronous loading), so the
default here is synchronous too.  Two overlap mechanisms, composable with
the TPU step:

* ``prefetch > 0`` — a daemon thread keeps up to that many collated batches
  ready while the device step runs (host/device overlap, zero processes).
* ``num_workers > 0`` — a process pool produces batches in parallel
  (decode + augment + quantize + collate all happen in the worker), the
  equivalent of torch's ``DataLoader(num_workers=N)`` that the reference
  relies on for its CPU-bound ``__getitem__`` (pickle + PIL + sparse
  quantize, reference ``semantic_kitti_dataloader.py:150-253``).  Batch
  ORDER is deterministic (window-FIFO), and each batch's augmentation RNG
  is seeded from (loader seed, epoch, batch ordinal) — reproducible
  regardless of worker count or scheduling (reference ``worker_init_fn``,
  ``common/utils/torch_util.py:17``).

Workers use the ``forkserver`` start method: plain ``fork`` from a live
JAX/TPU process deadlocks (the child inherits XLA runtime threads' held
locks — observed as 0-CPU stuck workers when forking mid-suite), while
forkserver children descend fork+exec from a clean helper process.  The
price is that (dataset, collate_fn) must be picklable; datasets keep their
members lambda-free for this.
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from collections import deque

import numpy as np

# Worker-process globals, installed once per worker by _worker_init (the
# dataset/collate close over config only — pickled once per worker, not
# once per task).
_G = {}


def _worker_init(dataset, collate_fn):
    _G["dataset"] = dataset
    _G["collate"] = collate_fn


def _worker_produce(base_seed, ordinal, idx):
    # Deterministic per-batch stream: datasets draw augmentations from the
    # global numpy RNG, so seed it per batch, not per worker.  The epoch
    # seed arrives per TASK (not via the initializer) so one pool serves
    # every epoch — respawning workers + re-pickling the dataset each epoch
    # costs seconds of dead time per epoch boundary.
    np.random.seed((base_seed * 100003 + ordinal) % (2 ** 31 - 1))
    return _G["collate"]([_G["dataset"][int(i)] for i in idx])


class DataLoader:
    def __init__(self, dataset, batch_size, collate_fn, shuffle=False,
                 drop_last=False, seed=0, prefetch=0, num_workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._pool = None

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

    def _get_pool(self):
        """Persistent forkserver pool — created once, reused across epochs
        (the epoch seed travels per task, see _worker_produce)."""
        if self._pool is None:
            ctx = multiprocessing.get_context("forkserver")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init,
                initargs=(self.dataset, self.collate_fn))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):   # pragma: no cover - interpreter teardown
        try:
            self.close()
        except Exception:
            pass

    def _iter_mp(self, batches):
        """Ordered parallel batch production over a forkserver pool.

        A bounded submission window (workers + prefetch) caps host memory at
        ``window`` collated batches in flight; results pop in submission
        order so iteration order matches the synchronous path.
        """
        window = self.num_workers + max(2, self.prefetch)
        pool = self._get_pool()
        base_seed = self.seed + self.epoch
        pending = deque()
        it = enumerate(batches)

        def submit():
            try:
                i, idx = next(it)
            except StopIteration:
                return
            pending.append(pool.apply_async(
                _worker_produce, (base_seed, i, np.asarray(idx))))

        for _ in range(window):
            submit()
        try:
            while pending:
                batch = pending.popleft().get()
                submit()
                yield batch
        except GeneratorExit:
            # Abandoned mid-epoch (e.g. a bench taking a few batches): the
            # pool stays alive for the next epoch; in-flight results are
            # simply dropped when collected.
            raise

    def __iter__(self):
        batches = self._index_batches()
        if self.num_workers > 0:
            yield from self._iter_mp(batches)
            return
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
