"""Prefetching host data loader producing numpy batches.

Replaces the torch DataLoader (reference hbird/data/voc/voc_data.py:72-79)
with two worker modes:

- "thread" (default): a thread pool — zero startup cost, shares the
  dataset's tar index in-process. PIL's C codecs release the GIL, but the
  numpy transform glue serializes at ~35-65 img/s regardless of threads.
- "process": a forkserver-context process pool — the dataset ships to
  each worker ONCE (initializer), tasks carry only (index, seed), decode
  scales with cores. forkserver (not plain fork) is deliberate: the
  server is a fresh python that never inherits initialized JAX/XLA thread
  pools (fork-after-jax can deadlock), and unlike spawn it does not
  re-execute __main__. The reference gets the same isolation from torch's
  forked workers + pickle-safe tar handles (voc_tar_data.py:279-283).

Augmentation randomness is seeded PER ITEM from (epoch draw, item index),
so results are reproducible for a given `random.seed(...)` regardless of
worker count or scheduling — stronger than the reference's per-worker
seeding.

Order is deterministic: batch i always contains items [i*B, (i+1)*B) of
the (optionally shuffled) index list, matching the reference's
shuffle=False / drop_last=False defaults (reference data/__init__.py:81-83).
"""

from __future__ import annotations

import multiprocessing
import queue
import random
import threading
from concurrent.futures import Executor, ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Iterator, List, Optional, Sequence

import numpy as np

_WORKER_DATASET = None


def _process_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_get(idx: int, seed: int):
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return _WORKER_DATASET[idx]


def default_collate(samples: Sequence[Any]):
    """Stack tuples of numpy arrays elementwise."""
    first = samples[0]
    if isinstance(first, tuple):
        return tuple(default_collate([s[i] for s in samples]) for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    return np.asarray(samples)


class HostDataLoader:
    """Iterable over batches of a map-style dataset.

    Args:
        dataset: object with __len__ and __getitem__ -> tuple of numpy arrays.
        batch_size: items per batch.
        shuffle: shuffle item order each epoch (stdlib RNG, respects seeding).
        num_workers: decode threads (0 = synchronous).
        drop_last: drop the final ragged batch.
        prefetch: max batches resident in the queue.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 8,
        drop_last: bool = False,
        prefetch: int = 4,
        collate_fn=default_collate,
        mode: str = "thread",  # "thread" | "process"
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = max(0, int(num_workers))
        self.drop_last = drop_last
        self.prefetch = max(1, int(prefetch))
        self.collate_fn = collate_fn
        assert mode in ("thread", "process"), mode
        self.mode = mode
        self._pool: Optional[Executor] = None

    def _executor(self) -> Executor:
        """Worker pool, created lazily and reused across epochs (process
        spawn + dataset shipping is paid once per loader)."""
        if self._pool is None:
            if self.mode == "process":
                try:
                    ctx = multiprocessing.get_context("forkserver")
                except ValueError:  # pragma: no cover (non-POSIX)
                    ctx = multiprocessing.get_context("spawn")
                self._pool = ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=ctx,
                    initializer=_process_worker_init,
                    initargs=(self.dataset,),
                )
            else:
                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.shuffle(idx)
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator:
        batches = self._batch_indices()
        if self.num_workers == 0:
            for b in batches:
                yield self.collate_fn([self.dataset[i] for i in b])
            return

        pool = self._executor()
        if self.mode == "process":
            # Per-item seeds drawn once per epoch from the (seedable) global
            # RNG: reproducible regardless of worker count/scheduling.
            epoch_seed = random.getrandbits(31)

            def submit(i):
                return pool.submit(_process_worker_get, i, epoch_seed + 2654435761 * i)

        else:

            def submit(i):
                return pool.submit(self.dataset.__getitem__, i)

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                # Submit per-item fetches batch by batch, keeping batch
                # order deterministic while items decode in parallel.
                pending = []
                for b in batches:
                    if stop.is_set():
                        return
                    pending.append([submit(i) for i in b])
                    # Keep at most `prefetch+1` batches in flight.
                    while len(pending) > self.prefetch:
                        done = pending.pop(0)
                        out_q.put(self._finish(done))
                        if stop.is_set():
                            return
                for done in pending:
                    if stop.is_set():
                        return
                    out_q.put(self._finish(done))
                out_q.put(_SENTINEL)
            except BaseException as e:  # propagate into the consumer
                out_q.put(_ExcWrapper(e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, _ExcWrapper):
                    raise item.exc
                yield item
        finally:
            stop.set()
            # Drain so the producer can exit.
            while not out_q.empty():
                out_q.get_nowait()

    def _finish(self, futures):
        return self.collate_fn([f.result() for f in futures])


_SENTINEL = object()


class _ExcWrapper:
    def __init__(self, exc: BaseException):
        self.exc = exc
