"""Bounded readahead over an indexable dataset.

TPU-side compute runs ahead of the host (dispatches return before the step
finishes), so the only way the input pipeline can stall training is by not
having the NEXT example ready when the host loop builds the next batch.
``Prefetcher`` keeps a small window of ``dataset[i]`` futures in flight on a
thread pool — with the native h5/npz readers releasing the GIL during
decompression, the workers genuinely overlap.

Replaces the reference's torch ``DataLoader(num_workers=...)`` processes
(vendored DL_reconstruction/pl_modules/data_module.py; torch forks worker
processes and pickles every sample back). Threads + GIL-free native reads
achieve the overlap without the serialization round-trip.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence


class Prefetcher:
    """Iterate ``dataset[0..len)`` in order with ``depth`` items in flight.

    ``dataset`` needs ``__len__`` + ``__getitem__``. Exceptions raised by a
    worker surface at the yield for that index (ordering preserved).
    """

    def __init__(self, dataset, depth: int = 4, workers: int = 2):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.dataset = dataset
        self.depth = int(depth)
        self.workers = max(1, int(workers))

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        if n == 0:
            return
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            window = {i: pool.submit(self.dataset.__getitem__, i)
                      for i in range(min(self.depth, n))}
            nxt = len(window)
            for i in range(n):
                fut = window.pop(i)
                if nxt < n:
                    window[nxt] = pool.submit(self.dataset.__getitem__, nxt)
                    nxt += 1
                yield fut.result()


def prefetch(dataset, num_workers: int = 0, depth: int | None = None):
    """Dataset iteration helper: identity when ``num_workers`` <= 0."""
    if num_workers <= 0:
        return dataset
    return Prefetcher(dataset, depth=depth or 2 * num_workers,
                      workers=num_workers)
