"""Background-prefetching loaders feeding the device pipeline.

Replaces the reference's 16-worker fork-based torch DataLoader (SURVEY.md
section 1 process boundary) with a thread-pool prefetcher: PNG decode and
host-side transforms happen in worker threads (PIL releases the GIL for
decode), finished samples are moved to the accelerator ahead of use so the
device never waits on the host (double buffering).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional

import jax


class PrefetchIterator:
    """Run ``fn(item)`` for items of ``it`` in ``num_workers`` threads,
    yielding results in order with up to ``prefetch`` ready ahead."""

    def __init__(self, it: Iterable, fn: Callable, num_workers: int = 4,
                 prefetch: int = 4):
        self._items = list(it)
        self._fn = fn
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._prefetch = prefetch

    def __len__(self):
        return len(self._items)

    def __iter__(self) -> Iterator:
        futures = []
        idx = 0
        n = len(self._items)
        while idx < min(self._prefetch, n):
            futures.append(self._pool.submit(self._fn, self._items[idx]))
            idx += 1
        for i in range(n):
            result = futures[i].result()
            if idx < n:
                futures.append(self._pool.submit(self._fn, self._items[idx]))
                idx += 1
            yield result


def device_prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Move pytrees to the default device ``size`` steps ahead (the h2d copy
    overlaps with compute on the previous step)."""
    buf = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.pop(0)
        try:
            buf.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield nxt
