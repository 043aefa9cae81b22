"""Benchmark harness: inference FPS/memory, dataloader and dataset timing.

Capabilities of the reference ``utils/benchmark.py:62-515``
(InferenceBenchmark / DataLoaderBenchmark / DatasetBenchmark): warmup +
timed loop, periodic logging, repeat-and-average; device memory comes from
``jax.local_devices()[0].memory_stats()`` instead of CUDA counters.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import numpy as np


def device_memory_mb() -> float:
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get('bytes_in_use', 0) / 1024 / 1024
    except Exception:
        return 0.0


class _BaseBenchmark:
    def __init__(self, max_iter: int = 100, log_interval: int = 50,
                 num_warmup: int = 5, repeat: int = 1):
        self.max_iter = max_iter
        self.log_interval = log_interval
        self.num_warmup = num_warmup
        self.repeat = repeat

    def run_once(self) -> dict:
        raise NotImplementedError

    def run(self) -> dict:
        results = [self.run_once() for _ in range(self.repeat)]
        fps = [r['fps'] for r in results]
        return dict(
            fps=float(np.mean(fps)),
            fps_std=float(np.std(fps)),
            memory_mb=results[-1].get('memory_mb', 0.0))


class InferenceBenchmark(_BaseBenchmark):
    """Times a per-frame callable (e.g. ``lambda i: model.track(...)``)."""

    def __init__(self, frame_fn: Callable[[int], object], **kwargs):
        super().__init__(**kwargs)
        self.frame_fn = frame_fn

    def run_once(self) -> dict:
        import jax
        for i in range(self.num_warmup):
            jax.block_until_ready(self.frame_fn(i))
        t0 = time.perf_counter()
        out = None
        for i in range(self.max_iter):
            out = self.frame_fn(self.num_warmup + i)
            if (i + 1) % self.log_interval == 0:
                jax.block_until_ready(out)
                el = time.perf_counter() - t0
                print(f'[bench] {i + 1}/{self.max_iter}: '
                      f'{(i + 1) / el:.1f} fps', flush=True)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - t0
        return dict(fps=self.max_iter / elapsed,
                    memory_mb=device_memory_mb())


class DataLoaderBenchmark(_BaseBenchmark):
    """Times an iterable of host batches (decode+transform throughput)."""

    def __init__(self, loader_factory: Callable[[], Iterable], **kwargs):
        super().__init__(**kwargs)
        self.loader_factory = loader_factory

    def run_once(self) -> dict:
        it = iter(self.loader_factory())
        for _ in range(self.num_warmup):
            next(it, None)
        t0 = time.perf_counter()
        n = 0
        for _ in range(self.max_iter):
            if next(it, None) is None:
                break
            n += 1
        elapsed = time.perf_counter() - t0
        return dict(fps=n / max(elapsed, 1e-9))


class DatasetBenchmark(_BaseBenchmark):
    """Times raw ``dataset.load_sample``/``load_frame`` calls."""

    def __init__(self, dataset, loader_name: str = 'load_sample', **kwargs):
        super().__init__(**kwargs)
        self.dataset = dataset
        self.loader = getattr(dataset, loader_name)

    def run_once(self) -> dict:
        n = min(self.max_iter, len(self.dataset))
        for i in range(min(self.num_warmup, n)):
            self.loader(i % len(self.dataset))
        t0 = time.perf_counter()
        for i in range(n):
            self.loader(i % len(self.dataset))
        return dict(fps=n / max(time.perf_counter() - t0, 1e-9))
