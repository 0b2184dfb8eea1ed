"""Host-side worker pools for CPU-bound metrics.

Capability parity with utils/processing_pool.py:33-166 (`ProcessingPool` /
`SyncProcessingPool`). In the TPU rebuild the *device* fan-out is handled by
batching + sharding (parallel/), but CPU metrics (PESQ, STOI, COVL) still
benefit from a host pool; errors are collected and reported rather than
killing the run (reference _error_callback semantics), and `pop()` returns
results in submission order.
"""
from __future__ import annotations

import concurrent.futures as cf
import traceback
from typing import Any, Callable, List, Optional


class ProcessingPool:
    """Async pool with ordered result collection and error tolerance."""

    def __init__(self, num_workers: Optional[int] = None, use_threads: bool = True):
        cls = cf.ThreadPoolExecutor if use_threads else cf.ProcessPoolExecutor
        self._pool = cls(max_workers=num_workers)
        self._futures: List[cf.Future] = []
        self.errors: List[str] = []

    def push(self, fn: Callable, *args, **kwargs) -> None:
        self._futures.append(self._pool.submit(fn, *args, **kwargs))

    def pop(self) -> Any:
        """Next result in submission order; failed tasks yield None and
        record the traceback (processing_pool.py:55-60)."""
        fut = self._futures.pop(0)
        try:
            return fut.result()
        except Exception:
            tb = traceback.format_exc()
            self.errors.append(tb)
            print(tb)
            return None

    def wait_results(self, progress_bar: bool = False) -> List[Any]:
        futures = list(self._futures)
        self._futures.clear()
        it = futures
        if progress_bar:
            from tqdm import tqdm

            it = tqdm(futures)
        out = []
        for fut in it:
            try:
                out.append(fut.result())
            except Exception:
                tb = traceback.format_exc()
                self.errors.append(tb)
                print(tb)
                out.append(None)
        return out

    def close(self):
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SyncProcessingPool(ProcessingPool):
    """Pool whose push blocks when all workers are busy (backpressure),
    mirroring utils/processing_pool.py:90-166."""

    def __init__(self, num_workers: int = 4, use_threads: bool = True):
        super().__init__(num_workers, use_threads)
        self._limit = num_workers

    def push(self, fn: Callable, *args, **kwargs) -> None:
        while sum(not f.done() for f in self._futures) >= self._limit:
            cf.wait(
                [f for f in self._futures if not f.done()],
                return_when=cf.FIRST_COMPLETED,
            )
        super().push(fn, *args, **kwargs)
