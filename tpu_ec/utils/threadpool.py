"""Host-side worker pool (Worker/Waiter parity).

The reference wraps a global yastl pool sized by EC_GPU_NUM_THREADS
(`ec-gpu-proxy/src/threadpool.rs:13-30`) with `Worker::compute` returning a
`Waiter` future (:36-113).  On TPU the *device* work is scheduled by XLA
(async dispatch replaces per-GPU host threads), so this pool's remaining
real jobs are host-side: input marshalling (to_repr conversion — the
"10ms per 1M scalars" cost noted at ag-cuda-ec/benches/multiexp.rs:36),
oracle computation, and overlapping host prep with device execution.

Sized by TPU_EC_NUM_THREADS (EC_GPU_NUM_THREADS analog) or cpu count.
"""

from __future__ import annotations

import concurrent.futures as _fut
import math
import os


def _pool_size() -> int:
    from ..config import get_config

    n = get_config().num_threads
    if n:
        return max(1, n)
    return os.cpu_count() or 1


_POOL: _fut.ThreadPoolExecutor | None = None


def _pool() -> _fut.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = _fut.ThreadPoolExecutor(max_workers=_pool_size())
    return _POOL


class Waiter:
    """Future wrapper (threadpool.rs:98-113: bounded(1) channel future)."""

    def __init__(self, future: _fut.Future):
        self._future = future

    def wait(self):
        return self._future.result()

    def done(self) -> bool:
        return self._future.done()


class Worker:
    """`Worker::compute` / `scope` parity (threadpool.rs:36-95)."""

    def __init__(self):
        self.pool = _pool()

    @staticmethod
    def log_num_threads() -> int:
        """log2 of pool size (threadpool.rs:91-95)."""
        return int(math.log2(_pool_size())) if _pool_size() > 1 else 0

    def compute(self, fn, *args, **kwargs) -> Waiter:
        return Waiter(self.pool.submit(fn, *args, **kwargs))

    def scope(self, elements: int, fn):
        """Split ``elements`` into one chunk per thread and run
        fn(chunk_start, chunk_len) on each (threadpool.rs:64-89's scope);
        blocks until all chunks finish, returning results in order."""
        k = _pool_size()
        chunk = -(-elements // k) if elements else 0
        futs = []
        start = 0
        while start < elements:
            ln = min(chunk, elements - start)
            futs.append(self.pool.submit(fn, start, ln))
            start += ln
        return [f.result() for f in futs]
