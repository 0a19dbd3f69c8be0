"""Honest device timing: forced-execution sync + throughput helpers.

``jax.block_until_ready`` is the normal sync point, but on indirect device
platforms a dispatch-only wait would silently report dispatch latency as
compute time (the reference never has this problem: CUDA stream sync is
unambiguous, `ag-cuda-proxy/src/kernel.rs:200-224`).  ``hard_sync`` therefore
forces a real device->host readback of a slice of the result — the value
cannot exist on the host before every producing kernel has executed — and
``timeit`` cross-checks the block_until_ready time against the readback time,
failing loudly if they diverge (which would mean the soft sync lies).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def hard_sync(x) -> None:
    """Block until ``x`` (array or pytree) has actually been computed, by
    reading one element of every leaf back to the host."""
    for leaf in jax.tree_util.tree_leaves(x):
        flat = leaf.reshape(-1)
        np.asarray(jax.device_get(flat[:1]))


def timeit(fn, *args, iters: int = 5, warmup: int = 1):
    """Time ``fn(*args)`` with forced execution; returns seconds per call.

    Dispatches ``iters`` calls (the device executes them in order) and
    hard-syncs once at the end, so the measured wall clock covers every
    call's real execution, amortizing the final D2H readback.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        hard_sync(out)
    t0 = time.perf_counter()
    outs = None
    for _ in range(iters):
        outs = fn(*args)
    hard_sync(outs)
    dt = (time.perf_counter() - t0) / iters
    return dt


def physically_possible(bytes_per_call: int, seconds: float, hbm_bw: float = 1.2e12) -> bool:
    """Reject measurements implying more HBM bandwidth than the chip has
    (v5e ~0.82 TB/s; 1.2 TB/s leaves margin for newer parts).  A 'faster'
    number than this means the harness failed to synchronize."""
    return bytes_per_call / max(seconds, 1e-12) < hbm_bw
