"""Structured per-phase timing (the `timer` cargo feature, upgraded).

The reference's opt-in timing prints per-phase microseconds with thread ids
(`ag-cuda-proxy/src/kernel.rs:17-18,57-93,214-220`) plus ad-hoc Instant
prints in the ops (`ag-cuda-ec/src/ec_fft.rs:71,88-90`).  Here: a nestable
context-manager registry that records wall-clock per labeled phase, opt-in
via TPU_EC_TIMER=1 (mirroring the cargo-feature gate), zero overhead when
off.  `jax.profiler` traces remain the deep tool; this is the lightweight
always-available layer.
"""

from __future__ import annotations

import collections
import contextlib
import os
import threading
import time

def _env_enabled() -> bool:
    from ..config import get_config

    return get_config().timer


_ENABLED = _env_enabled()
_LOCAL = threading.local()


class PhaseStats:
    def __init__(self):
        self.records: dict[str, list[float]] = collections.defaultdict(list)

    def add(self, label: str, seconds: float) -> None:
        self.records[label].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for label, xs in self.records.items():
            out[label] = {
                "count": len(xs),
                "total_s": sum(xs),
                "mean_us": 1e6 * sum(xs) / len(xs),
            }
        return out

    def reset(self) -> None:
        self.records.clear()


STATS = PhaseStats()


def enabled() -> bool:
    return _ENABLED


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def phase(label: str):
    """`with timer.phase("msm/h2d"):` — records wall time when enabled.
    Nested phases get slash-joined labels (kernel.rs prints tid + phase;
    here the label stack plays that role)."""
    if not _ENABLED:
        yield
        return
    stack = getattr(_LOCAL, "stack", None)
    if stack is None:
        stack = _LOCAL.stack = []
    stack.append(label)
    full = "/".join(stack)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        STATS.add(full, time.perf_counter() - t0)
        stack.pop()


def report() -> str:
    """Human-readable dump (the feature's println analog)."""
    lines = []
    for label, s in sorted(STATS.summary().items()):
        lines.append(
            f"{label}: n={s['count']} total={s['total_s']*1e3:.2f}ms mean={s['mean_us']:.0f}us"
        )
    return "\n".join(lines)
