"""Measured MSM tuning table (the AMT grid search of
`ag-cuda-ec/benches/amt.rs:37-57`, made a first-class feature).

The reference's window/work-unit constants encode measurements on NVIDIA
parts ("empirical", ec-gpu-proxy/src/multiexp.rs:42-49); here the analogous
constants are measured on-chip once by scripts/autotune_msm_tpu.py and
committed as ``tuned_windows.json``.  Lookup falls back to the analytic cost
model (ops/msm_sorted.default_window_size_sorted) when no measurement
covers the size.
"""

from __future__ import annotations

import functools
import json
import os

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "tuned_windows.json")


@functools.lru_cache(maxsize=1)
def _table() -> dict:
    if not os.path.exists(_TABLE_PATH):
        return {}
    with open(_TABLE_PATH) as fh:
        return json.load(fh)


def tuned_window(curve_name: str, engine: str, n: int) -> int | None:
    """Measured best window for ~n points on this curve AND engine, or None.

    Keyed per engine because the engines' cost shapes differ (the scan
    engine pays ~log2(n) adds/point/window, the pair engine ~1), so a
    window measured for one would mis-tune another.
    """
    by_log = (_table().get(curve_name) or {}).get(engine)
    if not by_log:
        return None
    log_n = max(1, n.bit_length() - 1)
    keys = sorted(int(k) for k in by_log)
    nearest = min(keys, key=lambda k: abs(k - log_n))
    if abs(nearest - log_n) > 2:  # don't extrapolate far from measurements
        return None
    return int(by_log[str(nearest)])
