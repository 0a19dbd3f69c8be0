"""On-chip MSM window grid search -> tpu_ec/ops/tuned_windows.json.

The measured replacement for guessed heuristics: the reference's AMT bench
grid-searches num_groups 2^7-2^11 x window 4-9 and prints the best
(`ag-cuda-ec/benches/amt.rs:37-57`); here the best window per (engine, size)
is persisted and consumed by ops/autotune.tuned_window at planning time.

The table is keyed per engine because the engines' cost shapes differ.
The default engine is ``scan`` (compile-light: ~1-3 min/config through the
axon tunnel) — the pair engine compiles each (n, window) program in
~25-50 min there (measured r4), so pair rows must be added size-by-size
when chip budget allows.

Usage: python scripts/autotune_msm_tpu.py [--method scan|pair|sorted|coz] [log_n ...]
       (default: --method scan 14 16 18 20)
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import timeit

SPEC = BLS12_381_G1
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tpu_ec", "ops", "tuned_windows.json"
)


def model_window(method: str, n: int) -> int:
    from tpu_ec.ops.msm_coz import default_window_size_coz
    from tpu_ec.ops.msm_pair import default_window_size_pair
    from tpu_ec.ops.msm_scan import default_window_size_scan
    from tpu_ec.ops.msm_sorted import default_window_size_sorted

    return {
        "coz": default_window_size_coz,
        "pair": default_window_size_pair,
        "scan": default_window_size_scan,
        "sorted": default_window_size_sorted,
    }[method](n)


def main(method: str, log_ns):
    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    from bench_msm_tpu import gen_inputs  # reuse the native-backed generator

    enable_compilation_cache()
    kern = MultiexpKernel(SPEC)
    table = {}
    if os.path.exists(OUT):
        table = json.load(open(OUT))
    # migrate/drop old flat-schema entries (numeric keys directly under the
    # curve, from the pre-engine-keyed format) so the file stays uniform
    for curve, tab in table.items():
        for k in [k for k in tab if k.isdigit()]:
            del tab[k]
    curve_tab = table.setdefault(SPEC.name, {}).setdefault(method, {})
    span = int(os.environ.get("TPU_EC_AUTOTUNE_SPAN", "1"))
    for log_n in log_ns:
        n = 1 << log_n
        bases, scalars, _, _ = gen_inputs(n, seed=100 + log_n)
        w0 = model_window(method, n)
        best_w, best_dt = None, float("inf")
        for w in range(max(2, w0 - span), min(16, w0 + span) + 1):
            dt = timeit(
                lambda: kern.multiexp(bases, scalars, window_size=w, method=method),
                iters=2,
                warmup=1,
            )
            print(
                f"{method} 2^{log_n} w={w}: {n/dt/1e6:.4f} M pts/s ({dt*1e3:.1f} ms)",
                flush=True,
            )
            if dt < best_dt:
                best_w, best_dt = w, dt
            # write after EVERY config: a killed run keeps its measurements
            curve_tab[str(log_n)] = best_w
            with open(os.path.abspath(OUT), "w") as fh:
                json.dump(table, fh, indent=1)
        print(f"{method} 2^{log_n}: best window {best_w} (model said {w0})", flush=True)
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    argv = sys.argv[1:]
    method = "scan"
    if argv and argv[0] == "--method":
        method = argv[1]
        argv = argv[2:]
    main(method, [int(a) for a in argv] or [14, 16, 18, 20])
