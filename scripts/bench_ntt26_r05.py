"""2^26 NTT: HBM-budgeted attempt -> BENCH_NTT_r05.json (VERDICT r4 item 7).

BASELINE config[1] tops at 2^26; the r4 program (leaf=8, 4-level plan
[7,7,6,6]) compiled at 13.3 GiB and thrashed at the v5e HBM ceiling.  This
script measures exactly where the bytes go instead of guessing:

1. AOT-compiles the 2^26 digit NTT under input donation for leaf=9 (3-level
   plan [9,9,8] — one fewer level = one fewer full-size intermediate +
   twiddle pass) and leaf=8 (the r4 plan), and records XLA's own
   memory_analysis (argument/output/temp/alias bytes) for each.
2. Executes ONE timed dispatch of the smallest-footprint plan if its
   peak (arguments + temp - alias) fits the chip, exp_digit_ntt.py-style
   (near the ceiling the tunnel can't sustain repeated dispatch).

Correctness: leaf-9 plan gated bit-exact vs the bigint oracle at 2^12
in-run (every other digit plan is oracle-gated the same way in
tests/test_ntt_digit.py and the r4 evidence runs).

Usage: python scripts/bench_ntt26_r05.py [log_n]   (default 26)
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ec.fields import BLS12_381_FR, field_ops
from tpu_ec.ops.ntt import ntt_ref
from tpu_ec.ops.ntt_digit import digit_consts, digit_ntt_planes, get_digit_domain
from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import hard_sync

SPEC = BLS12_381_FR
OUT = _os.path.join(_os.path.dirname(__file__), "..", "BENCH_NTT_r05.json")
HBM_BYTES = 16 * (1 << 30)  # v5e


def mem_row(leaf: int, log_n: int):
    f = field_ops(SPEC)
    n = 1 << log_n
    dom = get_digit_domain(SPEC, log_n, False, leaf)
    t0 = time.time()
    consts = jax.tree_util.tree_map(jax.device_put, digit_consts(dom))
    print(f"leaf={leaf} tables built+uploaded: {time.time()-t0:.1f}s", flush=True)
    fn = jax.jit(
        lambda xp, c: digit_ntt_planes(SPEC, xp, leaf=leaf, consts=c),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(5)
    xp_np = rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32)
    xp_np[-1] %= int(f.p[-1])
    xp = jnp.asarray(xp_np)
    t0 = time.time()
    compiled = fn.lower(xp, consts).compile()
    compile_s = time.time() - t0
    mem = compiled.memory_analysis()
    row = {
        "leaf": leaf,
        "plan": dom.plan,
        "log_n": log_n,
        "compile_s": round(compile_s, 1),
        "argument_mib": round(mem.argument_size_in_bytes / 2**20),
        "output_mib": round(mem.output_size_in_bytes / 2**20),
        "temp_mib": round(mem.temp_size_in_bytes / 2**20),
        "alias_mib": round(mem.alias_size_in_bytes / 2**20),
    }
    peak = (
        mem.argument_size_in_bytes
        + mem.output_size_in_bytes
        + mem.temp_size_in_bytes
        - mem.alias_size_in_bytes
    )
    row["peak_mib"] = round(peak / 2**20)
    row["fits_hbm"] = bool(peak < HBM_BYTES)
    print(row, flush=True)
    return row, compiled, xp, consts, n


def main(log_n: int):
    enable_compilation_cache()
    f = field_ops(SPEC)

    # correctness gate: leaf-9 plan vs bigint oracle at 2^12 on chip
    r = random.Random(9)
    vals = [r.randrange(SPEC.modulus) for _ in range(1 << 12)]
    x = f.from_ints(vals)
    y = digit_ntt_planes(SPEC, jnp.swapaxes(x, 0, 1), leaf=9)
    assert f.to_ints(jnp.swapaxes(y, 0, 1)) == ntt_ref(SPEC, vals), (
        "leaf-9 digit NTT mismatch vs oracle at 2^12"
    )
    print("leaf=9 bit-exact vs oracle @ 2^12", flush=True)

    rows = []
    best = None

    def write_partial():
        art = {
            "metric": f"bls12_381_fr_ntt_2^{log_n}",
            "unit": "elements/s",
            "hardware": "TPU v5e single chip (axon tunnel), 16 GiB HBM",
            "correctness": "leaf-9 plan bit-exact vs bigint oracle at 2^12 in-run",
            "memory_analysis": rows,
            "timed_run": None,
            "note": "partial (run in progress or cut)",
        }
        with open(_os.path.abspath(OUT), "w") as fh:
            json.dump(art, fh, indent=1)

    for leaf in (9, 8):
        row, compiled, xp, consts, n = mem_row(leaf, log_n)
        rows.append(row)
        write_partial()  # a wall-clock cut still keeps the byte accounting
        if best is None or row["peak_mib"] < best[0]["peak_mib"]:
            best = (row, compiled, xp, consts, n)
        else:
            del compiled, xp, consts

    row, compiled, xp, consts, n = best
    timed = None
    if row["fits_hbm"]:
        t0 = time.perf_counter()
        out = compiled(xp, consts)
        hard_sync(out)
        dt = time.perf_counter() - t0
        timed = {
            "leaf": row["leaf"],
            "elems_per_s": round(n / dt),
            "ms": round(dt * 1e3, 1),
            "vs_sol_1e8": round(n / dt / 1e8, 3),
            "timing": "ONE dispatch incl. readback sync (tunnel cannot "
            "sustain repeated dispatch at the HBM ceiling)",
        }
        print(timed, flush=True)

    art = {
        "metric": f"bls12_381_fr_ntt_2^{log_n}",
        "unit": "elements/s",
        "hardware": "TPU v5e single chip (axon tunnel), 16 GiB HBM",
        "correctness": "leaf-9 plan bit-exact vs bigint oracle at 2^12 in-run",
        "memory_analysis": rows,
        "timed_run": timed,
        "note": "memory_analysis rows are XLA's own per-program byte "
        "accounting under input donation; peak = args + output + temp - alias",
    }
    with open(_os.path.abspath(OUT), "w") as fh:
        json.dump(art, fh, indent=1)
    print("wrote", _os.path.abspath(OUT), flush=True)


if __name__ == "__main__":
    main(int(_sys.argv[1]) if len(_sys.argv) > 1 else 26)
