"""TPU batch-MSM (AMT-shape) bench -> BENCH_AMT artifact (VERDICT r3 item 5).

Reference shape: `ag-cuda-ec/benches/multiexp.rs:19-61` runs 2^22 points as
2^10-point chunks x 2^12 chunks (window 8) in one launch and prints speedup
vs the arkworks CPU MSM; `amt.rs:17-23` is the production workload.  Here
the same chunked batch runs as ONE compiled program over
ceil(nchunks/batch_msm_slab) dispatches (`multiple_multiexp`, a lax.map
over the shared engine body; the slab bounds single-dispatch device time),
each chunk bit-exact vs the native C++ Pippenger.

Usage: python scripts/bench_amt_tpu.py [log_chunk log_nchunks [method]]
       (default 10 10 pair; method=scan is the compile-light engine —
       ~2 min tunnel compile vs ~25 min for pair at this shape)
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import time

import jax
import numpy as np

from tpu_ec.config import get_config
from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import timeit

SPEC = BLS12_381_G1
OUT = _os.path.join(_os.path.dirname(__file__), "..", "BENCH_AMT_r05.json")


def main(log_chunk: int, log_nchunks: int, method: str = "pair"):
    from bench_msm_tpu import gen_inputs

    enable_compilation_cache()
    chunk = 1 << log_chunk
    nchunks = 1 << log_nchunks
    n = chunk * nchunks
    bases, scalars, pts_np, ks_np = gen_inputs(n, seed=500)
    kern = MultiexpKernel(SPEC)
    ops = kern.ops

    t0 = time.time()
    out = jax.block_until_ready(
        kern.multiple_multiexp(bases, scalars, nchunks, method=method)
    )
    compile_s = time.time() - t0
    print(f"compile+first batch: {compile_s:.1f}s", flush=True)

    # correctness: every chunk vs the native C++ Pippenger (nc.msm is the
    # u64-array-typed entry; msm_points expects oracle int tuples and would
    # silently read only the first limb of each coordinate here).  The
    # Jacobian batch is read straight back (nchunks x 3L u32) and
    # normalized on the HOST via the native layer: the eager device
    # to_affine chain is ~300 separate tunnel dispatches right after a
    # long batch program — the spot where both r4 "readback faults" fired.
    from tpu_ec.native import available, native_curve

    assert available(), "native oracle required for the in-run gate"
    nc = native_curve(SPEC)
    jac_hl = [np.asarray(jax.device_get(l)) for l in jax.tree_util.tree_leaves(out)]
    jac_u64 = np.concatenate([nc.fq.from_halflimbs(l) for l in jac_hl], axis=1)
    got = nc.affine_to_points(nc.to_affine(jac_u64))
    # the oracle pass doubles as the native-CPU batch baseline (every call
    # uses the full thread pool — the ark CPU-MSM column of the reference
    # bench, ag-cuda-ec/benches/multiexp.rs:56-61)
    t0 = time.time()
    want_jacs = [
        nc.msm(pts_np[c * chunk : (c + 1) * chunk], ks_np[c * chunk : (c + 1) * chunk])
        for c in range(nchunks)
    ]
    cpu_batch_s = time.time() - t0
    for c in range(nchunks):
        want = nc.affine_to_points(nc.to_affine(want_jacs[c][None, :]))[0]
        assert got[c] == want, f"chunk {c} mismatch"

    iters = 3 if nchunks <= 64 else 1  # the full shape is minutes of device time
    dt = timeit(
        lambda: kern.multiple_multiexp(bases, scalars, nchunks, method=method),
        iters=iters,
        warmup=0,
    )
    artifact = {
        "metric": "bls12_381_g1_batch_msm (AMT shape)",
        "unit": "points/s (total across chunks)",
        "shape": f"2^{log_chunk} points x 2^{log_nchunks} chunks = 2^{log_chunk+log_nchunks} total, one compiled program",
        "reference_shape": "ag-cuda-ec/benches/multiexp.rs:19-61 (2^10 x 2^12, window 8)",
        "hardware": "TPU v5e single chip (axon tunnel)",
        "engine": method,
        "correctness": "every chunk bit-exact vs native C++ Pippenger, asserted in-run",
        "points_per_s": round(n / dt, 1),
        "ms_per_batch": round(dt * 1e3, 1),
        "native_cpu_batch_s": round(cpu_batch_s, 1),
        "native_cpu_points_per_s": round(n / cpu_batch_s, 1),
        "speedup_vs_native_cpu": round(cpu_batch_s / dt, 2),
        "compile_s": round(compile_s, 1),
        "timing": f"{iters}-iteration mean, forced-readback sync; compile excluded",
        # matches multiple_multiexp's slabbing exactly: slab = min(cfg, n),
        # tail padded to a full slab -> ceil(nchunks/slab) dispatches
        "dispatches": -(-nchunks // min(get_config().batch_msm_slab or nchunks, nchunks)),
    }
    with open(_os.path.abspath(OUT), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1), flush=True)


if __name__ == "__main__":
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    argv = _sys.argv[1:]
    method = argv.pop() if argv and not argv[-1].isdigit() else "pair"
    args = [int(a) for a in argv] or [10, 10]
    main(*args, method=method)
