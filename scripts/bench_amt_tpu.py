"""TPU batch-MSM (AMT-shape) bench -> BENCH_AMT artifact (VERDICT r3 item 5).

Reference shape: `ag-cuda-ec/benches/multiexp.rs:19-61` runs 2^22 points as
2^10-point chunks x 2^12 chunks (window 8) in one launch and prints speedup
vs the arkworks CPU MSM; `amt.rs:17-23` is the production workload.  Here
the same chunked batch runs as ONE XLA dispatch (`multiple_multiexp`, a
lax.map over the shared pair-engine body), each chunk bit-exact vs the
native C++ Pippenger.

Usage: python scripts/bench_amt_tpu.py [log_chunk log_nchunks]  (default 10 10)
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import time

import jax
import numpy as np

from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import timeit

SPEC = BLS12_381_G1
OUT = _os.path.join(_os.path.dirname(__file__), "..", "BENCH_AMT_r04.json")


def main(log_chunk: int, log_nchunks: int):
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
        kern.multiple_multiexp(bases, scalars, nchunks, method="pair")
    )
    compile_s = time.time() - t0

    # correctness: every chunk vs the native C++ Pippenger
    from tpu_ec.native import available, native_curve

    assert available(), "native oracle required for the in-run gate"
    nc = native_curve(SPEC)
    got = ops.to_affine_ints(ops.to_affine(out))
    for c in range(nchunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        want = nc.msm_points(pts_np[sl], ks_np[sl])
        assert got[c] == want, f"chunk {c} mismatch"

    dt = timeit(
        lambda: kern.multiple_multiexp(bases, scalars, nchunks, method="pair"),
        iters=3,
        warmup=0,
    )
    artifact = {
        "metric": "bls12_381_g1_batch_msm (AMT shape)",
        "unit": "points/s (total across chunks)",
        "shape": f"2^{log_chunk} points x 2^{log_nchunks} chunks = 2^{log_chunk+log_nchunks} total, ONE dispatch",
        "reference_shape": "ag-cuda-ec/benches/multiexp.rs:19-61 (2^10 x 2^12, window 8)",
        "hardware": "TPU v5e single chip (axon tunnel)",
        "correctness": "every chunk bit-exact vs native C++ Pippenger, asserted in-run",
        "points_per_s": round(n / dt, 1),
        "ms_per_batch": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "timing": "3-iteration mean, forced-readback sync; compile excluded",
    }
    with open(_os.path.abspath(OUT), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1), flush=True)


if __name__ == "__main__":
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    args = [int(a) for a in _sys.argv[1:]] or [10, 10]
    main(*args)
