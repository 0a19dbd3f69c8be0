"""G2 MSM at real sizes -> EVIDENCE_G2 artifact (VERDICT r3 item 6).

BASELINE config[3] (G2 MSM) was only ever evidenced at n<=9; this runs
n=2^12 through the generic scan engine against the native C++ Pippenger
oracle (the native layer supports ext=2) and records throughput.  Run with
JAX_PLATFORMS=cpu for the CPU number or under the axon env for the TPU
number; the artifact accumulates both.

Usage: python scripts/evidence_g2.py [log_n]   (default 12)
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import time

import jax

# honor JAX_PLATFORMS=cpu even though the ambient sitecustomize imports jax
# against the axon tunnel before this script runs (see tests/conftest.py) —
# without this the script would CONTEND for the single-tenant chip
if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G2
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import timeit

OUT = _os.path.join(_os.path.dirname(__file__), "..", "EVIDENCE_G2_r05.json")


def main(log_n: int):
    enable_compilation_cache()
    spec = BLS12_381_G2
    ops = point_ops(spec)
    n = 1 << log_n
    # generate k*G points via the native batch scalar-mul (the python
    # oracle takes tens of minutes for 2^12 G2 points)
    import numpy as np

    from tpu_ec.native import native_curve

    nc = native_curve(spec)
    rng = np.random.default_rng(400)
    kgen = np.zeros((n, 4), dtype=np.uint64)
    kgen[:, 0] = rng.integers(1, 1 << 63, n, dtype=np.uint64)
    G = nc.affine_from_points([oracle.generator(spec)])
    jac = nc.scalar_mul(np.broadcast_to(G, (n, G.shape[1])).copy(), kgen)
    pts = nc.affine_to_points(nc.to_affine(jac))
    ks = [int(v) for v in rng.integers(0, 1 << 63, n, dtype=np.uint64)]
    if "--native-only" in _sys.argv:
        # the CPU row: this library's actual CPU fallback is the native C++
        # Pippenger (multiexp_cpu parity, native/src/ec_native.cpp — the
        # arkworks-CPU analog the reference benches against).  The JAX-CPU
        # backend's G2 scan program at 2^12 exceeds 2 h of XLA-CPU compile
        # on this 2-core host (two timed-out attempts, r5) and is covered
        # bit-exactly at n=32 in the suite instead.
        t0 = time.time()
        want = nc.msm_points(pts, ks)
        dt = time.time() - t0
        entry = {
            "backend": "cpu (native C++ Pippenger, all threads)",
            "engine": "native_pippenger",
            "log_n": log_n,
            "points_per_s": round(n / dt, 1),
            "ms": round(dt * 1e3, 1),
            "compile_s": 0.0,
            "oracle": "is the oracle (cross-checked vs python bigint at n<=32 in tests/test_native.py)",
            "bit_exact": True,
        }
        _write(entry)
        return
    bases = ops.from_affine_ints(pts)
    scalars = ops.scalars_to_limbs(ks)
    kern = MultiexpKernel(spec)
    backend = jax.default_backend()
    # scan everywhere: generic over Fp2 and compile-light on BOTH backends
    # (the sorted engine costs ~an hour of tunnel compile at this size)
    method = "scan"

    t0 = time.time()
    out = jax.block_until_ready(
        kern.multiexp(bases, scalars, method=method)
    )
    compile_s = time.time() - t0
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    try:
        from tpu_ec.native import available, native_curve

        nat = native_curve(spec) if available() else None
    except Exception:
        nat = None
    if nat is not None:
        want = nat.msm_points(pts, ks)
        oracle_name = "native C++ Pippenger (ext=2)"
    else:
        want = oracle.msm(spec, pts, ks)
        oracle_name = "python bigint"
    assert got == want, "G2 MSM mismatch vs oracle"
    # keep the timed engine = the verified engine (auto already selects
    # scan for G2 on every backend; pinning guards against policy drift)
    dt = timeit(
        lambda: kern.multiexp(bases, scalars, method=method), iters=3, warmup=0
    )

    entry = {
        "backend": backend,
        "engine": method,
        "log_n": log_n,
        "points_per_s": round(n / dt, 1),
        "ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "oracle": oracle_name,
        "bit_exact": True,
    }
    _write(entry)


def _write(entry):
    art = {"metric": "bls12_381_g2_msm", "runs": []}
    if _os.path.exists(OUT):
        art = json.load(open(OUT))
    art["runs"] = [
        r
        for r in art["runs"]
        if (r["backend"], r["log_n"]) != (entry["backend"], entry["log_n"])
    ] + [entry]
    with open(_os.path.abspath(OUT), "w") as fh:
        json.dump(art, fh, indent=1)
    print(entry, flush=True)
    print("wrote", _os.path.abspath(OUT), flush=True)


if __name__ == "__main__":
    _args = [a for a in _sys.argv[1:] if not a.startswith("--")]
    main(int(_args[0]) if _args else 12)
