"""TPU: MSM throughput + at-scale correctness vs the native C++ oracle.

The reference benches MSM at 2^16-2^24 (`ec-gpu-proxy/benches/multiexp.rs:
19-53`) and the batch kernel at 2^22 (`ag-cuda-ec/benches/multiexp.rs:19-61`),
always printing a speedup against an arkworks CPU MSM.  Here the CPU side is
the in-repo native C++ Pippenger (`native/src/ec_native.cpp`), which doubles
as the correctness oracle at sizes where the Python bigint oracle is too slow.

Usage: python scripts/bench_msm_tpu.py [log_n ...]   (default 12 14 16 18 20)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import sys
import time

import numpy as np

import jax

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.native import native_curve
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import hard_sync, timeit

SPEC = BLS12_381_G1


def gen_inputs(n: int, seed: int):
    """n pseudo-random points (64-bit k * G via the native batch scalar-mul)
    and ~250-bit scalars, as (device affine pytree, device scalar limbs,
    native affine u64, native scalar u64)."""
    import jax.numpy as jnp

    nc = native_curve(SPEC)
    rng = np.random.default_rng(seed)
    ks = np.zeros((n, 4), dtype=np.uint64)
    ks[:, 0] = rng.integers(1, 1 << 63, n, dtype=np.uint64)
    G = nc.affine_from_points([oracle.generator(SPEC)])
    jac = nc.scalar_mul(np.broadcast_to(G, (n, G.shape[1])).copy(), ks)
    aff = nc.to_affine(jac)
    w = nc.w
    x_hl = nc.fq.to_halflimbs(np.ascontiguousarray(aff[:, :w]))
    y_hl = nc.fq.to_halflimbs(np.ascontiguousarray(aff[:, w:]))

    s_u64 = rng.integers(0, np.iinfo(np.uint64).max, (n, 4), dtype=np.uint64)
    s_u64[:, 3] >>= 4  # < 2^252 < r for both supported curves
    s_hl = nc.fr.to_halflimbs(s_u64)
    return (
        (jnp.asarray(x_hl), jnp.asarray(y_hl)),
        jnp.asarray(s_hl),
        aff,
        s_u64,
    )


OUT = _os.path.join(_os.path.dirname(__file__), "..", "BENCH_MSM_r05.json")


def main(log_ns):
    import json

    enable_compilation_cache()
    ops = point_ops(SPEC)
    kern = MultiexpKernel(SPEC)
    nc = native_curve(SPEC)
    art = {
        "metric": "bls12_381_g1_msm_throughput",
        "unit": "points/s",
        "hardware": "TPU v5e single chip (axon tunnel)",
        "reference_shape": "ec-gpu-proxy/benches/multiexp.rs:19-53 (2^16-2^24)",
        "engine": "pair (vmapped windows at n<=2^16, vmapped bucket tails; "
        "chunked above calc_chunk_size)",
        "correctness": "bit-exact vs native C++ Pippenger per size, in-run",
        "timing": "3-iteration mean, forced-readback sync; compile excluded",
        "results": [],
    }
    if _os.path.exists(OUT):
        art = json.load(open(OUT))
    for log_n in log_ns:
        n = 1 << log_n
        bases, scalars, aff, s_u64 = gen_inputs(n, seed=log_n)
        t0 = time.time()
        out = kern.multiexp(bases, scalars)
        hard_sync(out)
        t_first = time.time() - t0

        # correctness vs native C++ Pippenger (structurally independent)
        got = ops.to_affine_ints(ops.to_affine(out))[0]
        t0 = time.time()
        want_j = nc.msm(aff, s_u64)
        t_cpu = time.time() - t0
        want = nc.affine_to_points(nc.to_affine(want_j[None, :]))[0]
        assert got == want, f"2^{log_n}: TPU MSM != native oracle"

        dt = timeit(lambda: kern.multiexp(bases, scalars), iters=3, warmup=0)
        print(
            f"G1 MSM 2^{log_n}: {n/dt/1e6:.3f} M points/s  ({dt*1e3:.1f} ms; "
            f"first call {t_first:.1f}s; native CPU {t_cpu*1e3:.0f} ms; "
            f"speedup vs 1-thread-pool CPU {t_cpu/dt:.1f}x)  bit-exact ok",
            flush=True,
        )
        art["results"] = [r for r in art["results"] if r["log_n"] != log_n] + [
            {
                "log_n": log_n,
                "points_per_s": round(n / dt, 1),
                "ms": round(dt * 1e3, 1),
                "compile_s": round(t_first, 1),
                "native_cpu_ms": round(t_cpu * 1e3, 1),
                "speedup_vs_native_cpu": round(t_cpu / dt, 2),
            }
        ]
        art["results"].sort(key=lambda r: r["log_n"])
        # write after EVERY size so a killed sweep keeps its rows
        with open(_os.path.abspath(OUT), "w") as fh:
            json.dump(art, fh, indent=1)
    print("wrote", _os.path.abspath(OUT), flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [12, 14, 16, 18, 20]
    main(args)
