"""TPU evidence runs for round-3 VERDICT items:

1. donation: compiled HBM watermark of the 2^22 fused NTT with and without
   input-buffer donation (item 10 — "verified via memory analysis").
2. commit pipeline at 2^16 on the chip with a committed timing (item 9).

Usage: python scripts/evidence_tpu.py [donation|pipeline|all]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ec.utils.cache import enable_compilation_cache
from tpu_ec.utils.measure import hard_sync, timeit


def donation(log_n=22):
    from tpu_ec.fields import BLS12_381_FR
    from tpu_ec.ops.pallas.ntt import PallasFftKernel

    spec = BLS12_381_FR
    kern = PallasFftKernel(spec)
    n = 1 << log_n
    L = spec.n_limbs
    shape = jax.ShapeDtypeStruct((L, n), jnp.uint32)
    for donate in (False, True):
        fn = kern._fn(log_n, False, donate)
        # the fused path closes over `inter`; lower via an example arg
        rng = np.random.default_rng(0)
        limbs = rng.integers(0, 1 << 16, (L, n), dtype=np.uint32)
        limbs[-1] %= int(np.asarray(spec.p_limbs)[-1])
        xp = jnp.asarray(limbs)
        # run once so jit specializes, then pull memory analysis
        y = jax.block_until_ready(fn(xp))
        del y
        # reach the cached compiled executable for analysis
        import tpu_ec.ops.pallas.ntt as pn
        # lower explicitly for the analysis number
        from tpu_ec.ops.pallas.ntt_fused import fused_ntt_planes, get_fused_domain
        dom = get_fused_domain(spec, log_n, False)
        inter = {k: jnp.asarray(v) for k, v in dom._inter_tw.items()}
        kw = {"donate_argnums": (0,)} if donate else {}
        lowered = jax.jit(
            lambda x, it: fused_ntt_planes(spec, x, False, interpret=False, inter=it),
            **kw,
        ).lower(xp, inter)
        mem = lowered.compile().memory_analysis()
        print(
            f"ntt 2^{log_n} donate={donate}: "
            f"argument={mem.argument_size_in_bytes/2**20:.0f} MiB "
            f"output={mem.output_size_in_bytes/2**20:.0f} MiB "
            f"temp={mem.temp_size_in_bytes/2**20:.0f} MiB "
            f"alias={mem.alias_size_in_bytes/2**20:.0f} MiB",
            flush=True,
        )


def pipeline(log_n=16):
    from tpu_ec.curves import oracle
    from tpu_ec.curves.params import BLS12_381_G1
    from tpu_ec.native import native_curve
    from tpu_ec.ops.pipeline import CommitPipeline

    spec = BLS12_381_G1
    n = 1 << log_n
    nc = native_curve(spec)
    rng = np.random.default_rng(5)
    ks = np.zeros((n, 4), dtype=np.uint64)
    ks[:, 0] = rng.integers(1, 1 << 63, n, dtype=np.uint64)
    G = nc.affine_from_points([oracle.generator(spec)])
    jac = nc.scalar_mul(np.broadcast_to(G, (n, G.shape[1])).copy(), ks)
    aff = nc.to_affine(jac)
    w = nc.w
    basis = (
        jnp.asarray(nc.fq.to_halflimbs(np.ascontiguousarray(aff[:, :w]))),
        jnp.asarray(nc.fq.to_halflimbs(np.ascontiguousarray(aff[:, w:]))),
    )
    fr = spec.scalar
    import random

    random.seed(9)
    coeff_ints = [random.randrange(fr.modulus) for _ in range(n)]
    pipe = CommitPipeline(spec)
    coeffs = pipe.fr.from_ints(coeff_ints)

    t0 = time.time()
    evals, commit = pipe.commit(coeffs, basis)
    hard_sync(commit)
    t_first = time.time() - t0

    # in-run correctness gate: the whole pipeline (NTT -> from_mont -> MSM)
    # vs the native C++ stack (ntt + from_mont + Pippenger), structurally
    # independent of the device path
    t0 = time.time()
    ev_nat = nc.fr.ntt(nc.fr.from_ints(coeff_ints))
    s_nat = nc.fr.from_mont(ev_nat)
    want_j = nc.msm(aff, s_nat)
    t_cpu = time.time() - t0
    want = nc.affine_to_points(nc.to_affine(want_j[None, :]))[0]
    got = pipe.ops.to_affine_ints(pipe.ops.to_affine(commit))[0]
    assert got == want, "pipeline commit != native oracle"
    ev_got = pipe.fr.to_ints(evals)
    assert ev_got == nc.fr.to_ints(ev_nat), "pipeline evals != native NTT"

    dt = timeit(lambda: hard_sync(pipe.commit(coeffs, basis)[1]), iters=3, warmup=0)
    print(
        f"commit pipeline 2^{log_n}: {dt*1e3:.0f} ms/commit "
        f"({n/dt/1e6:.3f} M coeff/s; first call {t_first:.0f}s; "
        f"native CPU {t_cpu*1e3:.0f} ms)  bit-exact ok",
        flush=True,
    )
    import json

    from tpu_ec.config import get_config

    art = {
        "metric": "bls12_381_g1_commit_pipeline (NTT -> from_mont -> MSM)",
        "unit": "coefficients/s",
        "log_n": log_n,
        "hardware": "TPU v5e single chip (axon tunnel)",
        "ntt_impl": get_config().ntt_impl,
        "coeffs_per_s": round(n / dt, 1),
        "ms_per_commit": round(dt * 1e3, 1),
        "compile_s": round(t_first, 1),
        "native_cpu_ms": round(t_cpu * 1e3, 1),
        "speedup_vs_native_cpu": round(t_cpu / dt, 2),
        "correctness": "commitment AND evals bit-exact vs native C++ "
        "(ntt + from_mont + Pippenger), asserted in-run",
        "reference_shape": "ag-cuda-ec/benches/amt.rs:17-23 (the AMT workload)",
    }
    out = _os.path.join(_os.path.dirname(__file__), "..", "BENCH_PIPELINE_r05.json")
    with open(_os.path.abspath(out), "w") as fh:
        json.dump(art, fh, indent=1)
    print("wrote", _os.path.abspath(out), flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("donation", "all"):
        donation()
    if what in ("pipeline", "all"):
        pipeline(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
