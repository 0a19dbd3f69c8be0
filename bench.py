"""Headline benchmark: prints ONE JSON line for the driver.

Metric: single-chip BLS12-381 Fr NTT throughput (elements/sec) at 2^20 —
the radix_fft path of the reference (`ec-gpu-proxy/src/fft.rs`), which
publishes no absolute numbers (BASELINE.md); ``vs_baseline`` is therefore
measured against a speed-of-light estimate for this chip's VPU:

  speed-of-light mulmod ~ VPU u32-op throughput / ops-per-mulmod.
  An Fr Montgomery mul in the 16-bit-limb model is 3 column products
  (3 * L^2 = 768 u32 mul-adds) + 3 log-depth carry passes ~ 3000 u32 ops.
  NTT(2^20) = 20 stages * 2^19 (1 mul + ~2.2 add-equivalents).  v5e-class
  VPU ~ 4e12 u32 ops/s => ~5e7-1.5e8 elem/s SOL band; vs_baseline uses its
  midpoint 1e8 so a value of 1.0 means "at speed of light" (not "at
  reference parity", which does not exist).

Honesty guards (the round-1 number was ~1000x wrong from a missing sync):
  - timing syncs by reading result bytes back to the host (utils/measure.py),
  - inputs are valid reduced field elements and the benched transform is
    verified on-device against the forward<->inverse roundtrip identity
    before timing,
  - the reported rate must be physically possible for this chip's HBM.
"""

import json

SOL_ELEMS_PER_S = 1.0e8
LOG_N = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_ec.fields import BLS12_381_FR, field_ops
    from tpu_ec.ops.pallas.ntt import PallasFftKernel
    from tpu_ec.utils.cache import enable_compilation_cache
    from tpu_ec.utils.measure import hard_sync, physically_possible, timeit

    enable_compilation_cache()
    f = field_ops(BLS12_381_FR)
    n = 1 << LOG_N
    rng = np.random.default_rng(1)
    # valid reduced field elements (top limb clamped below p's top limb)
    limbs = rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32)
    limbs[-1] %= int(f.p[-1])
    xp = jnp.asarray(limbs)

    kern = PallasFftKernel(BLS12_381_FR)
    y = kern.radix_fft_planes(xp)
    # correctness gate 1: inverse(forward(x)) == x, bit-exact, on device
    x2 = kern.radix_fft_planes(y, inverse=True)
    ok = jax.jit(lambda a, b: jnp.all(a == b))(x2, xp)
    assert bool(jax.device_get(ok)), "NTT roundtrip mismatch — bench aborted"
    # correctness gate 2: FORWARD output vs an independent oracle at 2^12
    # (a self-inverting permutation/twiddle bug would pass the roundtrip)
    try:
        from tpu_ec.native import available, native_field

        has_native = available()
    except Exception:
        has_native = False
    ns = 1 << 12
    xs = xp[:, :ns]
    ys = np.asarray(jax.device_get(kern.radix_fft_planes(xs)))
    if has_native:
        nf = native_field(BLS12_381_FR)
        want = nf.to_halflimbs(nf.ntt(nf.from_halflimbs(np.ascontiguousarray(np.asarray(jax.device_get(xs)).T))))
        assert np.array_equal(ys.T, want), "NTT 2^12 forward != native oracle"
    else:
        # spot-check the first 8 outputs against the bigint oracle
        from tpu_ec.ops.ntt import ntt_ref

        xh = np.asarray(jax.device_get(xs))
        to_int = lambda col: int(sum(int(v) << (16 * i) for i, v in enumerate(col)))
        full = [f.spec.from_mont(to_int(xh[:, j])) for j in range(ns)]
        want_head = ntt_ref(f.spec, full)[:8]
        got_head = [f.spec.from_mont(to_int(ys[:, j])) for j in range(8)]
        assert got_head == want_head, "NTT 2^12 forward != bigint oracle"

    # Device throughput: CHAIN back-to-back transforms inside ONE program,
    # so the axon tunnel's ~6 ms per-dispatch overhead (a dev-harness
    # artifact — it floors EVERY dispatch at ~6 ms regardless of work, see
    # scripts/exp_digit_parts.py) amortizes out; this matches how the
    # transform runs inside a pipeline (ops/pipeline.py).  A single
    # dispatch-inclusive number is reported alongside for transparency.
    CHAIN = 4

    @jax.jit
    def chain(v):
        def body(i, v):
            return kern.radix_fft_planes(v)

        return jax.lax.fori_loop(0, CHAIN, body, v)

    hard_sync(chain(xp))  # compile
    dt = timeit(chain, xp, iters=3, warmup=1) / CHAIN
    dt_single = timeit(kern.radix_fft_planes, xp, iters=5, warmup=1)
    # one pass reads+writes n*L*4 bytes at minimum; plausibility gate
    assert physically_possible(2 * n * f.L * 4, dt), (
        f"measured {dt:.2e}s/call implies impossible HBM bandwidth — sync broken"
    )
    value = n / dt
    print(
        json.dumps(
            {
                "metric": f"bls12_381_fr_ntt_2^{LOG_N}_throughput",
                "value": round(value, 1),
                "unit": "elements/s",
                "vs_baseline": round(value / SOL_ELEMS_PER_S, 4),
                "single_dispatch_elems_per_s": round(n / dt_single, 1),
                "impl": "digit-matmul (ops/ntt_digit.py)",
            }
        )
    )


if __name__ == "__main__":
    main()
