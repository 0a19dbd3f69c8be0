"""Headline benchmark: prints ONE JSON line for the driver.

Metric: single-chip BLS12-381 Fr NTT throughput (elements/sec) at 2^20 —
the radix_fft_many path of the reference (`ec-gpu-proxy/src/fft.rs`), which
publishes no absolute numbers (BASELINE.md); ``vs_baseline`` is therefore
measured against a speed-of-light estimate for this chip's VPU:

  speed-of-light mulmod ~ VPU u32-op throughput / ops-per-mulmod.
  An Fr Montgomery mul in the 16-bit-limb model is 3 column products
  (3 * L^2 = 768 u32 mul-adds) + 3 log-depth carry passes ~ 3000 u32 ops.
  NTT(2^20) = 20 stages * 2^19 (1 mul + ~2.2 add-equivalents) — the add's
  lookahead chain costs ~L*8 ops.  v5e-class VPU ~ 4e12 u32 ops/s =>
  ~5e7-1.5e8 elem/s SOL band; vs_baseline uses its midpoint 1e8 so a value
  of 1.0 means "at speed of light" (not "at reference parity", which does
  not exist).
"""

import json
import time

SOL_ELEMS_PER_S = 1.0e8


def main():
    import jax

    from tpu_ec.fields import BLS12_381_FR, field_ops
    from tpu_ec.ops.pallas.ntt import PallasFftKernel
    from tpu_ec.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    f = field_ops(BLS12_381_FR)
    log_n = 20
    n = 1 << log_n
    import numpy as np

    rng = np.random.default_rng(1)
    # random limb patterns are fine for throughput (Montgomery mul is
    # data-oblivious); correctness is covered by tests + the drive scripts
    xp = jax.numpy.asarray(rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32))
    kern = PallasFftKernel(BLS12_381_FR)
    y = jax.block_until_ready(kern.radix_fft_planes(xp))  # compile + warm
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = kern.radix_fft_planes(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    value = n / dt
    print(
        json.dumps(
            {
                "metric": f"bls12_381_fr_ntt_2^{log_n}_throughput",
                "value": round(value, 1),
                "unit": "elements/s",
                "vs_baseline": round(value / SOL_ELEMS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
