"""Sweep fused-NTT leaf size x mont formulation on the real chip.

Round-4 experiment for VERDICT item 2(a): the r3 analysis parked larger
leaves because the pad-form kernel OOMed the compile helper near 2^7; the
limb-list kernel has no pad-materialized shifts, so re-measure the Mosaic
ceiling (ntt_fused.py:48-56).  One (leaf, impl) per process run — the chip
is single-tenant and config is process-wide."""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import random


def main():
    leaf = int(sys.argv[1])
    impl = sys.argv[2]
    log_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from tpu_ec.config import configure

    configure(ntt_leaf_log=leaf, mont_impl=impl)

    from tpu_ec.fields import BLS12_381_FR, field_ops
    from tpu_ec.ops.ntt import ntt_ref
    from tpu_ec.ops.pallas.ntt import PallasFftKernel

    spec = BLS12_381_FR
    f = field_ops(spec)
    pk = PallasFftKernel(spec, interpret=False)

    # correctness gate at 2^12
    r = random.Random(9)
    vals = [r.randrange(spec.modulus) for _ in range(1 << 12)]
    x = f.from_ints(vals)
    t0 = time.perf_counter()
    ok = f.to_ints(pk.radix_fft(x)) == ntt_ref(spec, vals)
    print(f"leaf=2^{leaf} impl={impl}: 2^12 bit-exact={ok} "
          f"(compile+run {time.perf_counter()-t0:.1f}s)", flush=True)
    if not ok:
        sys.exit(1)

    n = 1 << log_n
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32))
    fn = pk.radix_fft_planes
    t0 = time.perf_counter()
    y = jax.block_until_ready(fn(xp))
    print(f"  compile 2^{log_n}: {time.perf_counter()-t0:.1f}s", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"  leaf=2^{leaf} impl={impl} NTT 2^{log_n}: "
          f"{n/dt/1e6:.2f} M elem/s ({dt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
