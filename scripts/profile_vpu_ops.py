"""Raw VPU op-throughput microbench: what does one u32 mult/add/shift or
f32 FMA actually cost on this chip?  Drives the mulmod kernel redesign.

Each kernel does K dependent rounds of the op over a VMEM-resident (R, C)
block so the measurement is compute-bound, not HBM-bound.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ec.utils.measure import timeit

R, C = 256, 512          # block shape per grid step
GRID = 64                # blocks
K = 64                   # dependent op rounds per element


def make_bench(op, dtype):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        x = a
        for _ in range(K):
            x = op(x, b)
        o_ref[:] = x

    n = GRID * C
    bspec = pl.BlockSpec((R, C), lambda i: (0, i), memory_space=pltpu.VMEM)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, n), dtype),
            grid=(GRID,),
            in_specs=[bspec, bspec],
            out_specs=bspec,
        )(a, b)

    return run


def main():
    rng = np.random.default_rng(0)
    n = GRID * C
    total_ops = R * n * K

    cases = [
        ("u32 add", lambda x, b: x + b, jnp.uint32),
        ("u32 mul (low)", lambda x, b: x * b, jnp.uint32),
        ("u32 mul+mask+shift", lambda x, b: ((x * b) & 0xFFFF) + (x >> 16), jnp.uint32),
        ("i32 mul", lambda x, b: x * b, jnp.int32),
        ("u16-val u32 mul", lambda x, b: (x & 0xFFFF) * (b & 0xFFFF), jnp.uint32),
        ("f32 mul", lambda x, b: x * b, jnp.float32),
        ("f32 fma", lambda x, b: x * b + x, jnp.float32),
        ("u32 shift", lambda x, b: (x >> 7) | b, jnp.uint32),
        ("u32 and", lambda x, b: (x & b) | jnp.uint32(1), jnp.uint32),
        ("u32 cmp+sel", lambda x, b: jnp.where(x > b, x, b), jnp.uint32),
    ]
    for name, op, dt in cases:
        if dt == jnp.float32:
            a = jnp.asarray(rng.uniform(1.0, 1.0001, (R, n)).astype(np.float32))
            b = jnp.asarray(rng.uniform(1.0, 1.0001, (R, n)).astype(np.float32))
        else:
            a = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(dt))
            b = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(dt))
        run = make_bench(op, dt)
        jax.block_until_ready(run(a, b))
        dt_s = timeit(lambda: jax.block_until_ready(run(a, b)), iters=5, warmup=1)
        print(f"{name:24s} {total_ops/dt_s/1e12:8.3f} T lane-ops/s   ({dt_s*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
