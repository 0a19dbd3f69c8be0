"""Separate fixed per-dispatch overhead from marginal compute cost.

Runs the same dependent-multiply kernel at K = 8 / 64 / 512 rounds and
n = 2^15 / 2^18 lanes; if wall time is flat, dispatch dominates.
Also measures a chain of D dependent pallas_calls inside ONE jit to see
whether overhead is per-jit-dispatch or per-kernel-launch.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ec.utils.measure import timeit

R = 64


def chain_mul(K, n, grid_blocks):
    C = n // grid_blocks
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]
        b = b_ref[:]
        for _ in range(K):
            x = x * b + jnp.uint32(1)
        o_ref[:] = x
    bspec = pl.BlockSpec((R, C), lambda i: (0, i), memory_space=pltpu.VMEM)
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((R, n), jnp.uint32),
            grid=(grid_blocks,), in_specs=[bspec, bspec], out_specs=bspec,
        )(a, b)
    return run


def depth_calls(D, n):
    C = 512
    def kernel(a_ref, o_ref):
        o_ref[:] = a_ref[:] * jnp.uint32(3) + jnp.uint32(1)
    bspec = pl.BlockSpec((R, C), lambda i: (0, i), memory_space=pltpu.VMEM)
    def one(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((R, n), jnp.uint32),
            grid=(n // C,), in_specs=[bspec], out_specs=bspec,
        )(x)
    @jax.jit
    def run(a):
        x = a
        for _ in range(D):
            x = one(x)
        return x
    return run


def main():
    rng = np.random.default_rng(0)
    for n in (1 << 15, 1 << 18):
        a = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(np.uint32))
        b = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(np.uint32))
        for K in (8, 64, 512):
            run = chain_mul(K, n, max(1, n // 512))
            jax.block_until_ready(run(a, b))
            dt = timeit(lambda: jax.block_until_ready(run(a, b)), iters=5, warmup=1)
            ops = R * n * K
            print(f"n=2^{n.bit_length()-1} K={K:4d}: {dt*1e3:8.2f} ms  {ops/dt/1e12:7.3f} T ops/s")

    n = 1 << 15
    a = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(np.uint32))
    for D in (1, 4, 16, 64):
        run = depth_calls(D, n)
        jax.block_until_ready(run(a))
        dt = timeit(lambda: jax.block_until_ready(run(a)), iters=5, warmup=1)
        print(f"chain of {D:3d} pallas_calls: {dt*1e3:8.2f} ms  ({dt/D*1e6:.0f} us/call)")


if __name__ == "__main__":
    main()
