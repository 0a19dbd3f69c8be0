"""Probe where mulmod cycles actually go: raw per-op marginal costs on
wide blocks, product-only vs full V2c mul, and block-size sensitivity."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ec.fields.params import BLS12_381_FQ, LIMB_BITS, LIMB_MASK
from tpu_ec.utils.measure import timeit
from scripts.exp_mont_v2 import mul_prod_list, mul_v2c, norm_list

SPEC = BLS12_381_FQ
L = SPEC.n_limbs
U32 = jnp.uint32
MASK = LIMB_MASK
OVH = 0.0285


def raw_op_chain(op, K, R, C, nblk):
    def kernel(a_ref, b_ref, o_ref):
        x = a_ref[:]
        b = b_ref[:]
        for _ in range(K):
            x = op(x, b)
        o_ref[:] = x
    n = nblk * C
    bspec = pl.BlockSpec((R, C), lambda i: (0, i), memory_space=pltpu.VMEM)
    return jax.jit(lambda a, b: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((R, n), U32), grid=(nblk,),
        in_specs=[bspec, bspec], out_specs=bspec)(a, b))


def bench_raw():
    rng = np.random.default_rng(0)
    R, C, nblk, K = 256, 2048, 8, 256
    n = nblk * C
    a = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 15, (R, n)).astype(np.uint32))
    for name, op, ops_per in [
        ("mul", lambda x, y: x * y, 1),
        ("add", lambda x, y: x + y, 1),
        ("mul+mask+shift+2add", lambda x, y: ((x * y) & MASK) + ((x >> 16) + y), 4),
        ("mask", lambda x, y: (x & MASK) | y, 2),
    ]:
        f = raw_op_chain(op, K, R, C, nblk)
        jax.block_until_ready(f(a, b))
        dt = timeit(lambda: jax.block_until_ready(f(a, b)), iters=3, warmup=1)
        lane_ops = R * n * K * ops_per
        print(f"raw {name:22s}: {(dt-OVH)*1e3:7.2f} ms marginal -> {lane_ops/(dt-OVH)/1e12:6.2f} T lane-ops/s", flush=True)


def v2c_variant(n, TB, reps, mode):
    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        p = [p_ref[i] for i in range(L)]
        npr = [np_ref[i] for i in range(L)]
        bb = [b_ref[i] for i in range(L)]
        x = [a_ref[i] for i in range(L)]
        for _ in range(reps):
            if mode == "full":
                x = mul_v2c(x, bb, p, npr)
            elif mode == "prod":
                t = mul_prod_list(x, bb)
                d, _ = norm_list(t)
                x = d[L:]
            elif mode == "copy":
                x = [v + w for v, w in zip(x, bb)]
        for i in range(L):
            o_ref[i] = x[i]

    bspec = pl.BlockSpec((L, 8, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((L, 8, n // 8), U32),
        grid=(n // (8 * TB),),
        in_specs=[cspec, cspec, bspec, bspec], out_specs=bspec)
    pc = jnp.asarray(np.asarray(SPEC.p_limbs, np.uint32)[:, None, None])
    nc = jnp.asarray(np.asarray(SPEC.nprime_limbs, np.uint32)[:, None, None])
    return jax.jit(lambda a, b: call(pc, nc, a, b))


def bench_v2c():
    rng = np.random.default_rng(0)
    n = 1 << 18
    for TB, reps, mode in [
        (512, 8, "copy"), (512, 8, "prod"), (512, 8, "full"),
        (2048, 8, "full"), (512, 2, "full"),
    ]:
        a = jnp.asarray(rng.integers(0, 1 << 16, (L, 8, n // 8)).astype(np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, (L, 8, n // 8)).astype(np.uint32))
        f = v2c_variant(n, TB, reps, mode)
        t0 = time.time()
        jax.block_until_ready(f(a, b))
        ct = time.time() - t0
        dt = timeit(lambda: jax.block_until_ready(f(a, b)), iters=3, warmup=1)
        print(f"V2c TB={TB:5d} reps={reps} {mode:5s}: {(dt-OVH)/reps/n*1e9:6.2f} ns/mul  [compile {ct:.0f}s]", flush=True)


if __name__ == "__main__":
    bench_raw()
    bench_v2c()
