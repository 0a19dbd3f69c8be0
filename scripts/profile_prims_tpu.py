"""Measure the TPU primitive costs that drive MSM/NTT engine design.

Prints ns/row (or M ops/s) for: Montgomery mul, fused Jacobian add /
mixed-add, co-Z batched add, sort (narrow + wide payload), gather, scatter.
These numbers replace guessed heuristics (VERDICT r2 weak #7).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import time
import numpy as np
import jax
import jax.numpy as jnp

from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.utils.measure import timeit
from tpu_ec.utils.cache import enable_compilation_cache

SPEC = BLS12_381_G1


def bench(name, fn, n, iters=5):
    fn()  # compile
    dt = timeit(fn, iters=iters, warmup=1)
    print(f"{name:44s} {dt*1e3:9.2f} ms   {dt/n*1e9:8.2f} ns/row  {n/dt/1e6:10.1f} M rows/s")
    return dt


def main():
    enable_compilation_cache()
    ops = point_ops(SPEC)
    F = ops.fq
    L = F.L
    rng = np.random.default_rng(0)

    n = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 16, (L, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (L, n), dtype=np.uint32))

    from tpu_ec.ops.pallas.mont import mont_mul_planes
    mm = jax.jit(lambda a, b: mont_mul_planes(SPEC.base, a, b, interpret=False))
    bench(f"mont_mul_planes L={L} n=2^20", lambda: jax.block_until_ready(mm(a, b)), n)

    # Jacobian ops (fused pallas path), n = 2^18
    n2 = 1 << 18
    P = tuple(jnp.asarray(rng.integers(0, 1 << 16, (n2, L), dtype=np.uint32)) for _ in range(3))
    Q = tuple(jnp.asarray(rng.integers(0, 1 << 16, (n2, L), dtype=np.uint32)) for _ in range(3))
    A2 = tuple(jnp.asarray(rng.integers(0, 1 << 16, (n2, L), dtype=np.uint32)) for _ in range(2))
    jadd = jax.jit(ops.add)
    jmadd = jax.jit(ops.add_mixed)
    jdbl = jax.jit(ops.double)
    bench("jac_add (fused pallas) n=2^18", lambda: jax.block_until_ready(jadd(P, Q)), n2)
    bench("jac_add_mixed n=2^18", lambda: jax.block_until_ready(jmadd(P, A2)), n2)
    bench("jac_double n=2^18", lambda: jax.block_until_ready(jdbl(P)), n2)

    # co-Z batched add (includes partial-product tree)
    from tpu_ec.ops.pallas.affine import coz_add_batch, affine_add_batch
    B2 = tuple(jnp.asarray(rng.integers(0, 1 << 16, (n2, L), dtype=np.uint32)) for _ in range(2))
    cz = jax.jit(lambda A, B: coz_add_batch(SPEC.base, A, B, interpret=False))
    bench("coz_add_batch n=2^18", lambda: jax.block_until_ready(cz(A2, B2)), n2)

    # sort: key+idx, and key+wide payload
    n3 = 1 << 22
    key = jnp.asarray(rng.integers(0, 1 << 15, n3, dtype=np.int32))
    idx = jnp.arange(n3, dtype=jnp.int32)
    srt = jax.jit(lambda k, i: jax.lax.sort_key_val(k, i))
    bench("sort_key_val n=2^22", lambda: jax.block_until_ready(srt(key, idx)), n3)

    data = jnp.asarray(rng.integers(0, 1 << 16, (n3, 2 * L), dtype=np.uint32))
    def wide_sort(k, d):
        ops_in = [k] + [d[:, j] for j in range(2 * L)]
        return jax.lax.sort(ops_in, num_keys=1, is_stable=False)[0]
    ws = jax.jit(wide_sort)
    bench(f"sort + {2*L}-col payload n=2^22", lambda: jax.block_until_ready(ws(key, data)), n3)

    perm = jnp.asarray(rng.permutation(n3).astype(np.int32))
    g1 = jax.jit(lambda d, p: d[p])
    bench(f"gather ({2*L} cols) n=2^22", lambda: jax.block_until_ready(g1(data, perm)), n3)

    gp = jax.jit(lambda d, p: d[:, p])
    dataT = jnp.asarray(rng.integers(0, 1 << 16, (2 * L, n3), dtype=np.uint32))
    bench(f"gather planes ({2*L} rows) n=2^22", lambda: jax.block_until_ready(gp(dataT, perm)), n3)

    sc = jax.jit(lambda d, p: jnp.zeros_like(d).at[p].set(d, unique_indices=True))
    bench(f"scatter ({2*L} cols) n=2^22", lambda: jax.block_until_ready(sc(data, perm)), n3)

    # cumsum/cummax on n=2^22 (run-halving bookkeeping)
    cm = jax.jit(lambda k: jax.lax.cummax(k))
    bench("cummax n=2^22", lambda: jax.block_until_ready(cm(key)), n3)


if __name__ == "__main__":
    main()
