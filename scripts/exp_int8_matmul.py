"""Spike: int8 x int8 -> int32 matmul throughput on the chip (plain XLA
dot_general and a Pallas kernel), exactness vs numpy."""
import os as _os, sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
M, K, B = 1024, 1152, 4096
A = rng.integers(-128, 128, (M, K), dtype=np.int8)
X = rng.integers(-128, 128, (K, B), dtype=np.int8)
Aj, Xj = jnp.asarray(A), jnp.asarray(X)


@jax.jit
def mm(a, x):
    return jax.lax.dot_general(
        a, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


out = jax.block_until_ready(mm(Aj, Xj))
want = A.astype(np.int32) @ X.astype(np.int32)
print("exact:", bool((np.asarray(out) == want).all()), flush=True)


# chained to defeat caching; dependency via cheap cast
@jax.jit
def chain(a, x, iters):
    def body(i, x):
        y = jax.lax.dot_general(
            a, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y & 127).astype(jnp.int8)[:K, :]

    return jax.lax.fori_loop(0, iters, body, x)


Xp = jnp.asarray(rng.integers(-128, 128, (K, B), dtype=np.int8))
Ap = jnp.asarray(rng.integers(-128, 128, (K, K), dtype=np.int8))
iters = 50
y = jax.block_until_ready(chain(Ap, Xp, 1))
t0 = time.perf_counter()
y = jax.block_until_ready(chain(Ap, Xp, iters))
dt = (time.perf_counter() - t0) / iters
macs = K * K * B
print(f"XLA s8 matmul ({K}x{K}x{B}): {macs/dt/1e12:.1f} T MACs/s ({dt*1e3:.2f} ms/iter)", flush=True)

# bf16 comparison
Af = jnp.asarray(rng.integers(0, 64, (K, K)).astype(np.float32), dtype=jnp.bfloat16)
Xf = jnp.asarray(rng.integers(0, 64, (K, B)).astype(np.float32), dtype=jnp.bfloat16)


@jax.jit
def chainf(a, x, iters):
    def body(i, x):
        y = jax.lax.dot_general(
            a, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return (y % 64.0).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, iters, body, x)


y = jax.block_until_ready(chainf(Af, Xf, 1))
t0 = time.perf_counter()
y = jax.block_until_ready(chainf(Af, Xf, iters))
dt = (time.perf_counter() - t0) / iters
print(f"XLA bf16 matmul ({K}x{K}x{B}): {macs/dt/1e12:.1f} T MACs/s ({dt*1e3:.2f} ms/iter)", flush=True)
