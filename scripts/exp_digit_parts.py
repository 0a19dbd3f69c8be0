"""Time digit-NTT components at 2^20/leaf=7 shapes; layout variants."""
import os as _os, sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
import jax
import jax.numpy as jnp
import numpy as np

from tpu_ec.fields import BLS12_381_FR
from tpu_ec.ops import ntt_digit as nd
from tpu_ec.utils.measure import timeit

spec = BLS12_381_FR
rng = np.random.default_rng(0)
n2, n1, M = 128, 8192, 1
d_in, d_out = 37, 37
dom = nd.get_digit_domain(spec, 20, False, 7)
A = jax.device_put(jnp.asarray(dom.matrices[7]))  # (e, k, j, d)
At = jax.device_put(jnp.asarray(np.transpose(dom.matrices[7], (0, 1, 3, 2)).copy()))  # (e, k, d, j)
T = jax.device_put(jnp.asarray(dom.inter[(20, 13)]))

x4 = jnp.asarray(rng.integers(0, 128, (d_in, n2, n1 * M), dtype=np.int8))
macs = (n2 * d_out) * (n2 * d_in) * n1 * M


@jax.jit
def mm(A, x4):
    return jax.lax.dot_general(
        A, x4, (((2, 3), (1, 0)), ((), ())), preferred_element_type=jnp.int32
    )


@jax.jit
def mm_t(At, x4):
    return jax.lax.dot_general(
        At, x4, (((3, 2), (1, 0)), ((), ())), preferred_element_type=jnp.int32
    )


cols = jax.block_until_ready(mm(A, x4))
dt = timeit(mm, A, x4, iters=5)
print(f"matmul A(e,k,j,d): {dt*1e3:.2f} ms  {macs/dt/1e12:.1f} T", flush=True)
c2 = jax.block_until_ready(mm_t(At, x4))
dt = timeit(mm_t, At, x4, iters=5)
print(f"matmul A(e,k,d,j): {dt*1e3:.2f} ms  {macs/dt/1e12:.1f} T  same={bool((np.asarray(c2)==np.asarray(cols)).all())}", flush=True)

for blk in (512, 1024):
    @jax.jit
    def inter(cols, T):
        tfull = jnp.broadcast_to(T[:, :, :, None], (16, n2, n1, M)).reshape(16, -1)
        return nd.inter_twiddle(
            spec, cols.reshape(d_out, -1), tfull, interpret=False, block=blk
        )

    y = jax.block_until_ready(inter(cols, T))
    dt = timeit(inter, cols, T, iters=5)
    print(f"inter kernel blk={blk}: {dt*1e3:.2f} ms", flush=True)


@jax.jit
def transpose_i8(y):
    ydig = y.reshape(37, n2, n1, M)
    return jnp.swapaxes(ydig, 1, 2).reshape(37, n1, n2 * M) + 0


@jax.jit
def transpose_i32(y):
    ydig = y.reshape(37, n2, n1, M).astype(jnp.int32)
    return (jnp.swapaxes(ydig, 1, 2).reshape(37, n1, n2 * M) + 0).astype(jnp.int8)


z = jax.block_until_ready(transpose_i8(y))
dt = timeit(transpose_i8, y, iters=5)
print(f"transpose i8: {dt*1e3:.2f} ms", flush=True)
z = jax.block_until_ready(transpose_i32(y))
dt = timeit(transpose_i32, y, iters=5)
print(f"transpose via i32: {dt*1e3:.2f} ms", flush=True)


@jax.jit
def entry(xp):
    return nd.split_digits_rows(xp, d_in)


xp = jnp.asarray(rng.integers(0, 1 << 16, (16, 1 << 20), dtype=np.uint32))
e = jax.block_until_ready(entry(xp))
dt = timeit(entry, xp, iters=5)
print(f"entry split: {dt*1e3:.2f} ms", flush=True)

# level-2/3 matmul shapes: free dim = n2*M grows
x2 = jnp.asarray(rng.integers(0, 128, (d_in, 128, 64 * 128), dtype=np.int8))
cols2 = jax.block_until_ready(mm(A, x2))
dt = timeit(mm, A, x2, iters=5)
print(f"matmul level2 (free={64*128}): {dt*1e3:.2f} ms", flush=True)
