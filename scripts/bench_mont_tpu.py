"""TPU: Pallas mont_mul kernel vs jnp FieldOps.mul — correctness + throughput."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
import time
import jax, jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
from tpu_ec.fields import BLS12_381_FR, field_ops
from tpu_ec.ops.pallas.mont import mont_mul_planes, to_planes, from_planes, PlaneField

spec = BLS12_381_FR
f = field_ops(spec)
N = 1 << 20
rng = np.random.default_rng(3)
a = jnp.asarray(rng.integers(0, 1 << 16, (N, f.L), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, (N, f.L), dtype=np.uint32))
ap, bp = to_planes(a), to_planes(b)

# correctness on a slice
want = np.asarray(f.mul(a[:2048], b[:2048]))
got = np.asarray(from_planes(mont_mul_planes(spec, ap[:, :2048], bp[:, :2048], interpret=False)))
assert (got == want).all(), "pallas TPU mismatch vs jnp"
print("pallas mont_mul bit-exact vs jnp on TPU")

for blk in (256, 512, 1024, 2048):
    fn = jax.jit(lambda x, y: mont_mul_planes(spec, x, y, block=blk, interpret=False))
    out = jax.block_until_ready(fn(ap, bp))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(ap, out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"pallas block={blk}: {N/dt/1e6:.1f} M mulmod/s  ({dt*1e3:.2f} ms)")

jf = jax.jit(f.mul)
out = jax.block_until_ready(jf(a, b))
t0 = time.perf_counter()
for _ in range(10):
    out = jf(a, out)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 10
print(f"jnp path:   {N/dt/1e6:.1f} M mulmod/s  ({dt*1e3:.2f} ms)")
