"""TPU: Pallas NTT vs jnp NTT throughput + correctness."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))
import time
import jax, jax.numpy as jnp
import numpy as np
import random

from tpu_ec.fields import BLS12_381_FR, field_ops
from tpu_ec.ops.ntt import FftKernel, ntt_ref
from tpu_ec.ops.pallas.ntt import PallasFftKernel
from tpu_ec.ops.pallas.mont import to_planes

spec = BLS12_381_FR
f = field_ops(spec)

# correctness at 2^12 vs oracle on TPU
r = random.Random(9)
vals = [r.randrange(spec.modulus) for _ in range(1 << 12)]
x = f.from_ints(vals)
pk = PallasFftKernel(spec, interpret=False)
assert f.to_ints(pk.radix_fft(x)) == ntt_ref(spec, vals), "TPU pallas NTT mismatch"
print("pallas NTT bit-exact on TPU @ 2^12")

for log_n in (16, 20, 22):
    n = 1 << log_n
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32))
    fn = pk.radix_fft_planes  # already jitted; an outer jit would re-bake tables
    y = jax.block_until_ready(fn(xp))
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    print(f"pallas NTT 2^{log_n}: {n/dt/1e6:.2f} M elem/s ({dt*1e3:.1f} ms)")

# jnp comparison at 2^16
n = 1 << 16
rng = np.random.default_rng(6)
xa = jnp.asarray(rng.integers(0, 1 << 16, (n, f.L), dtype=np.uint32))
jk = FftKernel(spec)
y = jax.block_until_ready(jk.radix_fft(xa))
t0 = time.perf_counter()
for _ in range(3):
    y = jk.radix_fft(y)
jax.block_until_ready(y)
dt = (time.perf_counter() - t0) / 3
print(f"jnp    NTT 2^16: {n/dt/1e6:.2f} M elem/s ({dt*1e3:.1f} ms)")
