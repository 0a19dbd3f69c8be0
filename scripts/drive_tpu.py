"""TPU drive: exercise the public package end-to-end on the real chip,
checking bit-exactness against Python bigints."""
import time

import jax
print("devices:", jax.devices())

from tpu_ec.fields import field_ops, BLS12_381_FR
from tpu_ec.ops.ntt import FftKernel, ntt_ref
from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.curves.point import point_ops

# -- field ops
f = field_ops(BLS12_381_FR); p = f.spec.modulus
a = f.from_ints([3, p - 1, 12345]); b = f.from_ints([5, p - 1, 98765])
assert f.to_ints(f.mul(a, b)) == [15, ((p-1)*(p-1)) % p, (12345*98765) % p]
assert f.to_ints(f.add(a, b)) == [8, (2*(p-1)) % p, 111110]
print("field ops OK")

# -- NTT 2^12
import random
rng = random.Random(1)
n = 1 << 12
vals = [rng.randrange(p) for c in range(n)]
x = f.from_ints(vals)
kern = FftKernel(BLS12_381_FR)
t0 = time.time(); y = jax.block_until_ready(kern.radix_fft(x)); t1 = time.time()
got = f.to_ints(y)
assert got == ntt_ref(BLS12_381_FR, vals), "NTT mismatch"
t2 = time.time(); y2 = jax.block_until_ready(kern.radix_fft(x)); t3 = time.time()
print(f"NTT 2^12 OK (first {t1-t0:.2f}s, steady {t3-t2:.4f}s)")

# -- EC layer
spec = BLS12_381_G1
ops = point_ops(spec)
pts = oracle.random_points(spec, 4, seed=40)
ks = oracle.random_scalars(spec, 4, seed=41)
P = ops.to_jacobian(ops.from_affine_ints(pts))
got = ops.to_affine_ints(ops.to_affine(ops.double(P)))
assert got == [oracle.add(spec, q, q) for q in pts], "EC double mismatch"
k = ops.scalars_to_limbs(ks)
t0 = time.time()
got = ops.to_affine_ints(ops.to_affine(ops.scalar_mul(P, k)))
t1 = time.time()
assert got == [oracle.scalar_mul(spec, q, c) for q, c in zip(pts, ks)], "scalar_mul mismatch"
print(f"EC double + scalar_mul OK ({t1-t0:.2f}s incl compile)")
print("TPU DRIVE PASSED")

# -- MSM on chip
from tpu_ec.ops.msm import msm as msm_fn
n = 64
pts2 = oracle.random_points(spec, n, seed=50)
ks2 = oracle.random_scalars(spec, n, seed=51)
out = msm_fn(spec, ops.from_affine_ints(pts2), ops.scalars_to_limbs(ks2),
             window_size=8, num_groups=8)
got = ops.to_affine_ints(ops.to_affine(out))[0]
assert got == oracle.msm(spec, pts2, ks2), "MSM mismatch on TPU"
print("MSM OK on TPU")

# -- EC-FFT on chip
from tpu_ec.ops.ec_fft import EcFftKernel
pts3 = oracle.random_points(spec, 4, seed=52)
P3 = ops.to_jacobian(ops.from_affine_ints(pts3))
ek = EcFftKernel(spec)
back = ek.radix_ec_fft(ek.radix_ec_fft(P3), inverse=True)
assert ops.to_affine_ints(ops.to_affine(back)) == pts3, "EC-FFT roundtrip mismatch"
print("EC-FFT OK on TPU")
print("TPU DRIVE PASSED (full)")
