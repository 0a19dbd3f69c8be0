"""End-to-end drive on the real TPU: exercise every public layer and check
bit-exactness against Python bigints.  Run:
PYTHONPATH=/root/.axon_site:/root/repo timeout 580 python -u scripts/drive_verify.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import random
import time

import jax
import numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), jax.devices())

# -- fields -----------------------------------------------------------------
from tpu_ec.fields import BLS12_381_FR, field_ops

f = field_ops(BLS12_381_FR)
p = f.spec.modulus
rng = random.Random(1)
xs = [rng.randrange(p) for _ in range(256)]
ys = [rng.randrange(p) for _ in range(256)]
a, b = f.from_ints(xs), f.from_ints(ys)
assert f.to_ints(f.mul(a, b)) == [x * y % p for x, y in zip(xs, ys)], "field mul"
assert f.to_ints(f.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)], "field add"
print(f"[{time.time()-t0:6.1f}s] fields OK")

# -- Pallas mont mul on chip --------------------------------------------------
from tpu_ec.ops.pallas.mont import mont_mul

got = f.to_ints(mont_mul(BLS12_381_FR, a, b))
assert got == [x * y % p for x, y in zip(xs, ys)], "pallas mont mul"
print(f"[{time.time()-t0:6.1f}s] pallas mont OK")

# -- NTT (jnp driver + Pallas kernel) ----------------------------------------
from tpu_ec.ops.ntt import FftKernel, ntt_ref
from tpu_ec.ops.pallas.ntt import PallasFftKernel

vals = [rng.randrange(p) for _ in range(1 << 10)]
x = f.from_ints(vals)
want = ntt_ref(BLS12_381_FR, vals)
assert f.to_ints(FftKernel(BLS12_381_FR).radix_fft(x)) == want, "jnp ntt"
assert f.to_ints(PallasFftKernel(BLS12_381_FR).radix_fft(x)) == want, "pallas ntt"
print(f"[{time.time()-t0:6.1f}s] ntt OK (2^10)")

# -- curves + MSM --------------------------------------------------------------
from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G2
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import msm

for spec, n in ((BLS12_381_G1, 64), (BN254_G2, 256)):
    ops = point_ops(spec)
    pts = oracle.random_points(spec, n, seed=3)
    ks = oracle.random_scalars(spec, n, seed=4)
    out = msm(spec, ops.from_affine_ints(pts), ops.scalars_to_limbs(ks),
              window_size=8, num_groups=4, method="lattice")
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    want = oracle.msm(spec, pts, ks)
    assert got == want, f"msm {spec.name}"
    # sorted engine (the default path) must agree on the same inputs
    out2 = msm(spec, ops.from_affine_ints(pts), ops.scalars_to_limbs(ks))
    assert ops.to_affine_ints(ops.to_affine(out2))[0] == want, f"sorted msm {spec.name}"
    print(f"[{time.time()-t0:6.1f}s] msm {spec.name} OK (n={n}, lattice+sorted)")

# -- KZG-style commit pipeline (NTT + MSM composed) ---------------------------
from tpu_ec.ops.pipeline import CommitPipeline
from tpu_ec.curves.params import BN254_G1

spec = BN254_G1
ops = point_ops(spec)
frk = field_ops(spec.scalar)
n = 64
coeffs = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
pts = oracle.random_points(spec, n, seed=5)
evals, commit = CommitPipeline(spec).commit(
    frk.from_ints(coeffs), ops.from_affine_ints(pts)
)
eval_ints = ntt_ref(spec.scalar, coeffs)
assert frk.to_ints(evals) == eval_ints, "pipeline ntt stage"
assert ops.to_affine_ints(ops.to_affine(commit))[0] == oracle.msm(spec, pts, eval_ints), "pipeline commit"
print(f"[{time.time()-t0:6.1f}s] commit pipeline OK (n={n})")

# -- EC-FFT --------------------------------------------------------------------
from tpu_ec.ops.ec_fft import EcFftKernel

spec = BLS12_381_G1
ops = point_ops(spec)
g = oracle.generator(spec)
coefs = [rng.getrandbits(48) for _ in range(16)]
pts = [oracle.scalar_mul(spec, g, c) for c in coefs]
jac = ops.to_jacobian(ops.from_affine_ints(pts))
y = EcFftKernel(spec).radix_ec_fft(jac)
want = [oracle.scalar_mul(spec, g, s) for s in ntt_ref(spec.scalar, coefs)]
assert ops.to_affine_ints(ops.to_affine(y)) == want, "ec fft"
print(f"[{time.time()-t0:6.1f}s] ec-fft OK")

print(f"[{time.time()-t0:6.1f}s] ALL TPU DRIVES PASS")
