"""Native C++ layer tests: differential vs the Python bigint oracle, plus
three-way cross-backend consistency (native C++ / JAX / bigint) — the analog
of the reference's CUDA-vs-OpenCL-vs-limb-width cross-validation
(`ag-build/src/tests/program.rs:85-120`)."""

import random

import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import ALL_CURVES, BN254_G1
from tpu_ec.fields.params import ALL_FIELDS, BLS12_381_FR, BN254_FR
from tpu_ec.native import available, native_curve, native_field
from tpu_ec.ops.ntt import ntt_ref

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")

R = random.Random(0xC0FFEE)


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_field_ops_vs_bigint(spec):
    f = native_field(spec)
    p = spec.modulus
    xs = [R.randrange(p) for _ in range(20)] + [0, 1, p - 1]
    ys = [R.randrange(p) for _ in range(20)] + [1, p - 1, p - 1]
    a, b = f.from_ints(xs), f.from_ints(ys)
    assert f.to_ints(f.mul(a, b)) == [x * y % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.sqr(a)) == [x * x % p for x in xs]
    assert f.to_ints(f.neg(a)) == [(-x) % p for x in xs]
    nz = [x for x in xs if x]
    inv = f.to_ints(f.inv_(f.from_ints(nz)))
    assert inv == [pow(x, -1, p) for x in nz]


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_halflimb_conversion_roundtrip(spec):
    """The u64 <-> 16-bit-half-limb bridge used to marshal device arrays."""
    f = native_field(spec)
    a = f.from_ints([R.randrange(spec.modulus) for _ in range(7)])
    assert np.array_equal(f.from_halflimbs(f.to_halflimbs(a)), a)


@pytest.mark.parametrize("spec", [BLS12_381_FR, BN254_FR], ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [0, 1, 4, 8])
def test_ntt_vs_bigint(spec, log_n):
    f = native_field(spec)
    vals = [R.randrange(spec.modulus) for _ in range(1 << log_n)]
    x = f.from_ints(vals)
    assert f.to_ints(f.ntt(x)) == ntt_ref(spec, vals)
    assert f.to_ints(f.ntt(f.ntt(x), inverse=True)) == vals


def test_ntt_threads_agree():
    """Parallel vs serial consistency (fft_cpu.rs:127-167 parity)."""
    f = native_field(BLS12_381_FR)
    vals = [R.randrange(f.spec.modulus) for _ in range(1 << 10)]
    x = f.from_ints(vals)
    assert np.array_equal(f.ntt(x, nthreads=1), f.ntt(x, nthreads=4))


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_ec_ops_vs_oracle(spec):
    nc = native_curve(spec)
    g = oracle.generator(spec)
    pts = [oracle.scalar_mul(spec, g, R.getrandbits(64) | 1) for _ in range(6)]
    pts += [None, g]
    ks = [R.randrange(spec.scalar.modulus) for _ in range(len(pts))]
    aff = nc.affine_from_points(pts)
    jac = nc.from_affine(aff)
    got = nc.affine_to_points(nc.to_affine(nc.add(jac, jac[::-1].copy())))
    assert got == [oracle.add(spec, p, q) for p, q in zip(pts, pts[::-1])]
    got = nc.affine_to_points(nc.to_affine(nc.double(jac)))
    assert got == [oracle.add(spec, p, p) for p in pts]
    got = nc.affine_to_points(
        nc.to_affine(nc.scalar_mul(aff, nc.scalars_from_ints(ks)))
    )
    assert got == [oracle.scalar_mul(spec, p, k) for p, k in zip(pts, ks)]


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
@pytest.mark.parametrize("window", [0, 1, 5, 9])
def test_msm_vs_oracle(spec, window):
    """Window sweep parity with ag-cuda-ec/src/multiexp.rs:93-144."""
    nc = native_curve(spec)
    g = oracle.generator(spec)
    pts = [oracle.scalar_mul(spec, g, R.getrandbits(64) | 1) for _ in range(15)]
    pts.append(None)
    ks = [R.randrange(spec.scalar.modulus) for _ in range(15)] + [3]
    ks[2] = 0  # zero scalar edge case
    assert nc.msm_points(pts, ks, window=window) == oracle.msm(spec, pts, ks)


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_ec_fft_roundtrip_and_semantics(spec):
    nc = native_curve(spec)
    g = oracle.generator(spec)
    n = 8
    coefs = [R.getrandbits(40) for _ in range(n)]
    pts = [oracle.scalar_mul(spec, g, c) for c in coefs]
    jac = nc.from_affine(nc.affine_from_points(pts))
    y = nc.ec_fft(jac)
    # NTT in the exponent: ECFFT(c*G)_k = NTT(c)_k * G
    want = [oracle.scalar_mul(spec, g, s) for s in ntt_ref(spec.scalar, coefs)]
    assert nc.affine_to_points(nc.to_affine(y)) == want
    back = nc.ec_fft(y, inverse=True)
    assert nc.affine_to_points(nc.to_affine(back)) == pts


def test_cross_backend_field_mul():
    """native C++ u64 CIOS vs JAX 16-bit-limb SOS vs Python bigint: all three
    must agree bit-exactly (program.rs:85-120's cross-backend discipline)."""
    from tpu_ec.fields import field_ops

    spec = BLS12_381_FR
    nf = native_field(spec)
    jf = field_ops(spec)
    xs = [R.randrange(spec.modulus) for _ in range(32)]
    ys = [R.randrange(spec.modulus) for _ in range(32)]
    want = [x * y % spec.modulus for x, y in zip(xs, ys)]
    assert nf.to_ints(nf.mul(nf.from_ints(xs), nf.from_ints(ys))) == want
    assert jf.to_ints(jf.mul(jf.from_ints(xs), jf.from_ints(ys))) == want


def test_cross_backend_msm():
    """Native MSM vs JAX lattice MSM on the same inputs."""
    from tpu_ec.curves.point import point_ops
    from tpu_ec.ops.msm import msm as jax_msm

    spec = BN254_G1
    nc = native_curve(spec)
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 16, seed=5)
    ks = oracle.random_scalars(spec, 16, seed=6)
    got_native = nc.msm_points(pts, ks)
    out = jax_msm(spec, ops.from_affine_ints(pts), ops.scalars_to_limbs(ks))
    got_jax = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got_native == got_jax == oracle.msm(spec, pts, ks)
