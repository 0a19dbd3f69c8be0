"""EC-FFT differential tests.

The reference checks EC-FFT against `ark_poly::Radix2EvaluationDomain::fft`
applied to the scalars of the points (`ag-cuda-ec/src/ec_fft.rs:111-142`,
degrees 2^4..2^7).  Same idea here, using the Fr-linearity of the group FFT:
if P_j = c_j * G then FFT(P)_k = NTT(c)_k * G, with NTT(c) computed by the
independent Python bigint oracle (ops.ntt.ntt_ref).
"""

import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.ec_fft import EcFftKernel
from tpu_ec.ops.ntt import ntt_ref


def _points_from_coeffs(spec, coeffs):
    g = oracle.generator(spec)
    return [oracle.scalar_mul(spec, g, c) for c in coeffs]


@pytest.mark.parametrize("log_n", [2, 4])
def test_ec_fft_vs_field_ntt(log_n):
    spec = BN254_G1
    ops = point_ops(spec)
    n = 1 << log_n
    coeffs = [c % spec.scalar.modulus for c in oracle.random_scalars(spec, n, seed=31)]
    pts = _points_from_coeffs(spec, coeffs)
    P = ops.to_jacobian(ops.from_affine_ints(pts))
    out = EcFftKernel(spec).radix_ec_fft(P)
    got = ops.to_affine_ints(ops.to_affine(out))
    expected_scalars = ntt_ref(spec.scalar, coeffs)
    g = oracle.generator(spec)
    expected = [oracle.scalar_mul(spec, g, c) for c in expected_scalars]
    assert got == expected


def test_ec_fft_roundtrip():
    spec = BLS12_381_G1
    ops = point_ops(spec)
    n = 4
    pts = oracle.random_points(spec, n, seed=32)
    P = ops.to_jacobian(ops.from_affine_ints(pts))
    kern = EcFftKernel(spec)
    back = kern.radix_ec_fft(kern.radix_ec_fft(P), inverse=True)
    got = ops.to_affine_ints(ops.to_affine(back))
    assert got == pts


def test_ec_fft_many():
    spec = BN254_G1
    ops = point_ops(spec)
    batches = [oracle.random_points(spec, 4, seed=s) for s in (33, 34)]
    Ps = [ops.to_jacobian(ops.from_affine_ints(b)) for b in batches]
    kern = EcFftKernel(spec)
    outs = kern.radix_ec_fft_many(Ps)
    # consistency with single calls
    for P, out in zip(Ps, outs):
        single = kern.radix_ec_fft(P)
        a = ops.to_affine_ints(ops.to_affine(out))
        b = ops.to_affine_ints(ops.to_affine(single))
        assert a == b


@pytest.mark.slow
def test_ec_fft_vs_native_at_scale():
    """2^8 EC-FFT vs the native C++ EC-FFT (C30 at-scale gap: the ref
    sweeps 2^1-2^20 on hardware, ec-gpu-proxy/tests/fft.rs:87-176; the
    chip-scale sweep lives in scripts/bench_ec_fft_tpu.py)."""
    from tpu_ec.native import available, native_curve

    if not available():
        pytest.skip("native oracle unavailable")
    spec = BN254_G1
    ops = point_ops(spec)
    n = 1 << 8
    pts = oracle.random_points(spec, n, seed=36)
    P = ops.to_jacobian(ops.from_affine_ints(pts))
    out = EcFftKernel(spec).radix_ec_fft(P)
    got = ops.to_affine_ints(ops.to_affine(out))
    nat = native_curve(spec)
    jac = nat.from_affine(nat.affine_from_points(pts))
    want = nat.affine_to_points(nat.to_affine(nat.ec_fft(jac)))
    assert got == want
