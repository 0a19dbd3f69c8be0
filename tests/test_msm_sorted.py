"""Sorted-engine MSM differential tests vs the Python bigint oracle.

Mirrors the reference's MSM test sweep (`ag-cuda-ec/src/multiexp.rs:93-144`
tests window sizes x signedness against arkworks) plus adversarial digit
distributions the GPU kernel never worries about (its serial bucket loop is
distribution-oblivious; our run-halving pipeline must prove worst-case runs
terminate).

Compile economy: every case at the same (n, window) shape reuses one
compiled program (MultiexpKernel caches per shape), so the matrix below
costs ~6 distinct XLA programs, not one per test.
"""

import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BLS12_381_G2, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.ops.msm_sorted import default_window_size_sorted

_KERNELS: dict = {}


def run_case(spec, pts, ks, **kw):
    ops = point_ops(spec)
    kern = kw.pop("kern", None) or _KERNELS.setdefault(spec.name, MultiexpKernel(spec))
    out = kern.multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), method="sorted", **kw
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


@pytest.mark.parametrize("n", [1, 2, 33])
@pytest.mark.slow
def test_small_vs_oracle(n):
    spec = BN254_G1
    pts = oracle.random_points(spec, n, seed=n)
    ks = oracle.random_scalars(spec, n, seed=n + 1)
    run_case(spec, pts, ks, window_size=4)


@pytest.mark.slow
def test_identities_and_zero_scalars():
    spec = BN254_G1
    n = 64
    pts = oracle.random_points(spec, n, seed=2)
    ks = oracle.random_scalars(spec, n, seed=3)
    pts[0] = None
    pts[5] = None
    ks[1] = 0
    ks[2] = 0
    run_case(spec, pts, ks, window_size=4)


@pytest.mark.slow
def test_adversarial_equal_scalars():
    """All scalars identical -> every window is ONE maximal run; exercises
    the constant-size fori halving rounds to their worst-case depth."""
    spec = BN254_G1
    n = 64
    pts = oracle.random_points(spec, n, seed=4)
    k = oracle.random_scalars(spec, 1, seed=5)[0]
    run_case(spec, pts, [k] * n, window_size=4)


@pytest.mark.slow
def test_duplicate_points():
    """Repeated bases hit the P == Q doubling select inside halving rounds."""
    spec = BN254_G1
    n = 64
    base = oracle.random_points(spec, 4, seed=6)
    pts = [base[i % 4] for i in range(n)]
    ks = oracle.random_scalars(spec, n, seed=7)
    run_case(spec, pts, ks, window_size=4)


@pytest.mark.parametrize("w", [2, 8])
@pytest.mark.slow
def test_window_sweep(w):
    spec = BN254_G1
    n = 40
    pts = oracle.random_points(spec, n, seed=w)
    ks = oracle.random_scalars(spec, n, seed=w + 1)
    run_case(spec, pts, ks, window_size=w)


@pytest.mark.slow
def test_chunked_driver():
    """Memory-bounded chunking (multiexp.rs:71-93 parity): 3 chunks with a
    ragged tail, partials combined on device."""
    spec = BN254_G1
    n = 80
    kern = MultiexpKernel(spec, chunk_size=32)
    pts = oracle.random_points(spec, n, seed=8)
    ks = oracle.random_scalars(spec, n, seed=9)
    run_case(spec, pts, ks, kern=kern, window_size=4)


@pytest.mark.slow  # sorted-engine G2 compile ~8 min on XLA-CPU
def test_bls12_381_g1_and_g2():
    for spec, n in ((BLS12_381_G1, 33), (BLS12_381_G2, 9)):
        pts = oracle.random_points(spec, n, seed=10)
        ks = oracle.random_scalars(spec, n, seed=11)
        run_case(spec, pts, ks, window_size=4)


def test_default_window_sane():
    for n in (1, 100, 1 << 12, 1 << 16, 1 << 20, 1 << 24):
        assert 2 <= default_window_size_sorted(n) <= 16
