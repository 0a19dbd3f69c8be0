"""Co-Z engine MSM differential tests vs the Python bigint oracle.

Same matrix as tests/test_msm_sorted.py (the reference's window x signedness
sweep, `ag-cuda-ec/src/multiexp.rs:93-144`, plus adversarial digit
distributions) — run through the inversion-free scaled-affine engine
(ops/msm_coz.py), whose correctness additionally depends on the running
common-scale bookkeeping across rounds.
"""

import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import MultiexpKernel
from tpu_ec.ops.msm_coz import default_window_size_coz

# whole-module: multi-minute XLA-CPU compiles (see pytest.ini)
pytestmark = pytest.mark.slow

_KERNELS: dict = {}


def run_case(spec, pts, ks, **kw):
    ops = point_ops(spec)
    kern = kw.pop("kern", None) or _KERNELS.setdefault(spec.name, MultiexpKernel(spec))
    out = kern.multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), method="coz", **kw
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


@pytest.mark.parametrize("n", [1, 2, 33])
def test_small_vs_oracle(n):
    spec = BN254_G1
    pts = oracle.random_points(spec, n, seed=n)
    ks = oracle.random_scalars(spec, n, seed=n + 1)
    run_case(spec, pts, ks, window_size=4)


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


def test_adversarial_equal_scalars():
    """All scalars identical -> every window is ONE maximal run; exercises
    the constant-size fori halving rounds to their worst-case depth."""
    spec = BN254_G1
    n = 64
    pts = oracle.random_points(spec, n, seed=4)
    k = oracle.random_scalars(spec, 1, seed=5)[0]
    run_case(spec, pts, [k] * n, window_size=4)


def test_duplicate_points():
    """Repeated bases hit the P == Q tangent select inside the co-Z add."""
    spec = BN254_G1
    n = 64
    base = oracle.random_points(spec, 4, seed=6)
    pts = [base[i % 4] for i in range(n)]
    ks = oracle.random_scalars(spec, n, seed=7)
    run_case(spec, pts, ks, window_size=4)


def test_cancelling_pairs():
    """P and -P with equal scalars inside one bucket: the cancel select must
    produce identity mid-round and keep the shared scale consistent."""
    spec = BN254_G1
    base = oracle.random_points(spec, 8, seed=12)
    pts = base + [oracle.neg(spec, p) for p in base]
    k = oracle.random_scalars(spec, 1, seed=13)[0]
    run_case(spec, pts, [k] * 16, window_size=4)


@pytest.mark.parametrize("w", [2, 8])
def test_window_sweep(w):
    spec = BN254_G1
    n = 40
    pts = oracle.random_points(spec, n, seed=w)
    ks = oracle.random_scalars(spec, n, seed=w + 1)
    run_case(spec, pts, ks, window_size=w)


def test_chunked_driver():
    spec = BN254_G1
    n = 80
    kern = MultiexpKernel(spec, chunk_size=32)
    pts = oracle.random_points(spec, n, seed=8)
    ks = oracle.random_scalars(spec, n, seed=9)
    run_case(spec, pts, ks, kern=kern, window_size=4)


def test_bls12_381_g1():
    spec = BLS12_381_G1
    pts = oracle.random_points(spec, 33, seed=10)
    ks = oracle.random_scalars(spec, 33, seed=11)
    run_case(spec, pts, ks, window_size=4)


def test_auto_method_dispatch():
    """method='auto' routes G1 to the co-Z engine (and still matches)."""
    spec = BN254_G1
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 16, seed=14)
    ks = oracle.random_scalars(spec, 16, seed=15)
    kern = _KERNELS.setdefault(spec.name, MultiexpKernel(spec))
    out = kern.multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), window_size=4
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


def test_default_window_sane():
    for n in (1, 100, 1 << 12, 1 << 16, 1 << 20, 1 << 24):
        assert 2 <= default_window_size_coz(n) <= 16
