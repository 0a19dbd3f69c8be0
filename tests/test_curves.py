"""EC point-op differential tests vs the Python affine oracle.

Mirrors the reference's EC test strategy: random-input GPU-vs-arkworks
comparisons (`ag-build/src/tests/test_ec.rs:8-37` does 100 random scalar
muls on G1), extended here with explicit edge cases (identity operands,
P+P, P+(-P)) that the branchless select paths must hit, and with G2 run
through the *same* generic code (builder.rs:66-72 genericity parity).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import ALL_CURVES, BLS12_381_G1, BLS12_381_G2, BN254_G1, BN254_G2
from tpu_ec.curves.point import point_ops

CURVES_SMALL = [BLS12_381_G1, BN254_G1]
pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _device_points(ops, pts):
    return ops.to_jacobian(ops.from_affine_ints(pts))


def _check(ops, jac, expected):
    got = ops.to_affine_ints(ops.to_affine(jac))
    assert got == expected


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_generator_on_curve(spec):
    assert oracle.is_on_curve(spec, oracle.generator(spec))


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_affine_roundtrip(spec):
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 4, seed=7) + [None]
    jac = _device_points(ops, pts)
    _check(ops, jac, pts)


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_double(spec):
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 4, seed=1) + [None]
    jac = _device_points(ops, pts)
    expected = [oracle.add(spec, p, p) for p in pts]
    _check(ops, ops.double(jac), expected)


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_add_general_and_edges(spec):
    ops = point_ops(spec)
    a = oracle.random_points(spec, 3, seed=2)
    b = oracle.random_points(spec, 3, seed=3)
    # edge rows: P+0, 0+Q, 0+0, P+P (same -> double), P+(-P) (-> identity)
    pa = a + [a[0], None, None, a[1], a[2]]
    pb = b + [None, b[0], None, a[1], oracle.neg(spec, a[2])]
    expected = [oracle.add(spec, p, q) for p, q in zip(pa, pb)]
    P = _device_points(ops, pa)
    Q = _device_points(ops, pb)
    _check(ops, ops.add(P, Q), expected)


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_add_mixed_matches_add(spec):
    ops = point_ops(spec)
    a = oracle.random_points(spec, 3, seed=4)
    b = oracle.random_points(spec, 3, seed=5)
    pa = a + [a[0], None, a[1], a[2]]
    pb = b + [None, b[0], a[1], oracle.neg(spec, a[2])]
    expected = [oracle.add(spec, p, q) for p, q in zip(pa, pb)]
    P = _device_points(ops, pa)
    A = ops.from_affine_ints(pb)
    _check(ops, ops.add_mixed(P, A), expected)


@pytest.mark.parametrize("spec", ALL_CURVES, ids=lambda s: s.name)
def test_sub_neg(spec):
    ops = point_ops(spec)
    a = oracle.random_points(spec, 3, seed=6)
    b = oracle.random_points(spec, 3, seed=7)
    expected = [oracle.add(spec, p, oracle.neg(spec, q)) for p, q in zip(a, b)]
    P, Q = _device_points(ops, a), _device_points(ops, b)
    _check(ops, ops.sub(P, Q), expected)


@pytest.mark.parametrize("spec", CURVES_SMALL, ids=lambda s: s.name)
def test_scalar_mul(spec):
    """a * P for random full-width scalars (test_ec.rs:8-37 parity)."""
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 3, seed=8) + [None]
    ks = oracle.random_scalars(spec, 4, seed=9)
    expected = [oracle.scalar_mul(spec, p, k) for p, k in zip(pts, ks)]
    P = _device_points(ops, pts)
    k = ops.scalars_to_limbs(ks)
    _check(ops, ops.scalar_mul(P, k), expected)


def test_scalar_mul_g2():
    spec = BLS12_381_G2
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 2, seed=10)
    ks = oracle.random_scalars(spec, 2, seed=11)
    expected = [oracle.scalar_mul(spec, p, k) for p, k in zip(pts, ks)]
    P = _device_points(ops, pts)
    k = ops.scalars_to_limbs(ks)
    _check(ops, ops.scalar_mul(P, k), expected)


@pytest.mark.parametrize("spec", CURVES_SMALL, ids=lambda s: s.name)
def test_eq(spec):
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 2, seed=12)
    P = _device_points(ops, pts + pts + [None, None, pts[0]])
    Q = _device_points(ops, pts + pts[::-1] + [None, pts[0], None])
    # doubled-z representation of the same point must still compare equal
    two = ops.fq if spec.ext == 1 else ops.F
    got = np.asarray(ops.eq(P, Q))
    assert got.tolist() == [True, True, False, False, True, False, False]


@pytest.mark.parametrize("spec", CURVES_SMALL, ids=lambda s: s.name)
def test_eq_different_z(spec):
    """Equality must be projective: scale (X, Y, Z) by (l^2, l^3, l)."""
    ops = point_ops(spec)
    F = ops.F
    pts = oracle.random_points(spec, 2, seed=13)
    P = _device_points(ops, pts)
    lam = F.constant(12345)
    lam = ops._bcast(lam, P[0])
    l2 = F.sqr(lam)
    Q = (F.mul(P[0], l2), F.mul(P[1], F.mul(l2, lam)), F.mul(P[2], lam))
    assert np.asarray(ops.eq(P, Q)).all()
