"""Batch-affine point addition kernels (ops/pallas/affine.py) vs the
Jacobian jnp path — bit-exact differential tests in interpret mode.

Mirrors the reference's device-vs-arkworks EC op tests
(`ag-build/src/tests/test_ec.rs:8-37`), plus the degenerate cases the
complete formula must select around: identity operands, P + P (tangent),
P + (-P) (cancellation), and mixtures inside one batch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.fields.params import int_to_limbs
from tpu_ec.ops.pallas.affine import (
    affine_add_batch,
    batch_inverse_planes,
)
from tpu_ec.ops.pallas.mont import to_planes


def _rand_points(spec, n, seed, include_identity=True):
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(n):
        k = int(rng.integers(1, 1 << 30))
        pts.append(oracle.scalar_mul(spec, oracle.generator(spec), k))
    if include_identity and n >= 4:
        pts[1] = None
        pts[-2] = None
    return pts


@pytest.mark.parametrize("spec", [BLS12_381_G1, BN254_G1], ids=lambda s: s.name)
def test_affine_add_random_batch(spec):
    ops = point_ops(spec)
    n = 32
    pa = _rand_points(spec, n, 1)
    pb = _rand_points(spec, n, 2)
    A = ops.from_affine_ints(pa)
    B = ops.from_affine_ints(pb)
    x3, y3 = affine_add_batch(spec.base, A, B, interpret=True)
    got = ops.to_affine_ints((x3, y3))
    want = [oracle.add(spec, a, b) for a, b in zip(pa, pb)]
    assert got == want


@pytest.mark.parametrize("spec", [BLS12_381_G1], ids=lambda s: s.name)
def test_affine_add_degenerate_cases(spec):
    ops = point_ops(spec)
    G = oracle.generator(spec)
    twoG = oracle.add(spec, G, G)
    negG = oracle.neg(spec, G)
    # rows: P+Q, P+P (double), P+(-P) (cancel), 0+Q, P+0, 0+0
    pa = [G, G, G, None, twoG, None, twoG, G]
    pb = [twoG, G, negG, twoG, None, None, twoG, negG]
    A = ops.from_affine_ints(pa)
    B = ops.from_affine_ints(pb)
    x3, y3 = affine_add_batch(spec.base, A, B, interpret=True)
    got = ops.to_affine_ints((x3, y3))
    want = [oracle.add(spec, a, b) for a, b in zip(pa, pb)]
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 5, 16, 33])
def test_batch_inverse_planes(n):
    from tpu_ec.fields import field_ops

    spec = BLS12_381_G1.base
    f = field_ops(spec)
    import random

    r = random.Random(n)
    vals = [r.randrange(1, spec.modulus) for _ in range(n)]
    a = f.from_ints(vals)  # (n, L) Montgomery
    inv = batch_inverse_planes(spec, to_planes(a), interpret=True)
    got = f.to_ints(jnp.swapaxes(inv, 0, 1))
    want = [pow(v, spec.modulus - 2, spec.modulus) for v in vals]
    assert got == want


@pytest.mark.parametrize("spec", [BLS12_381_G1, BN254_G1], ids=lambda s: s.name)
def test_coz_add_batch(spec):
    """Co-Z scaled add: result at scale R equals the true sum (check by
    interpreting outputs as Jacobian points with z = R)."""
    from tpu_ec.ops.pallas.affine import coz_add_batch

    ops = point_ops(spec)
    pa = _rand_points(spec, 16, 3)
    pb = _rand_points(spec, 16, 4)
    # include double / cancel / identity rows
    G = oracle.generator(spec)
    pa[0], pb[0] = G, G
    pa[1], pb[1] = G, oracle.neg(spec, G)
    pa[2], pb[2] = None, G
    A = ops.from_affine_ints(pa)
    B = ops.from_affine_ints(pb)
    (x3, y3), r1 = coz_add_batch(spec.base, A, B, interpret=True)
    # outputs are at scale Z' = 1 * R: jacobian (X, Y, R) is the true point
    z = jnp.broadcast_to(r1, x3.shape)
    ident = ops.is_identity_affine((x3, y3))
    z = ops.F.select(ident, jnp.zeros_like(z), z)
    got = ops.to_affine_ints(ops.to_affine((x3, y3, z)))
    want = [oracle.add(spec, a, b) for a, b in zip(pa, pb)]
    assert got == want


def test_coz_add_scaled_operands():
    """Co-Z adds compose: feed the (scaled) outputs of one round into a
    second round and verify against the oracle at the accumulated scale."""
    from tpu_ec.fields import field_ops
    from tpu_ec.ops.pallas.affine import coz_add_batch

    spec = BLS12_381_G1
    ops = point_ops(spec)
    f = field_ops(spec.base)
    pts = _rand_points(spec, 8, 5, include_identity=False)
    A = ops.from_affine_ints(pts)
    A1 = tuple(l[:4] for l in A)
    A2 = tuple(l[4:] for l in A)
    (x1, y1), r1 = coz_add_batch(spec.base, A1, A2, interpret=True)  # scale r1
    # round 2: add pairs of round-1 outputs (shared scale r1)
    B1 = (x1[:2], y1[:2])
    B2 = (x1[2:], y1[2:])
    (x2, y2), r2 = coz_add_batch(spec.base, B1, B2, interpret=True)
    z = f.mul(r1, r2)  # accumulated scale
    zb = jnp.broadcast_to(z, x2.shape)
    got = ops.to_affine_ints(ops.to_affine((x2, y2, zb)))
    s = [oracle.add(spec, pts[i], pts[i + 4]) for i in range(4)]
    want = [oracle.add(spec, s[0], s[2]), oracle.add(spec, s[1], s[3])]
    assert got == want


def test_affine_add_matches_jacobian_path():
    """Cross-engine: batch-affine result == Jacobian add_mixed result."""
    spec = BLS12_381_G1
    ops = point_ops(spec)
    pa = _rand_points(spec, 16, 7)
    pb = _rand_points(spec, 16, 8)
    A = ops.from_affine_ints(pa)
    B = ops.from_affine_ints(pb)
    x3, y3 = affine_add_batch(spec.base, A, B, interpret=True)
    jac = ops.add_mixed(ops.to_jacobian(A), B)
    want = ops.to_affine_ints(ops.to_affine(jac))
    got = ops.to_affine_ints((x3, y3))
    assert got == want
