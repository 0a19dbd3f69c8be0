"""Pallas fused point kernels vs the jnp formulas: bit-exact equivalence.

The cross-backend consistency tier (SURVEY §4: CUDA vs OpenCL vs limb-width,
`ag-build/src/tests/program.rs:85-120`) — here Pallas(interpret) vs fused-XLA
jnp, which also certifies the TPU path since both compile from the same
trace-level semantics.
"""

import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.pallas.point import jac_add, jac_add_mixed, jac_double

# interpret-mode Pallas point kernels: minutes of lowering (pytest.ini)
pytestmark = pytest.mark.slow


def eq_tree(a, b):
    return all(
        bool(np.array_equal(np.asarray(x), np.asarray(y)))
        for x, y in zip(map(np.asarray, a), map(np.asarray, b))
    )


@pytest.fixture(params=[BN254_G1, BLS12_381_G1], ids=lambda s: s.name)
def batch(request):
    spec = request.param
    ops = point_ops(spec)
    n = 40
    pts = oracle.random_points(spec, n, seed=20)
    qts = oracle.random_points(spec, n, seed=21)
    # stress selects: identities, P == Q, P == -Q
    pts[0] = None
    qts[1] = None
    pts[2] = qts[2]
    qts[3] = oracle.neg(spec, pts[3])
    A1 = ops.from_affine_ints(pts)
    A2 = ops.from_affine_ints(qts)
    P = ops.add_mixed(ops.double(ops.to_jacobian(A1)), A1)  # z != 1
    Q = ops.to_jacobian(A2)
    return spec, ops, P, Q, A2


def test_add(batch):
    spec, ops, P, Q, _ = batch
    assert eq_tree(jac_add(spec.base, P, Q, interpret=True), ops.add(P, Q))


def test_add_mixed(batch):
    spec, ops, P, _, A2 = batch
    assert eq_tree(
        jac_add_mixed(spec.base, P, A2, interpret=True), ops.add_mixed(P, A2)
    )


def test_double(batch):
    spec, ops, P, _, _ = batch
    assert eq_tree(jac_double(spec.base, P, interpret=True), ops.double(P))


def test_unaligned_batch():
    """n not a multiple of the block: padding path."""
    spec = BN254_G1
    ops = point_ops(spec)
    n = 7
    pts = oracle.random_points(spec, n, seed=22)
    P = ops.to_jacobian(ops.from_affine_ints(pts))
    assert eq_tree(jac_double(spec.base, P, interpret=True), ops.double(P))
