"""MSM differential tests vs the Python oracle.

Mirrors the reference's MSM coverage: the window_size 1..=9 x {signed,
unsigned} sweep of `ag-cuda-ec/src/multiexp.rs:93-144`, the bases-doubling
size sweep of `ec-gpu-proxy/tests/multiexp.rs:39-105`, and the batch
(multi-chunk) entry point (`ag-cuda-ec/src/multiexp.rs:21-81`).
"""

import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BLS12_381_G2, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import MultiexpKernel, default_num_groups, default_window_size, msm


def _run(spec, pts, ks, **kw):
    ops = point_ops(spec)
    bases = ops.from_affine_ints(pts)
    scalars = ops.scalars_to_limbs(ks)
    out = msm(spec, bases, scalars, **kw)
    return ops.to_affine_ints(ops.to_affine(out))[0]


@pytest.mark.parametrize("spec", [BLS12_381_G1, BN254_G1], ids=lambda s: s.name)
def test_msm_small(spec):
    n = 32
    pts = oracle.random_points(spec, n, seed=20)
    ks = oracle.random_scalars(spec, n, seed=21)
    expected = oracle.msm(spec, pts, ks)
    assert _run(spec, pts, ks, window_size=4, num_groups=4) == expected


@pytest.mark.parametrize(
    "window,signed",
    [(3, True), (8, True), (11, True), (8, False)],
    ids=["w3s", "w8s", "w11s", "w8u"],
)
@pytest.mark.slow
def test_msm_window_sweep(window, signed):
    """window x signedness sweep (multiexp.rs:93-144 does 1..=9 x both;
    trimmed here because each config is a separate XLA compile)."""
    spec = BLS12_381_G1
    n = 16
    pts = oracle.random_points(spec, n, seed=22)
    ks = oracle.random_scalars(spec, n, seed=23)
    expected = oracle.msm(spec, pts, ks)
    got = _run(spec, pts, ks, window_size=window, num_groups=2, signed=signed)
    assert got == expected


def test_msm_edge_inputs():
    """Identity bases, zero scalars, duplicated points, n not divisible by G."""
    spec = BN254_G1
    pts = oracle.random_points(spec, 5, seed=24)
    pts = pts + [None, pts[0], pts[0]]  # identity + duplicates
    ks = oracle.random_scalars(spec, 6, seed=25) + [0, 1]
    expected = oracle.msm(spec, pts, ks)
    got = _run(spec, pts, ks, window_size=4, num_groups=4)  # n=8 -> pad
    assert got == expected
    # n=7: forces padding path
    got7 = _run(spec, pts[:7], ks[:7], window_size=4, num_groups=4)
    assert got7 == oracle.msm(spec, pts[:7], ks[:7])


def test_msm_g2():
    spec = BLS12_381_G2
    n = 8
    pts = oracle.random_points(spec, n, seed=26)
    ks = oracle.random_scalars(spec, n, seed=27)
    expected = oracle.msm(spec, pts, ks)
    assert _run(spec, pts, ks, window_size=4, num_groups=2) == expected


@pytest.mark.slow
def test_multiple_multiexp():
    """Batch MSM over chunks (ag-cuda-ec multiple_multiexp parity)."""
    spec = BN254_G1
    n, chunks = 24, 3
    pts = oracle.random_points(spec, n, seed=28)
    ks = oracle.random_scalars(spec, n, seed=29)
    ops = point_ops(spec)
    kern = MultiexpKernel(spec)
    out = kern.multiple_multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        chunks,
        window_size=4,
        num_groups=2,
    )
    got = ops.to_affine_ints(ops.to_affine(out))
    for c in range(chunks):
        sl = slice(c * (n // chunks), (c + 1) * (n // chunks))
        assert got[c] == oracle.msm(spec, pts[sl], ks[sl])


def test_abort_hook():
    from tpu_ec.errors import Aborted

    spec = BN254_G1
    ops = point_ops(spec)
    kern = MultiexpKernel(spec, maybe_abort=lambda: True)
    pts = oracle.random_points(spec, 4, seed=30)
    with pytest.raises(Aborted):
        kern.multiexp(ops.from_affine_ints(pts), ops.scalars_to_limbs([1, 2, 3, 4]))


def test_plan_heuristics():
    for log_n in range(1, 25):
        n = 1 << log_n
        w = default_window_size(n)
        assert 2 <= w <= 12
        g = default_num_groups(n, w)
        assert g & (g - 1) == 0  # power of two


@pytest.mark.slow
def test_multiexp_1bit():
    """1-bit batch MSM variant (batch_multiexp.cl parity, C14)."""
    from tpu_ec.ops.msm import multiexp_1bit

    spec = BN254_G1
    ops = point_ops(spec)
    n = 16
    pts = oracle.random_points(spec, n, seed=90)
    ks = oracle.random_scalars(spec, n, seed=91)
    out = multiexp_1bit(spec, ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), num_groups=2)
    assert ops.to_affine_ints(ops.to_affine(out))[0] == oracle.msm(spec, pts, ks)
