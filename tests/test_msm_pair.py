"""Pair-halving-engine MSM differential tests vs the Python bigint oracle.

The engine behind the committed TPU MSM numbers (ops/msm_pair.py): per
window one sort + one gather, unconditionally-halving pair rounds with a
bounded spill buffer, strided-scan finish.  The adversarial cases target
its specific invariants: spill-cap tightness (#boundary pairs <= #live
runs), duplicate keys ACROSS spill generations (the seg-scan finish must
fold them), and maximal runs (all scalars equal).

Compile economy: all cases share (n, window) shapes through the
MultiexpKernel cache.
"""

import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import MultiexpKernel

# whole-module: multi-minute XLA-CPU compiles (see pytest.ini)
pytestmark = pytest.mark.slow

_KERNELS: dict = {}


def run_case(spec, pts, ks, **kw):
    ops = point_ops(spec)
    kern = _KERNELS.setdefault(spec.name, MultiexpKernel(spec))
    out = kern.multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), method="pair", **kw
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


@pytest.mark.parametrize("n", [1, 3, 64])
def test_small_vs_oracle(n):
    spec = BN254_G1
    pts = oracle.random_points(spec, n, seed=80 + n)
    ks = oracle.random_scalars(spec, n, seed=81 + n)
    run_case(spec, pts, ks, window_size=4)


def test_identities_zero_scalars_duplicates():
    spec = BN254_G1
    n = 64
    pts = oracle.random_points(spec, n, seed=82)
    ks = oracle.random_scalars(spec, n, seed=83)
    pts[0] = None  # identity point
    ks[1] = 0  # zero scalar -> digit-0 dummy slot
    pts[3] = pts[2]  # duplicate point, same scalar (forces doubling path)
    ks[3] = ks[2]
    run_case(spec, pts, ks, window_size=4)


def test_adversarial_equal_scalars():
    """All scalars identical: every window one maximal run — each pair
    round merges everything, spills only at the single boundary."""
    spec = BN254_G1
    n = 64
    pts = oracle.random_points(spec, n, seed=84)
    ks = [oracle.random_scalars(spec, 1, seed=85)[0]] * n
    run_case(spec, pts, ks, window_size=4)


def test_adversarial_singletons():
    """All digits distinct (scalars = 1..n with tiny window): every pair is
    a boundary pair — maximal spill pressure each round (the spill-cap
    bound #runs <= 2^(w-1)+1 is tight here)."""
    spec = BN254_G1
    n = 64
    pts = oracle.random_points(spec, n, seed=86)
    ks = list(range(1, n + 1))
    run_case(spec, pts, ks, window_size=4)


def test_non_pow2_padding():
    spec = BLS12_381_G1
    n = 21  # pads to 32 with identity/zero rows
    pts = oracle.random_points(spec, n, seed=87)
    ks = oracle.random_scalars(spec, n, seed=88)
    run_case(spec, pts, ks, window_size=4)


def test_flat_batch_vs_oracle():
    """The flat one-sort batch engine (ops/msm_batch.py): chunk ids fold
    into the bucket sort key so the whole batch shares one sort + gather +
    halving cascade per window (the single-launch grid of
    ag-build/cl/multiexp.cl:217-263).  Non-pow2 chunk count (slab padding),
    padded rows, zero/small scalars, and per-chunk bit-exactness."""
    spec = BN254_G1
    ops = point_ops(spec)
    n, nch = 24, 3
    pts = oracle.random_points(spec, n, seed=95)
    ks = list(oracle.random_scalars(spec, n - 4, seed=96)) + [0, 0, 1, 2]
    kern = MultiexpKernel(spec)
    out = kern.multiple_multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        nch,
        window_size=4,
        method="pair",
    )
    assert any(k[0] == "pair_batch" and k[1] == "flat" for k in kern._jitted)
    got = ops.to_affine_ints(ops.to_affine(out))
    c = n // nch
    for i in range(nch):
        assert got[i] == oracle.msm(spec, pts[i * c : (i + 1) * c], ks[i * c : (i + 1) * c])
