"""Host-utility tests: density tracking, worker pool, timer.

Density semantics mirror the reference's property tests
(multiexp_cpu.rs:422-578 extend/inc coverage); the pool mirrors
Worker/Waiter (threadpool.rs:36-113)."""

import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.density import DensityTracker, FullDensity, compact_by_density
from tpu_ec.ops.msm import msm
from tpu_ec.utils import timer
from tpu_ec.utils.threadpool import Worker


def test_density_tracker_inc_and_total():
    dt = DensityTracker()
    for _ in range(8):
        dt.add_element()
    dt.inc(1)
    dt.inc(1)
    dt.inc(5)
    assert dt.get_total_density() == 2
    assert dt.get_query_size() == 8
    mask = dt.generate_mask(8)
    assert mask.tolist() == [False, True, False, False, False, True, False, False]


def test_density_extend_input_or():
    a = DensityTracker()
    b = DensityTracker()
    for _ in range(3):
        a.add_element()
        b.add_element()
    a.inc(1)
    b.inc(0)
    b.inc(2)
    a.extend(b, is_input_density=True)
    # index 0 OR'd, rest appended
    assert a.generate_mask(5).tolist() == [True, True, False, False, True]
    assert a.get_total_density() == 3


def test_sparse_msm_matches_dense():
    spec = BN254_G1
    ops = point_ops(spec)
    pts = oracle.random_points(spec, 8, seed=70)
    ks = oracle.random_scalars(spec, 8, seed=71)
    dt = DensityTracker()
    for _ in range(8):
        dt.add_element()
    keep = [0, 3, 4, 7]
    for i in keep:
        dt.inc(i)
    bases = ops.from_affine_ints(pts)
    scal = ops.scalars_to_limbs(ks)
    b2, s2 = compact_by_density(dt, bases, scal)
    got = msm(spec, b2, s2, window_size=4, num_groups=2)
    got = ops.to_affine_ints(ops.to_affine(got))[0]
    want = oracle.msm(spec, [pts[i] for i in keep], [ks[i] for i in keep])
    assert got == want
    # FullDensity keeps everything
    b3, s3 = compact_by_density(FullDensity(), bases, scal)
    assert s3.shape == scal.shape


def test_worker_scope_and_waiter():
    w = Worker()
    waiter = w.compute(lambda: sum(range(10)))
    assert waiter.wait() == 45
    chunks = w.scope(100, lambda start, ln: (start, ln))
    assert sum(ln for _, ln in chunks) == 100
    starts = [s for s, _ in chunks]
    assert starts == sorted(starts)


def test_timer_phases():
    timer.enable(True)
    timer.STATS.reset()
    with timer.phase("outer"):
        with timer.phase("inner"):
            pass
    s = timer.STATS.summary()
    assert "outer" in s and "outer/inner" in s
    assert "outer" in timer.report()
    timer.enable(False)
