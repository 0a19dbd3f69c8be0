"""KZG-style commit pipeline (NTT + MSM composed) vs the bigint oracle —
the AMT workload parity check (ag-cuda-ec/benches/amt.rs is the reference's
only consumer of both ops together)."""

import random

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.fields import field_ops
from tpu_ec.ops.ntt import ntt_ref
from tpu_ec.ops.pipeline import CommitPipeline


def test_commit_vs_oracle():
    spec = BN254_G1
    ops = point_ops(spec)
    fr = field_ops(spec.scalar)
    n = 32
    rng = random.Random(40)
    coeff_ints = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    pts = oracle.random_points(spec, n, seed=41)

    pipe = CommitPipeline(spec)
    evals, commit = pipe.commit(fr.from_ints(coeff_ints), ops.from_affine_ints(pts))

    eval_ints = ntt_ref(spec.scalar, coeff_ints)
    assert fr.to_ints(evals) == eval_ints, "pipeline NTT stage mismatch"
    got = ops.to_affine_ints(ops.to_affine(commit))[0]
    assert got == oracle.msm(spec, pts, eval_ints), "pipeline commit mismatch"


def test_commit_coefficient_basis():
    spec = BN254_G1
    ops = point_ops(spec)
    fr = field_ops(spec.scalar)
    n = 32  # same shape as test_commit_vs_oracle -> shares one compiled MSM
    rng = random.Random(42)
    coeff_ints = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    pts = oracle.random_points(spec, n, seed=43)
    pipe = CommitPipeline(spec)
    commit = pipe.commit_coefficient_basis(
        fr.from_ints(coeff_ints), ops.from_affine_ints(pts)
    )
    got = ops.to_affine_ints(ops.to_affine(commit))[0]
    assert got == oracle.msm(spec, pts, coeff_ints)


def test_commit_sparse_matches_dense():
    """R1CS-density commit: zeros dropped via DensityTracker must equal the
    dense commit over the same effective terms (multiexp_cpu.rs:85-207)."""
    from tpu_ec.ops.density import DensityTracker

    spec = BN254_G1
    ops = point_ops(spec)
    fr = field_ops(spec.scalar)
    n = 16
    rng = random.Random(44)
    coeff_ints = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    pts = oracle.random_points(spec, n, seed=45)
    dt = DensityTracker()
    touched = []
    for i in range(n):
        dt.add_element()
        if i % 3 != 0:  # ~2/3 density
            dt.inc(i)
            touched.append(i)
    # untouched slots carry structural zeros
    eff = [coeff_ints[i] if i in touched else 0 for i in range(n)]
    pipe = CommitPipeline(spec)
    commit = pipe.commit_sparse(
        fr.from_ints(eff), ops.from_affine_ints(pts), dt
    )
    got = ops.to_affine_ints(ops.to_affine(commit))[0]
    assert got == oracle.msm(spec, pts, eff)


import pytest  # noqa: E402


@pytest.mark.slow
def test_commit_vs_oracle_at_scale():
    """2^10 pipeline (the C30 at-scale integration gap): NTT + from_mont +
    MSM against the native C++ stack; the default-suite n=32 cases cover
    the same path compile-light (ref workload: 2^21 exps, amt.rs:17-23 —
    chip-scale runs live in scripts/evidence_tpu.py pipeline)."""
    from tpu_ec.native import available, native_curve

    if not available():
        pytest.skip("native oracle unavailable")
    spec = BN254_G1
    ops = point_ops(spec)
    fr = field_ops(spec.scalar)
    n = 1 << 10
    rng = random.Random(46)
    coeff_ints = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    pts = oracle.random_points(spec, n, seed=47)
    pipe = CommitPipeline(spec)
    evals, commit = pipe.commit(fr.from_ints(coeff_ints), ops.from_affine_ints(pts))
    nc = native_curve(spec)
    ev_nat = nc.fr.ntt(nc.fr.from_ints(coeff_ints))
    assert fr.to_ints(evals) == nc.fr.to_ints(ev_nat)
    want_j = nc.msm(nc.affine_from_points(pts), nc.fr.from_mont(ev_nat))
    want = nc.affine_to_points(nc.to_affine(want_j[None, :]))[0]
    assert ops.to_affine_ints(ops.to_affine(commit))[0] == want
