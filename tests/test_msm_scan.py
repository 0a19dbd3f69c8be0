"""Scan-engine MSM differential tests (the compile-light CPU default).

Every case below uses the SAME (n=32, window=4) shape so the whole file
costs ONE XLA compile (MultiexpKernel caches per shape); adversarial digit
distributions ride through that one program.  This engine carries the
default-suite differential coverage for G1 MSM; the movement-minimal
engines keep their own suites under `-m slow` (see pytest.ini).
"""

import jax
import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BLS12_381_G1, BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.ops.msm import MultiexpKernel

N, W = 32, 4
_KERNELS: dict = {}


def run_case(spec, pts, ks):
    ops = point_ops(spec)
    kern = _KERNELS.setdefault(spec.name, MultiexpKernel(spec))
    out = kern.multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        window_size=W,
        method="scan",
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


def test_random_vs_oracle():
    spec = BN254_G1
    pts = oracle.random_points(spec, N, seed=200)
    ks = oracle.random_scalars(spec, N, seed=201)
    run_case(spec, pts, ks)


def test_identities_and_zero_scalars():
    spec = BN254_G1
    pts = oracle.random_points(spec, N - 3, seed=202) + [None] * 3
    ks = [0] * 4 + oracle.random_scalars(spec, N - 4, seed=203)
    run_case(spec, pts, ks)


def test_duplicates_and_equal_scalars():
    """Equal keys everywhere: the segmented scan's longest-run case."""
    spec = BN254_G1
    base = oracle.random_points(spec, 4, seed=204)
    pts = [base[i % 4] for i in range(N)]
    k = oracle.random_scalars(spec, 1, seed=205)[0]
    ks = [k] * N
    run_case(spec, pts, ks)


def test_cancelling_pairs():
    """k and -k on the same point: signed digits cancel to identity."""
    spec = BN254_G1
    order = spec.scalar.modulus
    pts = oracle.random_points(spec, N // 2, seed=206) * 2
    ks = oracle.random_scalars(spec, N // 2, seed=207)
    ks = ks + [order - k for k in ks]
    run_case(spec, pts, ks)


def test_bls12_381_g1():
    spec = BLS12_381_G1
    pts = oracle.random_points(spec, N, seed=208)
    ks = oracle.random_scalars(spec, N, seed=209)
    run_case(spec, pts, ks)


@pytest.mark.slow
def test_g2_vs_oracle():
    """G2 (Fp2 tower) through the generic fused blocks (3*ext*L columns);
    slow: the Fp2 point-add instance compiles ~5 min on XLA-CPU."""
    from tpu_ec.curves.params import BLS12_381_G2

    spec = BLS12_381_G2
    ops = point_ops(spec)
    kern = MultiexpKernel(spec)
    pts = oracle.random_points(spec, N, seed=212)
    ks = oracle.random_scalars(spec, N, seed=213)
    out = kern.multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        window_size=W,
        method="scan",
    )
    assert ops.to_affine_ints(ops.to_affine(out))[0] == oracle.msm(spec, pts, ks)


def test_auto_selects_scan_on_cpu():
    """On the CPU backend, method='auto' must route G1 to the scan engine
    (the compile-light default that keeps this suite bounded)."""
    assert jax.default_backend() == "cpu"
    spec = BN254_G1
    kern = _KERNELS.setdefault(spec.name, MultiexpKernel(spec))
    ops = point_ops(spec)
    pts = oracle.random_points(spec, N, seed=210)
    ks = oracle.random_scalars(spec, N, seed=211)
    out = kern.multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks), window_size=W
    )
    assert ("scan", N, W) in kern._jitted
    assert ops.to_affine_ints(ops.to_affine(out))[0] == oracle.msm(spec, pts, ks)


def _check_scan_batch(spec, seed):
    ops = point_ops(spec)
    kern = MultiexpKernel(spec)
    n, chunks = N, 4
    pts = oracle.random_points(spec, n, seed=seed)
    ks = oracle.random_scalars(spec, n, seed=seed + 1)
    out = kern.multiple_multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        chunks,
        window_size=W,
        method="scan",
    )
    assert ("scan_batch", "vmap", chunks, n // chunks, W) in kern._jitted
    got = ops.to_affine_ints(ops.to_affine(out))
    c = n // chunks
    for i in range(chunks):
        assert got[i] == oracle.msm(spec, pts[i * c : (i + 1) * c], ks[i * c : (i + 1) * c])


def test_scan_batch_one_dispatch():
    """multiple_multiexp(method='scan') runs the whole batch as ONE XLA
    program (lax.map over chunks sharing the scan body) — the batch-kernel
    parity of `ag-build/cl/multiexp.cl:217-263` on the compile-light
    engine."""
    _check_scan_batch(BN254_G1, 220)


@pytest.mark.slow
def test_scan_batch_one_dispatch_g2():
    """G2 goes through the same generic batch path (slow: the Fp2 scan
    program dominates the file's XLA-CPU compile budget — nightly job,
    same gating as the other G2 scan cases in this file)."""
    from tpu_ec.curves.params import BLS12_381_G2

    _check_scan_batch(BLS12_381_G2, 222)


def test_scan_batch_slabbed(monkeypatch):
    """batch_msm_slab bounds per-dispatch device runtime: the batch reuses
    ONE compiled slab program over num_chunks/slab dispatches and must be
    bit-identical to the unslabbed result."""
    from tpu_ec.config import get_config

    spec = BN254_G1
    ops = point_ops(spec)
    kern = MultiexpKernel(spec)
    n, chunks = N, 4
    pts = oracle.random_points(spec, n, seed=230)
    ks = oracle.random_scalars(spec, n, seed=231)
    monkeypatch.setattr(get_config(), "batch_msm_slab", 2)
    out = kern.multiple_multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        chunks,
        window_size=W,
        method="scan",
    )
    assert ("scan_batch", "vmap", 2, n // chunks, W) in kern._jitted
    assert ("scan_batch", "vmap", chunks, n // chunks, W) not in kern._jitted
    got = ops.to_affine_ints(ops.to_affine(out))
    c = n // chunks
    for i in range(chunks):
        assert got[i] == oracle.msm(spec, pts[i * c : (i + 1) * c], ks[i * c : (i + 1) * c])


def test_tuned_window_engine_keyed(tmp_path, monkeypatch):
    """The measured table is keyed per (curve, engine): a window tuned for
    one engine must never leak into another's plan (their cost shapes
    differ — scan pays ~log2(n) adds/point/window, pair ~1)."""
    import json

    from tpu_ec.ops import autotune

    tab = {"bls12_381_g1": {"scan": {"14": 7}, "pair": {"14": 11}}}
    p = tmp_path / "tuned_windows.json"
    p.write_text(json.dumps(tab))
    monkeypatch.setattr(autotune, "_TABLE_PATH", str(p))
    autotune._table.cache_clear()
    try:
        assert autotune.tuned_window("bls12_381_g1", "scan", 1 << 14) == 7
        assert autotune.tuned_window("bls12_381_g1", "pair", 1 << 14) == 11
        # nearest-size lookup stays bounded to +/-2 octaves
        assert autotune.tuned_window("bls12_381_g1", "scan", 1 << 16) == 7
        assert autotune.tuned_window("bls12_381_g1", "scan", 1 << 20) is None
        assert autotune.tuned_window("bls12_381_g1", "sorted", 1 << 14) is None
        assert autotune.tuned_window("bn254_g1", "scan", 1 << 14) is None
    finally:
        autotune._table.cache_clear()


def test_tuned_windows_table_committed():
    """The measured on-chip tuning table ships with the library (the
    ag-cuda-ec/benches/amt.rs:37-57 grid search, persisted): the file
    exists, follows the curve -> engine -> log_n -> window schema, and
    tuned_window returns its measured values."""
    import json
    import os

    from tpu_ec.ops import autotune

    assert os.path.exists(autotune._TABLE_PATH), "tuned_windows.json missing"
    tab = json.load(open(autotune._TABLE_PATH))
    assert tab, "tuned_windows.json is empty"
    engines = {"pair", "scan", "sorted", "coz"}
    for curve, by_engine in tab.items():
        assert isinstance(curve, str) and curve
        for engine, by_log in by_engine.items():
            assert engine in engines, f"unknown engine key {engine!r}"
            assert by_log, f"{curve}/{engine} has no measurements"
            for log_n, w in by_log.items():
                assert log_n.isdigit() and 2 <= int(w) <= 16
    # the committed measurements are live through the lookup API
    autotune._table.cache_clear()
    try:
        curve = next(iter(tab))
        engine = next(iter(tab[curve]))
        log_n = next(iter(tab[curve][engine]))
        got = autotune.tuned_window(curve, engine, 1 << int(log_n))
        assert got == int(tab[curve][engine][log_n])
    finally:
        autotune._table.cache_clear()
