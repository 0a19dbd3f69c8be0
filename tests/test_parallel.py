"""Distributed-op tests on the virtual 8-device CPU mesh.

A capability the reference lacks entirely (it cannot test multi-GPU without
hardware, SURVEY.md par.4): the sharded NTT / MSM paths run on
--xla_force_host_platform_device_count=8 and are checked bit-exact against
the single-chip kernels and the bigint oracle.
"""

import random

import jax
import numpy as np
import pytest

from tpu_ec.curves import oracle
from tpu_ec.curves.params import BN254_G1
from tpu_ec.curves.point import point_ops
from tpu_ec.fields import BLS12_381_FR, field_ops
from tpu_ec.ops.ntt import FftKernel, ntt_ref
from tpu_ec.parallel import DistFftKernel, DistMultiexpKernel, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh()


@pytest.mark.parametrize("log_n", [6, 10])
def test_dist_ntt_matches_oracle(mesh, log_n):
    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(50 + log_n)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << log_n)]
    x = f.from_ints(vals)
    got = f.to_ints(DistFftKernel(spec, mesh).radix_fft(x))
    assert got == ntt_ref(spec, vals)


def test_dist_intt_roundtrip(mesh):
    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(60)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 8)]
    x = f.from_ints(vals)
    kern = DistFftKernel(spec, mesh)
    back = kern.radix_fft(kern.radix_fft(x), inverse=True)
    assert f.to_ints(back) == vals


def test_dist_ntt_matches_single_chip(mesh):
    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(61)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 9)]
    x = f.from_ints(vals)
    a = np.asarray(jax.device_get(DistFftKernel(spec, mesh).radix_fft(x)))
    b = np.asarray(jax.device_get(FftKernel(spec).radix_fft(x)))
    assert (a == b).all()


def test_dist_msm(mesh):
    spec = BN254_G1
    ops = point_ops(spec)
    n = 32
    pts = oracle.random_points(spec, n, seed=62)
    ks = oracle.random_scalars(spec, n, seed=63)
    out = DistMultiexpKernel(spec, mesh).multiexp(
        ops.from_affine_ints(pts),
        ops.scalars_to_limbs(ks),
        window_size=8,
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)


def test_dist_ntt_dryrun_shape(mesh):
    """The driver dryrun's exact NTT shape (2^14) under a wall budget —
    guards the MULTICHIP regression class (r3: rc=124)."""
    import time

    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(7)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 14)]
    x = f.from_ints(vals)
    t0 = time.time()
    y = jax.block_until_ready(DistFftKernel(spec, mesh).radix_fft(x))
    wall = time.time() - t0
    assert f.to_ints(y[:4]) == ntt_ref(spec, vals)[:4]
    # ~2x the measured cold-compile wall (r4 VERDICT: the whole dryrun =
    # 197 s; this shape alone ~60-90 s cold) so real regressions can't hide
    assert wall < 150, f"dist NTT 2^14 took {wall:.0f}s (budget 150s)"


def test_dist_msm_dryrun_shape(mesh):
    """The driver dryrun's exact MSM shape (2^10, auto window) under a wall
    budget."""
    import time

    spec = BN254_G1
    ops = point_ops(spec)
    n = 1 << 10
    pts = oracle.random_points(spec, n, seed=8)
    ks = oracle.random_scalars(spec, n, seed=9)
    t0 = time.time()
    out = DistMultiexpKernel(spec, mesh).multiexp(
        ops.from_affine_ints(pts), ops.scalars_to_limbs(ks)
    )
    jax.block_until_ready(out)
    wall = time.time() - t0
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    assert got == oracle.msm(spec, pts, ks)
    # guards the r3 never-finishes regression class; ~2x measured cold wall
    assert wall < 150, f"dist MSM 2^10 took {wall:.0f}s (budget 150s)"


def test_dist_ec_fft_many(mesh):
    """Sharded batched EC-FFT == single-chip batched EC-FFT, bit-exact
    (the multi-GPU batch distribution of ec_fft.rs:241-279)."""
    from tpu_ec.ops.ec_fft import EcFftKernel
    from tpu_ec.parallel import DistEcFftKernel

    spec = BN254_G1
    ops = point_ops(spec)
    n, B = 16, 8
    batches = []
    for b in range(B):
        pts = oracle.random_points(spec, n, seed=70 + b)
        A = ops.from_affine_ints(pts)
        batches.append(ops.to_jacobian(A))
    stacked = jax.tree_util.tree_map(lambda *ls: np.stack(ls), *batches)
    stacked = jax.tree_util.tree_map(jax.numpy.asarray, stacked)
    want = EcFftKernel(spec).radix_ec_fft_many(stacked)
    got = DistEcFftKernel(spec, mesh).radix_ec_fft_many(stacked)
    for g, w_ in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)
    ):
        assert (np.asarray(jax.device_get(g)) == np.asarray(jax.device_get(w_))).all()


def test_dist_ntt_digit_local_stages(mesh):
    """The digit-matmul-routed local DFT stages (TPU library path) are
    bit-exact with the Pease-loop dist NTT — forward AND inverse (the
    n^{-1} scale moves into the digit stages' final-cleanup constants).
    Runs the Pallas kernels in interpret mode via the ntt_digit_on_cpu
    test hatch at a tiny size; the real-chip path is the same trace."""
    from tpu_ec.config import configure, get_config

    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(62)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 8)]
    x = f.from_ints(vals)
    want = ntt_ref(spec, vals)
    cfg = get_config()
    old = (cfg.ntt_impl, cfg.ntt_digit_on_cpu, cfg.ntt_digit_leaf_log)
    configure(ntt_impl="digit", ntt_digit_on_cpu=True, ntt_digit_leaf_log=4)
    try:
        kern = DistFftKernel(spec, mesh)
        got = f.to_ints(kern.radix_fft(x))
        assert got == want
        back = kern.radix_fft(f.from_ints(got), inverse=True)
        assert f.to_ints(back) == vals
    finally:
        configure(
            ntt_impl=old[0], ntt_digit_on_cpu=old[1], ntt_digit_leaf_log=old[2]
        )


@pytest.mark.slow
def test_dist_msm_pair_accum():
    """(slow: the pair-engine point-op instances compile ~6-19 min on
    XLA-CPU — nightly job; measured green 2026-08-21.)

    The compute-optimal at-scale accumulation (`dist_msm_accum="pair"`,
    SCALING.json est_efficiency 0.987 at d=16 vs 0.053 for the scan
    fallback) compiles and is bit-exact on a d=2 virtual mesh — the
    library path a real multi-chip TPU deployment runs
    (multiexp.rs:324-400 parity at the bucket level)."""
    from tpu_ec.config import configure, get_config
    from tpu_ec.parallel.mesh import make_mesh as _mk

    spec = BN254_G1
    ops = point_ops(spec)
    n = 1 << 8
    pts = oracle.random_points(spec, n, seed=90)
    ks = oracle.random_scalars(spec, n, seed=91)
    old = get_config().dist_msm_accum
    configure(dist_msm_accum="pair")
    try:
        mesh2 = _mk(jax.devices()[:2])
        out = DistMultiexpKernel(spec, mesh2).multiexp(
            ops.from_affine_ints(pts), ops.scalars_to_limbs(ks)
        )
        got = ops.to_affine_ints(ops.to_affine(out))[0]
    finally:
        configure(dist_msm_accum=old)
    assert got == oracle.msm(spec, pts, ks)
