"""At-scale in-repo correctness (VERDICT r2 items 4): the paths the TPU
bench exercises, oracle-verified on CPU at benched-adjacent sizes.

- fused-NTT FORWARD output vs the native C++ ntt_ref at 2^12 (the round-2
  suite only checked forward-then-inverse roundtrips above 2^10, which a
  self-inverting permutation/twiddle bug would pass;
  ref sweep: /root/reference/ec-gpu-proxy/tests/fft.rs:87-176).
- pair-engine G1 MSM at 2^12 vs the native C++ Pippenger (round-2 CPU MSM
  coverage capped at n <= 80;
  ref sweep: /root/reference/ec-gpu-proxy/tests/multiexp.rs:39-105).

These use the native oracle (tests/test_native.py loads the same .so) so
they stay CPU-affordable; XLA compile time dominates, amortized by the
persistent compilation cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ec.fields import BLS12_381_FR, field_ops
from tpu_ec.native import available, native_curve, native_field
from tpu_ec.curves.params import BLS12_381_G1
from tpu_ec.curves.point import point_ops

pytestmark = [
    pytest.mark.skipif(not available(), reason="native oracle unavailable"),
    # multi-minute XLA-CPU compiles at 2^12 (see pytest.ini)
    pytest.mark.slow,
]


def test_fused_ntt_forward_vs_native_2_12():
    spec = BLS12_381_FR
    f = field_ops(spec)
    nf = native_field(spec)
    n = 1 << 12
    rng = np.random.default_rng(412)
    limbs = rng.integers(0, 1 << 16, (f.L, n), dtype=np.uint32)
    limbs[-1] %= int(f.p[-1])  # valid reduced elements

    from tpu_ec.ops.pallas.ntt import PallasFftKernel

    kern = PallasFftKernel(spec)
    y = np.asarray(jax.device_get(kern.radix_fft_planes(jnp.asarray(limbs))))

    # native oracle on the same values (u64-limb packing via the field shim)
    hl = np.ascontiguousarray(limbs.T)  # (n, L) halflimbs
    u64 = nf.from_halflimbs(hl)
    want = nf.to_halflimbs(nf.ntt(u64))
    assert np.array_equal(y.T, want), "fused NTT forward != native oracle"


def test_pair_msm_2_12_vs_native():
    spec = BLS12_381_G1
    ops = point_ops(spec)
    nc = native_curve(spec)
    n = 1 << 12
    rng = np.random.default_rng(777)
    # pseudo-random points: k*G via the native batch scalar-mul
    from tpu_ec.curves import oracle

    ks = np.zeros((n, 4), dtype=np.uint64)
    ks[:, 0] = rng.integers(1, 1 << 63, n, dtype=np.uint64)
    G = nc.affine_from_points([oracle.generator(spec)])
    jac = nc.scalar_mul(np.broadcast_to(G, (n, G.shape[1])).copy(), ks)
    aff = nc.to_affine(jac)
    w = nc.w
    x_hl = nc.fq.to_halflimbs(np.ascontiguousarray(aff[:, :w]))
    y_hl = nc.fq.to_halflimbs(np.ascontiguousarray(aff[:, w:]))
    s_u64 = rng.integers(0, np.iinfo(np.uint64).max, (n, 4), dtype=np.uint64)
    s_u64[:, 3] >>= 4
    s_hl = nc.fr.to_halflimbs(s_u64)

    from tpu_ec.ops.msm import MultiexpKernel

    out = MultiexpKernel(spec).multiexp(
        (jnp.asarray(x_hl), jnp.asarray(y_hl)), jnp.asarray(s_hl), method="pair"
    )
    got = ops.to_affine_ints(ops.to_affine(out))[0]
    want_j = nc.msm(aff, s_u64)
    want = nc.affine_to_points(nc.to_affine(want_j[None, :]))[0]
    assert got == want, "pair MSM 2^12 != native Pippenger"
