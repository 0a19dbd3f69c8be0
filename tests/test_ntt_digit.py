"""Digit-matmul NTT (ops/ntt_digit.py) differential tests.

Oracle pattern of SURVEY.md par.4: the MXU path must agree bit-exactly with
the bigint reference NTT (ops/ntt.ntt_ref) and with the jnp FftKernel on
every size/leaf split, including the wide-Montgomery inter-twiddle and the
canonical final reduce.  (TPU throughput evidence lives in bench.py /
scripts/exp_digit_ntt.py; here the jnp core runs on CPU.)
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ec.fields import BLS12_381_FR, BN254_FR, field_ops
from tpu_ec.ops.ntt import FftKernel, ntt_ref
from tpu_ec.ops.ntt_digit import (
    WideMont,
    digit_ntt_planes,
    get_digit_domain,
    inter_table288_np,
)


def _planes(f, vals):
    return jnp.swapaxes(f.from_ints(vals), 0, 1)


def _ints(f, planes):
    return f.to_ints(jnp.swapaxes(planes, 0, 1))


@pytest.mark.parametrize("log_n,leaf", [(4, 4), (6, 3), (8, 5), (10, 4)])
def test_digit_ntt_matches_oracle(log_n, leaf):
    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(100 + log_n)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << log_n)]
    y = digit_ntt_planes(spec, _planes(f, vals), leaf=leaf)
    assert _ints(f, y) == ntt_ref(spec, vals)


def test_digit_ntt_matches_fft_kernel():
    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(7)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 10)]
    x = f.from_ints(vals)
    want = np.asarray(FftKernel(spec).radix_fft(x))
    got = np.asarray(jnp.swapaxes(digit_ntt_planes(spec, _planes(f, vals), leaf=5), 0, 1))
    assert (got == want).all()


def test_digit_ntt_inverse_roundtrip():
    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(9)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 8)]
    y = digit_ntt_planes(spec, _planes(f, vals), leaf=4)
    back = digit_ntt_planes(spec, y, inverse=True, leaf=4)
    assert _ints(f, back) == vals


def test_digit_ntt_bn254():
    spec = BN254_FR
    f = field_ops(spec)
    rng = random.Random(11)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 6)]
    y = digit_ntt_planes(spec, _planes(f, vals), leaf=3)
    assert _ints(f, y) == ntt_ref(spec, vals)


def test_wide_mont_vs_bigint():
    """The 18x16-limb R'=2^288 Montgomery core vs Python bigints, including
    values far above p (leaf-output bounds)."""
    spec = BLS12_381_FR
    p = spec.modulus
    wm = WideMont(spec)
    rng = random.Random(13)
    vs = [rng.randrange(1 << 280) for _ in range(8)] + [0, 1, p - 1, (1 << 280) - 1]
    ts = [rng.randrange(p) for _ in range(len(vs))]
    a18 = [
        jnp.asarray([(v >> (16 * i)) & 0xFFFF for v in vs], jnp.uint32)
        for i in range(18)
    ]
    t16 = [
        jnp.asarray([(t >> (16 * i)) & 0xFFFF for t in ts], jnp.uint32)
        for i in range(16)
    ]
    out = wm.mul(a18, t16)
    got = [
        sum(int(np.asarray(out[i])[j]) << (16 * i) for i in range(16))
        for j in range(len(vs))
    ]
    Rinv = pow(1 << 288, -1, p)
    for j, (v, t) in enumerate(zip(vs, ts)):
        assert got[j] % p == (v * t * Rinv) % p
        assert got[j] < p + (1 << 250)  # output bound the pipeline relies on


def test_inter_table_values():
    """T'[k2,j1] must equal w_m^{k2 j1} * 2^288 mod p."""
    spec = BLS12_381_FR
    from tpu_ec.ops.ntt import get_domain

    log_n = 6
    dom = get_domain(spec, log_n)
    T = inter_table288_np(spec, dom.omega, log_n, log_n, 3)  # (L,8,8)
    p = spec.modulus
    w_m = dom.omega
    for k2 in (0, 1, 3, 7):
        for j1 in (0, 2, 5):
            got = sum(int(T[i, k2, j1]) << (16 * i) for i in range(16))
            assert got == (pow(w_m, k2 * j1, p) * (1 << 288)) % p


def test_chunked_level_matches_oracle(monkeypatch):
    """The huge-n path (chunked k2 slices + in-trace factored twiddle
    synthesis, used above 2^25 elements) forced on at test scale."""
    import tpu_ec.ops.ntt_digit as nd

    monkeypatch.setattr(nd, "_CHUNK_MIN", 1 << 9)
    nd.get_digit_domain.cache_clear()
    try:
        spec = BLS12_381_FR
        f = field_ops(spec)
        rng = random.Random(21)
        vals = [rng.randrange(spec.modulus) for _ in range(1 << 10)]
        y = nd.digit_ntt_planes(spec, _planes(f, vals), leaf=4)
        assert _ints(f, y) == ntt_ref(spec, vals)
    finally:
        nd.get_digit_domain.cache_clear()


def test_carry7_vectorized_vs_sequential():
    """The fold+Kogge-Stone carry (carry7_rows) and the kernel's sequential
    _carry_norm7 are independent implementations of the same base-2^7
    normalization — cross-check them on adversarial columns (max values,
    long 127-ripples)."""
    import numpy as np

    from tpu_ec.ops.ntt_digit import _carry_norm7, carry7_rows

    rng = np.random.default_rng(31)
    cols = rng.integers(0, 1 << 27, (37, 64), dtype=np.int64).astype(np.int32)
    cols[:, 0] = (1 << 27) - 1  # max columns: worst-case ripple
    cols[:10, 1] = 127  # long propagate run
    a = np.asarray(carry7_rows(jnp.asarray(cols), 42))
    b = np.stack(
        [np.asarray(x) for x in _carry_norm7([jnp.asarray(c) for c in cols], 42)]
    ).astype(np.int8)
    assert (a == b).all()
    # both must equal the integer value's true digits
    vals = [
        sum(int(cols[e, j]) << (7 * e) for e in range(37)) for j in range(64)
    ]
    for j in (0, 1, 5):
        got = sum(int(a[e, j]) << (7 * e) for e in range(42))
        assert got == vals[j]


def test_digit_domain_bounds():
    dom = get_digit_domain(BLS12_381_FR, 20, False, 7)
    assert dom.plan == [7, 7, 6]
    assert dom.d_in == 37
    # int32 accumulator headroom for the biggest leaf
    assert (1 << 7) * dom.d_in * 127 * 127 < (1 << 31)


def test_digit_ntt_batch_matches_single():
    """digit_ntt_planes_batch (the distributed NTT's local-stage kernel)
    column-for-column equals digit_ntt_planes, and roundtrips."""
    from tpu_ec.ops.ntt_digit import digit_ntt_planes_batch

    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(21)
    n, B = 1 << 8, 3
    cols = [[rng.randrange(spec.modulus) for _ in range(n)] for _ in range(B)]
    xpb = jnp.stack([_planes(f, c) for c in cols], axis=2)  # (L, n, B)
    yb = digit_ntt_planes_batch(spec, xpb, leaf=4)
    for b in range(B):
        y1 = digit_ntt_planes(spec, xpb[:, :, b], leaf=4)
        assert (np.asarray(yb[:, :, b]) == np.asarray(y1)).all()
    back = digit_ntt_planes_batch(spec, yb, inverse=True, leaf=4)
    assert (np.asarray(back) == np.asarray(xpb)).all()


def test_fft_kernel_equals_pallas_digit_2_12():
    """The library entry point (FftKernel.radix_fft) and the TPU-routed
    digit path (PallasFftKernel with ntt_impl='digit') are bit-exact equal
    at 2^12 — the contract behind FftKernel._route_pallas handing large
    on-chip transforms to the digit kernel (fft.rs:139-247: radix_fft IS
    the product entry point, backed by the fast device kernel)."""
    from tpu_ec.config import configure, get_config
    from tpu_ec.ops.pallas.ntt import PallasFftKernel

    spec = BLS12_381_FR
    f = field_ops(spec)
    rng = random.Random(12)
    vals = [rng.randrange(spec.modulus) for _ in range(1 << 12)]
    x = f.from_ints(vals)
    want = np.asarray(FftKernel(spec).radix_fft(x))
    old = get_config().ntt_impl
    configure(ntt_impl="digit")
    try:
        got = np.asarray(PallasFftKernel(spec, interpret=True).radix_fft(x))
    finally:
        configure(ntt_impl=old)
    assert (got == want).all()


def test_fft_kernel_routing_gate(monkeypatch):
    """FftKernel._route_pallas: routes on accelerator backends for
    log_n > 9 when a Pallas impl is selected; never on CPU or small n."""
    from tpu_ec.config import configure, get_config

    kern = FftKernel(BLS12_381_FR)
    old = get_config().ntt_impl
    try:
        configure(ntt_impl="digit")
        assert not kern._route_pallas(12)  # CPU backend (conftest)
        monkeypatch.setattr("jax.default_backend", lambda: "tpu")
        assert kern._route_pallas(12)
        assert not kern._route_pallas(9)  # too small to amortize
        configure(ntt_impl="fused")
        assert kern._route_pallas(12)
        configure(ntt_impl="pease")
        assert not kern._route_pallas(12)
    finally:
        configure(ntt_impl=old)
