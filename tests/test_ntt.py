"""NTT differential tests vs the bigint oracle.

Mirrors the reference's FFT integration tests (`ec-gpu-proxy/tests/fft.rs:
29-176`): size sweep 2^1..2^10 vs a CPU oracle, batched transforms, inverse
round-trips, and the elementwise scale kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ec.fields import BLS12_381_FR, BN254_FR, field_ops
from tpu_ec.ops.ntt import FftKernel, get_domain, ntt_ref

SPECS = [BLS12_381_FR, BN254_FR]


def rand_vals(rng, spec, n):
    return [int(rng.integers(0, 2**63)) ** 3 % spec.modulus for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [1, 2, 5, 8, 10])
def test_ntt_vs_oracle(rng, spec, log_n):
    f = field_ops(spec)
    k = FftKernel(spec)
    vals = rand_vals(rng, spec, 1 << log_n)
    x = f.from_ints(vals)
    got = f.to_ints(k.radix_fft(x))
    assert got == ntt_ref(spec, vals)


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_intt_roundtrip(rng, spec):
    f = field_ops(spec)
    k = FftKernel(spec)
    vals = rand_vals(rng, spec, 1 << 9)
    x = f.from_ints(vals)
    back = k.radix_fft(k.radix_fft(x), inverse=True)
    assert f.to_ints(back) == vals
    # inverse oracle agrees too
    assert f.to_ints(k.radix_fft(x, inverse=True)) == ntt_ref(spec, vals, inverse=True)


def test_ntt_delta_and_linearity(rng):
    spec = BLS12_381_FR
    f = field_ops(spec)
    k = FftKernel(spec)
    n = 1 << 6
    # delta at 0 -> all ones
    delta = [1] + [0] * (n - 1)
    got = f.to_ints(k.radix_fft(f.from_ints(delta)))
    assert got == [1] * n
    # delta at 1 -> successive powers of omega
    delta1 = [0, 1] + [0] * (n - 2)
    got = f.to_ints(k.radix_fft(f.from_ints(delta1)))
    dom = get_domain(spec, 6)
    assert got == [pow(dom.omega, i, spec.modulus) for i in range(n)]


def test_radix_fft_many(rng):
    spec = BLS12_381_FR
    f = field_ops(spec)
    k = FftKernel(spec)
    n, b = 1 << 7, 3
    vals = [rand_vals(rng, spec, n) for _ in range(b)]
    xs = jnp.stack([f.from_ints(v) for v in vals])
    out = k.radix_fft_many(xs)
    for i in range(b):
        assert f.to_ints(out[i]) == ntt_ref(spec, vals[i])
    # list form
    out2 = k.radix_fft_many([f.from_ints(v) for v in vals])
    for i in range(b):
        assert f.to_ints(out2[i]) == ntt_ref(spec, vals[i])


def test_mul_by_field(rng):
    spec = BLS12_381_FR
    f = field_ops(spec)
    k = FftKernel(spec)
    vals = rand_vals(rng, spec, 16)
    c = 0xABCDEF0123456789
    got = f.to_ints(k.mul_by_field(f.from_ints(vals), c))
    assert got == [(v * c) % spec.modulus for v in vals]


def test_abort_hook():
    from tpu_ec.errors import Aborted

    spec = BLS12_381_FR
    f = field_ops(spec)
    k = FftKernel(spec, maybe_abort=lambda: True)
    with pytest.raises(Aborted):
        k.radix_fft(f.from_ints([1, 2]))


def test_domain_too_large():
    with pytest.raises(ValueError):
        get_domain(BLS12_381_FR, 33)
