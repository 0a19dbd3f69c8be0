"""Pallas NTT vs the jnp FftKernel (cross-backend consistency) and the
bigint oracle — interpret mode on CPU, Mosaic on TPU."""

import random

import numpy as np
import pytest

from tpu_ec.fields import BLS12_381_FR, BN254_FR, field_ops
from tpu_ec.ops.ntt import FftKernel, ntt_ref
from tpu_ec.ops.pallas.ntt import PallasFftKernel


@pytest.mark.parametrize("spec", [BLS12_381_FR, BN254_FR], ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [4, 9])
def test_pallas_ntt_vs_oracle(spec, log_n):
    f = field_ops(spec)
    r = random.Random(100 + log_n)
    vals = [r.randrange(spec.modulus) for _ in range(1 << log_n)]
    x = f.from_ints(vals)
    got = f.to_ints(PallasFftKernel(spec, block=128).radix_fft(x))
    assert got == ntt_ref(spec, vals)


@pytest.mark.slow  # interpret-mode lowering, minutes cold
def test_pallas_ntt_matches_jnp():
    spec = BLS12_381_FR
    f = field_ops(spec)
    r = random.Random(103)
    vals = [r.randrange(spec.modulus) for _ in range(1 << 10)]
    x = f.from_ints(vals)
    a = np.asarray(PallasFftKernel(spec, block=128).radix_fft(x))
    b = np.asarray(FftKernel(spec).radix_fft(x))
    assert (a == b).all()


def test_pallas_intt_roundtrip():
    spec = BN254_FR
    f = field_ops(spec)
    r = random.Random(104)
    vals = [r.randrange(spec.modulus) for _ in range(1 << 8)]
    x = f.from_ints(vals)
    kern = PallasFftKernel(spec, block=128)
    back = kern.radix_fft(kern.radix_fft(x), inverse=True)
    assert f.to_ints(back) == vals


@pytest.mark.slow  # interpret-mode lowering, minutes cold
def test_fused_ntt_roundtrip_2_10():
    """Fused multi-stage path (log_n > 9 routes through ntt_fused):
    forward + inverse bit-exact at 2^10 (two recursion levels)."""
    spec = BLS12_381_FR
    f = field_ops(spec)
    r = random.Random(105)
    vals = [r.randrange(spec.modulus) for _ in range(1 << 10)]
    x = f.from_ints(vals)
    k = PallasFftKernel(spec)
    y = k.radix_fft(x)
    assert f.to_ints(k.radix_fft(y, inverse=True)) == vals
