"""Pallas Montgomery-mul kernel vs the jnp FieldOps path (cross-"backend"
consistency — the analog of the reference's CUDA-vs-OpenCL-vs-limb-width
cross checks, ag-build/src/tests/program.rs:85-120).  On CPU the kernel runs
in interpret mode; the same code compiles via Mosaic on a real TPU."""

import numpy as np
import pytest

from tpu_ec.fields import ALL_FIELDS, BLS12_381_FR, field_ops
from tpu_ec.fields.bigint import mont_mul_ref
from tpu_ec.ops.pallas.mont import mont_mul


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_mont_mul_matches_fieldops(spec, rng):
    f = field_ops(spec)
    n = 70  # deliberately not a multiple of the block: exercises padding
    a_int = [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63)) % spec.modulus for _ in range(n)]
    b_int = [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63)) % spec.modulus for _ in range(n)]
    a = f.from_ints(a_int)
    b = f.from_ints(b_int)
    got = np.asarray(mont_mul(spec, a, b, block=128))
    want = np.asarray(f.mul(a, b))
    assert (got == want).all()


def test_mont_mul_matches_bigint_oracle():
    import random

    spec = BLS12_381_FR
    f = field_ops(spec)
    r = random.Random(77)
    vals = [(r.randrange(spec.modulus), r.randrange(spec.modulus)) for _ in range(16)]
    a = f.from_ints([v[0] for v in vals], mont=False)
    b = f.from_ints([v[1] for v in vals], mont=False)
    got = f.to_ints(mont_mul(spec, a, b, block=128), mont=False)
    want = [mont_mul_ref(spec, x, y) for x, y in vals]
    assert got == want


def test_mont_mul_edge_values():
    spec = BLS12_381_FR
    f = field_ops(spec)
    p = spec.modulus
    xs = [0, 1, p - 1, p - 2, (p - 1) // 2]
    a = f.from_ints(xs)
    b = f.from_ints(list(reversed(xs)))
    got = f.to_ints(mont_mul(spec, a, b, block=128))
    want = [(x * y) % p for x, y in zip(xs, reversed(xs))]
    assert got == want
