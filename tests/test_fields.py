"""Differential field-op tests vs the Python bigint oracle.

Mirrors the reference's device-op unit tests (`ag-build/src/tests/
test_fields.rs:11-107`): random inputs per op, bit-exact comparison against
an independent host implementation, for every registered field.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ec.fields import (
    ALL_FIELDS,
    BLS12_381_FR,
    FieldSpec,
    field_ops,
    fp2_ops,
    limbs_to_int,
)
from tpu_ec.fields import bigint

N = 17  # batch size (odd, to catch shape assumptions)


def rand_elems(rng, spec: FieldSpec, n=N):
    return [int(rng.integers(0, 2**63)) ** 5 % spec.modulus for _ in range(n)]


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
class TestFieldOps:
    def test_roundtrip(self, rng, spec):
        f = field_ops(spec)
        vals = rand_elems(rng, spec)
        assert f.to_ints(f.from_ints(vals)) == vals
        # plain (non-Montgomery) roundtrip too
        assert f.to_ints(f.from_ints(vals, mont=False), mont=False) == vals

    def test_add_sub_neg_double(self, rng, spec):
        f = field_ops(spec)
        av, bv = rand_elems(rng, spec), rand_elems(rng, spec)
        # include edge cases: 0, p-1, p-1 vs p-1
        av[:3] = [0, spec.modulus - 1, spec.modulus - 1]
        bv[:3] = [0, spec.modulus - 1, 1]
        a, b = f.from_ints(av, mont=False), f.from_ints(bv, mont=False)
        assert f.to_ints(f.add(a, b), mont=False) == [
            bigint.add_ref(spec, x, y) for x, y in zip(av, bv)
        ]
        assert f.to_ints(f.sub(a, b), mont=False) == [
            bigint.sub_ref(spec, x, y) for x, y in zip(av, bv)
        ]
        assert f.to_ints(f.neg(a), mont=False) == [(-x) % spec.modulus for x in av]
        assert f.to_ints(f.double(a), mont=False) == [(2 * x) % spec.modulus for x in av]

    def test_mont_mul(self, rng, spec):
        f = field_ops(spec)
        av, bv = rand_elems(rng, spec), rand_elems(rng, spec)
        av[:2] = [0, spec.modulus - 1]
        bv[:2] = [spec.modulus - 1, spec.modulus - 1]
        a, b = f.from_ints(av, mont=False), f.from_ints(bv, mont=False)
        got = f.to_ints(f.mul(a, b), mont=False)
        want = [bigint.mont_mul_ref(spec, x, y) for x, y in zip(av, bv)]
        assert got == want

    def test_mul_mont_domain(self, rng, spec):
        """In-domain multiply equals modular product of the plain values."""
        f = field_ops(spec)
        av, bv = rand_elems(rng, spec), rand_elems(rng, spec)
        a, b = f.from_ints(av), f.from_ints(bv)
        got = f.to_ints(f.mul(a, b))
        assert got == [(x * y) % spec.modulus for x, y in zip(av, bv)]

    def test_mont_unmont(self, rng, spec):
        f = field_ops(spec)
        av = rand_elems(rng, spec)
        a = f.from_ints(av, mont=False)
        m = f.to_mont(a)
        assert f.to_ints(m, mont=False) == [bigint.mont_ref(spec, x) for x in av]
        assert f.to_ints(f.from_mont(m), mont=False) == av

    def test_sqr_pow(self, rng, spec):
        f = field_ops(spec)
        av = rand_elems(rng, spec)
        a = f.from_ints(av)
        assert f.to_ints(f.sqr(a)) == [(x * x) % spec.modulus for x in av]
        e = 0xDEADBEEFCAFE12345
        assert f.to_ints(f.pow(a, e)) == [pow(x, e, spec.modulus) for x in av]

    def test_inverse(self, rng, spec):
        f = field_ops(spec)
        av = rand_elems(rng, spec)
        av = [x if x else 1 for x in av]
        a = f.from_ints(av)
        assert f.to_ints(f.inv_(a)) == [bigint.inv_ref(spec, x) for x in av]

    def test_batch_inverse(self, rng, spec):
        f = field_ops(spec)
        av = rand_elems(rng, spec)
        av[3] = 0  # zero passes through as zero
        a = f.from_ints(av)
        got = f.to_ints(f.batch_inverse(a))
        want = [bigint.inv_ref(spec, x) if x else 0 for x in av]
        assert got == want

    def test_predicates_and_select(self, rng, spec):
        f = field_ops(spec)
        av = rand_elems(rng, spec)
        bv = list(av)
        bv[0] = (bv[0] + 1) % spec.modulus
        a, b = f.from_ints(av, mont=False), f.from_ints(bv, mont=False)
        eq = np.asarray(f.eq(a, b))
        assert not eq[0] and eq[1:].all()
        gte = np.asarray(f.gte(a, b))
        assert gte.tolist() == [x >= y for x, y in zip(av, bv)]
        sel = f.to_ints(f.select(f.eq(a, b), a, b), mont=False)
        assert sel == [y if x != y else x for x, y in zip(av, bv)]

    def test_pack_unpack(self, rng, spec):
        f = field_ops(spec)
        a = f.from_ints(rand_elems(rng, spec))
        packed = f.pack(a)
        assert packed.shape[-1] == f.L // 2
        assert (np.asarray(f.unpack(packed)) == np.asarray(a)).all()

    def test_get_bits(self, rng, spec):
        f = field_ops(spec)
        av = rand_elems(rng, spec)
        a = f.from_ints(av, mont=False)
        nbits = f.L * 16
        for skip, width in [(0, 4), (7, 9), (nbits - 5, 5)]:
            got = np.asarray(f.get_bits(a, skip, width)).tolist()
            want = [(x >> (nbits - skip - width)) & ((1 << width) - 1) for x in av]
            assert got == want


@pytest.mark.parametrize("spec", ALL_FIELDS, ids=lambda s: s.name)
def test_spec_constants(spec):
    """Montgomery constants satisfy their defining identities."""
    p = spec.modulus
    assert spec.one == spec.r % p
    assert spec.r2 == spec.r * spec.r % p
    assert (spec.inv * p) % (1 << 16) == (1 << 16) - 1
    assert (spec.inv32 * p) % (1 << 32) == (1 << 32) - 1
    assert limbs_to_int(spec.p_limbs) == p
    w = spec.root_of_unity
    s = spec.two_adicity
    assert pow(w, 1 << s, p) == 1
    assert pow(w, 1 << (s - 1), p) == p - 1


def test_known_bls12_381_fr_constants():
    """Cross-check against arkworks/blstrs published constants."""
    spec = BLS12_381_FR
    assert spec.two_adicity == 32
    assert spec.generator == 7  # arkworks Fr GENERATOR
    # generator must itself be a QNR for root_of_unity to have exact order
    assert pow(7, (spec.modulus - 1) // 2, spec.modulus) == spec.modulus - 1
    # arkworks/ark_ff TWO_ADIC_ROOT_OF_UNITY for BLS12-381 Fr (g=7 derived)
    assert spec.root_of_unity == pow(7, (spec.modulus - 1) >> 32, spec.modulus)
    # arkworks Fr::R (Montgomery one) for BLS12-381:
    assert spec.one == 0x1824B159ACC5056F998C4FEFECBC4FF55884B7FA0003480200000001FFFFFFFE


@pytest.mark.parametrize("spec", [BLS12_381_FR], ids=lambda s: s.name)
def test_fp2(rng, spec):
    """Fp2 ops vs bigint oracle (field2.cl parity)."""
    f2 = fp2_ops(spec)
    p = spec.modulus

    def pairs():
        return [
            (int(rng.integers(0, 2**63)) ** 5 % p, int(rng.integers(0, 2**63)) ** 5 % p)
            for _ in range(N)
        ]

    av, bv = pairs(), pairs()
    a, b = f2.from_ints(av), f2.from_ints(bv)

    def ref_mul(x, y):
        c0 = (x[0] * y[0] - x[1] * y[1]) % p
        c1 = (x[0] * y[1] + x[1] * y[0]) % p
        return (c0, c1)

    assert f2.to_ints(f2.add(a, b)) == [((x[0] + y[0]) % p, (x[1] + y[1]) % p) for x, y in zip(av, bv)]
    assert f2.to_ints(f2.sub(a, b)) == [((x[0] - y[0]) % p, (x[1] - y[1]) % p) for x, y in zip(av, bv)]
    assert f2.to_ints(f2.mul(a, b)) == [ref_mul(x, y) for x, y in zip(av, bv)]
    assert f2.to_ints(f2.sqr(a)) == [ref_mul(x, x) for x in av]
    # inverse: a * a^-1 == 1
    inv = f2.inv_(a)
    prod = f2.to_ints(f2.mul(a, inv))
    assert all(pr == (1, 0) for pr in prod)


def test_pow_lookup(rng):
    """pow via precomputed squares table (FIELD_pow_lookup, field.cl:342-352)."""
    import numpy as np

    from tpu_ec.fields.params import int_to_limbs

    spec = BLS12_381_FR
    f = field_ops(spec)
    p = spec.modulus
    base_int = int(rng.integers(1, 2**63)) ** 3 % p
    exps = [0, 1, int(rng.integers(0, 2**63)), p - 2]
    base = f.from_ints([base_int] * len(exps))
    table = f.pow_table(base)
    e = jnp.asarray(
        np.stack([int_to_limbs(x, f.L) for x in exps]).astype(np.uint32)
    )
    got = f.to_ints(f.pow_lookup(table, e))
    assert got == [pow(base_int, x, p) for x in exps]
