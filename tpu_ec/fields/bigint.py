"""Pure-Python bigint oracle for differential testing.

The reference validates every device op against arkworks host arithmetic
(`ag-build/src/tests/test_fields.rs:11-107`); here the authoritative oracle is
Python's arbitrary-precision ints, including an independent word-by-word
Montgomery multiplication (so the vectorized carry handling in fp.py is
cross-checked against a structurally different implementation, not just
against ``(a*b*R^-1) % p``).
"""

from __future__ import annotations

from .params import LIMB_BITS, LIMB_MASK, FieldSpec


def mont_mul_ref(spec: FieldSpec, a: int, b: int) -> int:
    """Word-serial CIOS Montgomery multiply (mirrors field.cl:268-299
    semantics) on 16-bit words, in pure Python."""
    L = spec.n_limbs
    p = spec.modulus
    inv = spec.inv
    t = 0
    for i in range(L):
        ai = (a >> (LIMB_BITS * i)) & LIMB_MASK
        t += ai * b
        m = ((t & LIMB_MASK) * inv) & LIMB_MASK
        t += m * p
        assert t & LIMB_MASK == 0
        t >>= LIMB_BITS
    if t >= p:
        t -= p
    return t


def mont_ref(spec: FieldSpec, a: int) -> int:
    return (a * spec.r) % spec.modulus


def unmont_ref(spec: FieldSpec, a: int) -> int:
    return (a * pow(spec.r, -1, spec.modulus)) % spec.modulus


def add_ref(spec: FieldSpec, a: int, b: int) -> int:
    return (a + b) % spec.modulus


def sub_ref(spec: FieldSpec, a: int, b: int) -> int:
    return (a - b) % spec.modulus


def inv_ref(spec: FieldSpec, a: int) -> int:
    return pow(a, -1, spec.modulus)


def pow_ref(spec: FieldSpec, a: int, e: int) -> int:
    return pow(a, e, spec.modulus)
