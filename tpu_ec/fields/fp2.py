"""Quadratic extension field Fp2 = Fp[u]/(u^2 + 1).

TPU-native counterpart of the generated Fp2 template (`ag-build/cl/field2.cl`):
elements are pairs (c0, c1) of base-field limb batches, u^2 = -1 for both
BLS12-381 and BN254 (matching the reference's hardcoded nonresidue in
field2.cl:37-47).  Multiplication is the 3-mul Karatsuba of field2.cl:37-47
and squaring the (a0+a1)(a0-a1) trick of field2.cl:55-61.

An Fp2 batch is a pytree tuple ``(c0, c1)`` with each part ``uint32[..., L]``,
so Fp2-valued code (EC over G2) reuses the generic point formulas unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fp import FieldOps, field_ops
from .params import FieldSpec


class Fp2Ops:
    """Batched Fp2 ops, same method surface as FieldOps so curve code is
    generic over the base field (the BASE genericity of ag-build/cl/ec.cl)."""

    def __init__(self, base: FieldOps):
        self.fp = base
        self.spec = base.spec
        self.L = base.L
        self.one = (base.one, base.zero)
        self.zero = (base.zero, base.zero)
        for name in ("add", "sub", "neg", "double", "mul", "sqr", "inv_", "eq", "is_zero"):
            setattr(self, name, jax.jit(getattr(self, name)))

    def constant(self, c0: int, c1: int = 0, mont: bool = True):
        return (self.fp.constant(c0, mont), self.fp.constant(c1, mont))

    # -- predicates -------------------------------------------------------
    def eq(self, a, b):
        return self.fp.eq(a[0], b[0]) & self.fp.eq(a[1], b[1])

    def is_zero(self, a):
        return self.fp.is_zero(a[0]) & self.fp.is_zero(a[1])

    def select(self, cond, a, b):
        return (self.fp.select(cond, a[0], b[0]), self.fp.select(cond, a[1], b[1]))

    # -- ring ops (field2.cl:19-61) ---------------------------------------
    def add(self, a, b):
        return (self.fp.add(a[0], b[0]), self.fp.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fp.sub(a[0], b[0]), self.fp.sub(a[1], b[1]))

    def neg(self, a):
        return (self.fp.neg(a[0]), self.fp.neg(a[1]))

    def double(self, a):
        return (self.fp.double(a[0]), self.fp.double(a[1]))

    def mul(self, a, b):
        """(a0 + a1 u)(b0 + b1 u) with u^2 = -1: 3 base muls (field2.cl:37-47)."""
        f = self.fp
        aa = f.mul(a[0], b[0])
        bb = f.mul(a[1], b[1])
        o = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        c0 = f.sub(aa, bb)
        c1 = f.sub(f.sub(o, aa), bb)
        return (c0, c1)

    def sqr(self, a):
        """(a0^2 - a1^2, 2 a0 a1) via (a0+a1)(a0-a1) (field2.cl:55-61)."""
        f = self.fp
        ab = f.mul(a[0], a[1])
        c0 = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        return (c0, f.double(ab))

    def mul_by_fp(self, a, k):
        """Scale by a base-field element (used for twist constants)."""
        kb0 = jnp.broadcast_to(k, a[0].shape)
        return (self.fp.mul(a[0], kb0), self.fp.mul(a[1], kb0))

    # -- inversion --------------------------------------------------------
    def inv_(self, a):
        """1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)."""
        f = self.fp
        norm = f.add(f.sqr(a[0]), f.sqr(a[1]))
        ninv = f.inv_(norm)
        return (f.mul(a[0], ninv), f.neg(f.mul(a[1], ninv)))

    # -- host conversion --------------------------------------------------
    def from_ints(self, values, mont: bool = True):
        """values: list of (c0, c1) int pairs -> pytree of (N, L) arrays."""
        c0 = self.fp.from_ints([v[0] for v in values], mont)
        c1 = self.fp.from_ints([v[1] for v in values], mont)
        return (c0, c1)

    def to_ints(self, a, mont: bool = True):
        c0 = self.fp.to_ints(a[0], mont)
        c1 = self.fp.to_ints(a[1], mont)
        return list(zip(c0, c1))


@functools.lru_cache(maxsize=None)
def fp2_ops(spec: FieldSpec) -> Fp2Ops:
    return Fp2Ops(field_ops(spec))
