"""Pure-Python elliptic-curve oracle for differential testing.

The reference validates device EC ops against arkworks host arithmetic
(`ag-build/src/tests/test_ec.rs:8-37`, `ag-cuda-ec/src/multiexp.rs:93-144`
vs `VariableBaseMSM::msm_bigint`).  Without arkworks on this host, the
authoritative oracle is plain-Python bigint affine arithmetic — a
*structurally different* implementation from the vectorized Jacobian
formulas in point.py, so errors don't cancel.

Elements are plain ints (or (c0,c1) pairs for Fq2); points are affine
(x, y) tuples with ``None`` as the identity.
"""

from __future__ import annotations

import random

from .params import CurveSpec

Aff = tuple  # (x, y) in plain-int (or Fp2 pair) coordinates; None = identity


class _F:
    """Tiny field adapter so one oracle covers Fq and Fq2 coordinates."""

    def __init__(self, p: int, ext: int):
        self.p, self.ext = p, ext

    def add(self, a, b):
        if self.ext == 1:
            return (a + b) % self.p
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        if self.ext == 1:
            return (a - b) % self.p
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def mul(self, a, b):
        if self.ext == 1:
            return (a * b) % self.p
        return (
            (a[0] * b[0] - a[1] * b[1]) % self.p,
            (a[0] * b[1] + a[1] * b[0]) % self.p,
        )

    def sqr(self, a):
        return self.mul(a, a)

    def neg(self, a):
        if self.ext == 1:
            return (-a) % self.p
        return ((-a[0]) % self.p, (-a[1]) % self.p)

    def inv(self, a):
        if self.ext == 1:
            return pow(a, -1, self.p)
        norm = (a[0] * a[0] + a[1] * a[1]) % self.p
        ninv = pow(norm, -1, self.p)
        return ((a[0] * ninv) % self.p, (-a[1] * ninv) % self.p)

    def scale(self, a, k: int):
        if self.ext == 1:
            return (a * k) % self.p
        return ((a[0] * k) % self.p, (a[1] * k) % self.p)

    @property
    def zero(self):
        return 0 if self.ext == 1 else (0, 0)


def _field(spec: CurveSpec) -> _F:
    return _F(spec.base.modulus, spec.ext)


def is_on_curve(spec: CurveSpec, pt: Aff | None) -> bool:
    if pt is None:
        return True
    f = _field(spec)
    x, y = pt
    return f.sqr(y) == f.add(f.mul(f.sqr(x), x), spec.b if spec.ext == 2 else spec.b % spec.base.modulus)


def add(spec: CurveSpec, p: Aff | None, q: Aff | None) -> Aff | None:
    """Affine chord-and-tangent addition (textbook; the independent oracle)."""
    f = _field(spec)
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if f.add(y1, y2) == f.zero:
            return None
        # tangent: lam = 3 x^2 / 2 y   (a = 0)
        lam = f.mul(f.scale(f.sqr(x1), 3), f.inv(f.scale(y1, 2)))
    else:
        lam = f.mul(f.sub(y2, y1), f.inv(f.sub(x2, x1)))
    x3 = f.sub(f.sub(f.sqr(lam), x1), x2)
    y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
    return (x3, y3)


def neg(spec: CurveSpec, p: Aff | None) -> Aff | None:
    if p is None:
        return None
    f = _field(spec)
    return (p[0], f.neg(p[1]))


def scalar_mul(spec: CurveSpec, p: Aff | None, k: int) -> Aff | None:
    k %= spec.scalar.modulus
    acc, base = None, p
    while k:
        if k & 1:
            acc = add(spec, acc, base)
        base = add(spec, base, base)
        k >>= 1
    return acc


def generator(spec: CurveSpec) -> Aff:
    return (spec.gen_x, spec.gen_y)


def msm(spec: CurveSpec, points: list[Aff | None], scalars: list[int]) -> Aff | None:
    """Naive sum_i scalars[i] * points[i] (multiexp_cpu.rs:380-420's oracle)."""
    acc = None
    for pt, s in zip(points, scalars):
        acc = add(spec, acc, scalar_mul(spec, pt, s))
    return acc


def random_points(spec: CurveSpec, n: int, seed: int = 0) -> list[Aff]:
    """n pseudo-random group elements as k_i * G (cheap and always valid;
    the reference samples with Arc<rng> similarly, test_tools.rs:1-15)."""
    rng = random.Random(seed)
    g = generator(spec)
    # random small-window table walk: k*G for random 64-bit k keeps the
    # oracle cost O(n * 64) adds instead of O(n * 255)
    return [scalar_mul(spec, g, rng.getrandbits(64) | 1) for _ in range(n)]


def random_scalars(spec: CurveSpec, n: int, seed: int = 1) -> list[int]:
    rng = random.Random(seed)
    return [rng.randrange(spec.scalar.modulus) for _ in range(n)]
