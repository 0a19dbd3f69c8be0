"""Vectorized short-Weierstrass Jacobian point arithmetic (a = 0 curves).

TPU-native replacement for the generated EC template (`ag-build/cl/ec.cl`):
`POINT_double` (dbl-2009-l, ec.cl:17-42), `POINT_add_mixed` (madd-2007-bl,
ec.cl:45-82), `POINT_add` (add-2007-bl, ec.cl:85-120), neg/sub
(ec.cl:122-134) and double-and-add scalar mul (ec.cl:136-148).

Exactly like the template is generic over BASE (so G1 and G2 instantiate the
same source, `ag-build/src/source/builder.rs:66-72`), :class:`PointOps` is
generic over the field-ops object: `FieldOps` (G1, coords in Fq) or `Fp2Ops`
(G2, coords as (c0, c1) pytrees).

Branchless design: the reference kernels *branch* on identity/equality
(ec.cl:17-21,45-61) — fine for SIMT, hostile to 8x128-lane vectorization.
Here every case is computed and `select`ed.  Two cases are free by
construction with the z=0 identity encoding (POINT_ZERO, ec.cl:3):
doubling the identity yields Z3 = 2*Y*Z = 0, and adding P + (-P) yields
Z3 = (...)*H = 0, so only {P=0, Q=0, P=Q} need explicit selects.

Point batches are pytrees:
  affine   (x, y)     with (0, 0) = identity (GpuRepr, ag-types/src/impls.rs:48-58)
  jacobian (x, y, z)  with z = 0  = identity
each coordinate a ``uint32[..., L]`` limb batch (or an (c0, c1) pair for G2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import field_ops
from ..fields.fp2 import fp2_ops
from ..fields.params import int_to_limbs
from .params import CurveSpec
from . import oracle


def _batch_inverse(F, a):
    """Montgomery batch inversion over the leading axis, generic over the
    field-ops object (works for Fq arrays and Fq2 pytrees); zeros -> zeros."""
    n = jax.tree_util.tree_leaves(a)[0].shape[0]
    iz = F.is_zero(a)
    one = jax.tree_util.tree_map(
        lambda c, ref: jnp.broadcast_to(jnp.asarray(c), ref.shape),
        F.one, a, is_leaf=lambda x: isinstance(x, np.ndarray),
    )
    safe = F.select(iz, one, a)
    pre = jax.lax.associative_scan(F.mul, safe, axis=0)
    suf = jax.lax.associative_scan(
        F.mul, jax.tree_util.tree_map(lambda c: c[::-1], safe), axis=0
    )
    suf = jax.tree_util.tree_map(lambda c: c[::-1], suf)
    total_inv = F.inv_(jax.tree_util.tree_map(lambda c: c[n - 1], pre))
    left = jax.tree_util.tree_map(
        lambda o, c: jnp.concatenate([o[:1], c[:-1]], axis=0), one, pre
    )
    right = jax.tree_util.tree_map(
        lambda o, c: jnp.concatenate([c[1:], o[:1]], axis=0), one, suf
    )
    out = F.mul(F.mul(left, right), jax.tree_util.tree_map(
        lambda t, ref: jnp.broadcast_to(t, ref.shape), total_inv, safe))
    zero = jax.tree_util.tree_map(jnp.zeros_like, safe)
    return F.select(iz, zero, out)


def _pallas_ec_min() -> int:
    """Batches at least this large route through the fused Pallas point
    kernels (ops/pallas/point.py) on TPU; below it the fused-XLA jnp path
    wins on dispatch overhead.  Config field ``pallas_ec_min``
    (TPU_EC_PALLAS_EC_MIN env; 0 disables)."""
    from ..config import get_config

    return get_config().pallas_ec_min


class PointOps:
    """Batched Jacobian group ops bound to one :class:`CurveSpec`.

    Group ops dispatch per-shape: large 1-batch-dim G1 batches use the fused
    Pallas kernels (every field op of the formula VMEM-resident — the analog
    of the hand-written device code in ag-build/cl/ec.cl), everything else
    the composable jnp formulas below.  Both paths are bit-identical.
    """

    def __init__(self, spec: CurveSpec):
        self.spec = spec
        self.fq = field_ops(spec.base)
        self.F = self.fq if spec.ext == 1 else fp2_ops(spec.base)
        self.fr = field_ops(spec.scalar)
        self.L = self.fq.L

    # -- Pallas fused-kernel dispatch ----------------------------------------

    def _pallas_batch(self, P) -> int:
        """Flattenable batch size if the fused kernel applies, else 0.

        CPU backend always takes the jnp path: Pallas-interpret there is
        strictly slower to compile AND run (its kernel jaxpr gets expanded
        to HLO through the interpreter — minutes per shape instance under
        shard_map), and it is exercised explicitly by the parity tests
        (tests/test_pallas_point.py) instead.  This gate is what makes the
        virtual-mesh dryrun and the CPU suite finish (round-4 fix for the
        MULTICHIP_r03 rc=124 regression)."""
        m = _pallas_ec_min()
        if self.spec.ext != 1 or m <= 0 or jax.default_backend() == "cpu":
            return 0
        leaf = jax.tree_util.tree_leaves(P)[0]
        n = int(np.prod(leaf.shape[:-1])) if leaf.ndim > 1 else 0
        return n if n >= m else 0

    @staticmethod
    def _flat(coords, n, L):
        return [c.reshape(n, L) for c in coords]

    # -- constants / constructors ------------------------------------------

    def _c(self, v) -> object:
        """Plain curve-constant (int or Fp2 pair) -> Montgomery limb const."""
        if self.spec.ext == 1:
            return self.F.constant(v)
        return self.F.constant(v[0], v[1])

    def _bcast(self, const, like):
        """Broadcast a per-element constant to the batch shape of ``like``."""
        return jax.tree_util.tree_map(
            lambda c, ref: jnp.broadcast_to(jnp.asarray(c), ref.shape),
            const, like, is_leaf=lambda x: isinstance(x, np.ndarray),
        )

    @functools.cached_property
    def generator_affine(self):
        """(x, y) limb arrays of the subgroup generator, batch shape ()."""
        gx, gy = self.spec.gen_x, self.spec.gen_y
        return (self._c(gx), self._c(gy))

    def identity_jacobian(self, batch_shape=()):
        z = (
            jnp.zeros(batch_shape + (self.L,), jnp.uint32)
            if self.spec.ext == 1
            else (
                jnp.zeros(batch_shape + (self.L,), jnp.uint32),
                jnp.zeros(batch_shape + (self.L,), jnp.uint32),
            )
        )
        return (z, z, z)

    # -- predicates ---------------------------------------------------------

    def is_identity(self, P):
        return self.F.is_zero(P[2])

    def is_identity_affine(self, A):
        return self.F.is_zero(A[0]) & self.F.is_zero(A[1])

    def select(self, cond, P, Q):
        F = self.F
        return tuple(F.select(cond, p, q) for p, q in zip(P, Q))

    def eq(self, P, Q):
        """Jacobian equality by cross-multiplication (no inversion)."""
        F = self.F
        z1z1, z2z2 = F.sqr(P[2]), F.sqr(Q[2])
        x_eq = F.eq(F.mul(P[0], z2z2), F.mul(Q[0], z1z1))
        y_eq = F.eq(
            F.mul(P[1], F.mul(Q[2], z2z2)), F.mul(Q[1], F.mul(P[2], z1z1))
        )
        i1, i2 = self.is_identity(P), self.is_identity(Q)
        return jnp.where(i1 | i2, i1 == i2, x_eq & y_eq)

    # -- conversions ---------------------------------------------------------

    def to_jacobian(self, A):
        """Affine -> Jacobian; (0,0) identity -> z = 0 (ec.cl:5-14 typedefs)."""
        x, y = A
        one = self._bcast(self.F.one, x)
        zero = jax.tree_util.tree_map(jnp.zeros_like, one)
        z = self.F.select(self.is_identity_affine(A), zero, one)
        return (x, y, z)

    def to_affine(self, P):
        """Jacobian -> affine via one batched inversion of z (identity->(0,0)).

        The reference never needs this on device (results return to host in
        Jacobian and arkworks normalizes); here it is the device-side
        equivalent of that host step, using Montgomery batch inversion so a
        whole result batch costs ONE Fermat inversion.

        Eager calls on an accelerator backend run as ONE jitted program:
        the Fermat-inversion chain is ~300 ops, and dispatching them one by
        one through the axon tunnel measured 338 s for a 1024-point batch
        (and that post-program dispatch storm is where the r4 batch-MSM
        "readback faults" fired).  Traced calls inline as before."""
        if jax.default_backend() != "cpu" and not any(
            isinstance(l, jax.core.Tracer) for l in jax.tree_util.tree_leaves(P)
        ):
            return self._to_affine_jit(P)
        return self._to_affine_impl(P)

    @functools.cached_property
    def _to_affine_jit(self):
        return jax.jit(self._to_affine_impl)

    def _to_affine_impl(self, P):
        F = self.F
        leading = jax.tree_util.tree_leaves(P[2])[0].shape[:-1]
        flat = jax.tree_util.tree_map(lambda c: c.reshape((-1, c.shape[-1])), P[2])
        zinv = _batch_inverse(F, flat)
        zinv = jax.tree_util.tree_map(
            lambda c, ref: c.reshape(ref.shape), zinv, P[2]
        )
        zinv2 = F.sqr(zinv)
        x = F.mul(P[0], zinv2)
        y = F.mul(P[1], F.mul(zinv, zinv2))
        ident = self.is_identity(P)
        zero = jax.tree_util.tree_map(jnp.zeros_like, x)
        return (F.select(ident, zero, x), F.select(ident, zero, y))

    # -- group ops (ec.cl parity) --------------------------------------------

    def double(self, P):
        """dbl-2009-l (ec.cl:17-42); identity-safe for free (Z3 = 2YZ = 0)."""
        n = self._pallas_batch(P)
        if n:
            from ..ops.pallas.point import jac_double

            shape = P[0].shape
            out = jac_double(self.spec.base, self._flat(P, n, self.L))
            return tuple(o.reshape(shape) for o in out)
        F = self.F
        X, Y, Z = P
        A = F.sqr(X)
        B = F.sqr(Y)
        C = F.sqr(B)
        D = F.double(F.sub(F.sub(F.sqr(F.add(X, B)), A), C))
        E = F.add(F.double(A), A)
        FF = F.sqr(E)
        X3 = F.sub(FF, F.double(D))
        eightC = F.double(F.double(F.double(C)))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
        Z3 = F.double(F.mul(Y, Z))
        return (X3, Y3, Z3)

    def add(self, P, Q):
        """add-2007-bl (ec.cl:85-120) with select-based completeness."""
        n = self._pallas_batch(P)
        if n and P[0].shape == Q[0].shape:
            from ..ops.pallas.point import jac_add

            shape = P[0].shape
            out = jac_add(
                self.spec.base,
                self._flat(P, n, self.L),
                self._flat(Q, n, self.L),
            )
            return tuple(o.reshape(shape) for o in out)
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = F.sqr(Z1)
        Z2Z2 = F.sqr(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, U1)
        I = F.sqr(F.double(H))
        J = F.mul(H, I)
        rr = F.double(F.sub(S2, S1))
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.sqr(rr), J), F.double(V))
        Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.double(F.mul(S1, J)))
        Z3 = F.mul(F.sub(F.sub(F.sqr(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)
        R = (X3, Y3, Z3)
        i1, i2 = self.is_identity(P), self.is_identity(Q)
        same = (~i1) & (~i2) & F.is_zero(H) & F.is_zero(rr)
        R = self.select(same, self.double(P), R)
        R = self.select(i2, P, R)
        R = self.select(i1, Q, R)
        return R

    def add_mixed(self, P, A):
        """madd-2007-bl: Jacobian + affine (ec.cl:45-82), the MSM hot op —
        7M + 4S instead of 11M + 5S for the full add."""
        n = self._pallas_batch(P)
        if n and P[0].shape == A[0].shape:
            from ..ops.pallas.point import jac_add_mixed

            shape = P[0].shape
            out = jac_add_mixed(
                self.spec.base,
                self._flat(P, n, self.L),
                self._flat(A, n, self.L),
            )
            return tuple(o.reshape(shape) for o in out)
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2 = A
        Z1Z1 = F.sqr(Z1)
        U2 = F.mul(X2, Z1Z1)
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, X1)
        HH = F.sqr(H)
        I = F.double(F.double(HH))
        J = F.mul(H, I)
        rr = F.double(F.sub(S2, Y1))
        V = F.mul(X1, I)
        X3 = F.sub(F.sub(F.sqr(rr), J), F.double(V))
        Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.double(F.mul(Y1, J)))
        Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), Z1Z1), HH)
        R = (X3, Y3, Z3)
        i1 = self.is_identity(P)
        i2 = self.is_identity_affine(A)
        same = (~i1) & (~i2) & F.is_zero(H) & F.is_zero(rr)
        R = self.select(same, self.double(P), R)
        R = self.select(i2, P, R)
        R = self.select(i1, self.to_jacobian(A), R)
        return R

    def neg(self, P):
        """(ec.cl:122-126)."""
        return (P[0], self.F.neg(P[1]), P[2])

    def neg_affine(self, A):
        """(ec.cl:128-130)."""
        return (A[0], self.F.neg(A[1]))

    def sub(self, P, Q):
        """(ec.cl:132-134)."""
        return self.add(P, self.neg(Q))

    def scalar_mul(self, P, k):
        """Double-and-add, MSB-first (POINT_mul, ec.cl:136-148).

        ``k`` is a plain-integer (non-Montgomery) scalar-field limb batch
        ``uint32[..., Ls]`` broadcastable against P's batch; the loop is a
        fori_loop so the traced graph holds one double + one add."""
        fr = self.fr
        nbits = fr.L * 16

        def body(i, acc):
            bit_index = nbits - 1 - i
            limb = k[..., bit_index // 16]
            bit = (limb >> jnp.uint32(bit_index % 16)) & 1
            acc = self.double(acc)
            return self.select(bit == 1, self.add(acc, P), acc)

        batch = jax.tree_util.tree_leaves(P[0])[0].shape[:-1]
        return jax.lax.fori_loop(0, nbits, body, self.identity_jacobian(batch))

    # -- host conversion (GpuRepr parity, impls.rs:48-58) ---------------------

    def from_affine_ints(self, points):
        """List of oracle affine points (None = identity) -> (x, y) device
        batch in Montgomery form with identity -> (0, 0)."""
        if self.spec.ext == 1:
            xs = [0 if p is None else p[0] for p in points]
            ys = [0 if p is None else p[1] for p in points]
            return (self.fq.from_ints(xs), self.fq.from_ints(ys))
        F = self.F
        xs = [(0, 0) if p is None else p[0] for p in points]
        ys = [(0, 0) if p is None else p[1] for p in points]
        return (F.from_ints(xs), F.from_ints(ys))

    def to_affine_ints(self, A):
        """(x, y) affine device batch -> list of oracle points."""
        xs = self.F.to_ints(A[0])
        ys = self.F.to_ints(A[1])
        zero = 0 if self.spec.ext == 1 else (0, 0)
        return [
            None if (x == zero and y == zero) else (x, y)
            for x, y in zip(xs, ys)
        ]

    def scalars_to_limbs(self, scalars) -> jnp.ndarray:
        """Plain ints -> (N, Ls) non-Montgomery limb batch for scalar_mul/MSM
        digit extraction (the reference's to_repr step, multiexp.rs:152-153)."""
        return self.fr.from_ints(list(scalars), mont=False)


@functools.lru_cache(maxsize=None)
def point_ops(spec: CurveSpec) -> PointOps:
    return PointOps(spec)
