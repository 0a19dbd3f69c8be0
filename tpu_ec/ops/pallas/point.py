"""Pallas TPU kernels: fused Jacobian point arithmetic in plane layout.

The TPU-native analog of the generated EC device code (`ag-build/cl/ec.cl`):
one kernel evaluates a whole batched group op — every field multiply of
dbl-2009-l / add-2007-bl / madd-2007-bl VMEM-resident — instead of the
fused-XLA path in curves/point.py which round-trips each field op's
intermediates through HHLO fusion heuristics.  This is the hot op of MSM
(multiexp.cl:95-119 does one `POINT_add_mixed` per element per window).

Layout and field arithmetic come from ops/pallas/mont.py: coordinates are
``uint32[L, N]`` limb planes, batch in lanes.  Branch completeness follows
curves/point.py: compute the add, the double (for P == Q) and select —
branchless, exactly the same select tree, so results are bit-identical to
the jnp path (tests assert this).

Only ext=1 curves (G1) get the fused kernel; G2's Fp2 tower reuses the jnp
path (its batches are far smaller in practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...fields.params import FieldSpec
from .mont import PlaneField

U32 = jnp.uint32
DEFAULT_BLOCK = 256


class PlanePointField:
    """Field-op helpers over (L, N) planes used by the point kernels."""

    def __init__(self, spec: FieldSpec):
        self.pf = PlaneField(spec)
        self.L = spec.n_limbs

    # thin wrappers binding the constants once per kernel body
    def bind(self, p, npr):
        pf = self.pf

        class F:
            @staticmethod
            def add(a, b):
                return pf.add(a, b, p)

            @staticmethod
            def sub(a, b):
                return pf.sub(a, b, p)

            @staticmethod
            def mul(a, b):
                return pf.mul(a, b, p, npr)

            @staticmethod
            def sqr(a):
                return pf.mul(a, a, p, npr)

            @staticmethod
            def double(a):
                return pf.add(a, a, p)

            @staticmethod
            def is_zero(a):
                return jnp.all(a == 0, axis=0, keepdims=True)  # (1, N)

            @staticmethod
            def select(cond, a, b):
                return jnp.where(cond, a, b)  # cond (1, N) broadcasts

            @staticmethod
            def zeros_like(a):
                return jnp.zeros_like(a)

        return F


def _double_body(F, X, Y, Z):
    """dbl-2009-l (ec.cl:17-42); identity-safe (Z3 = 2YZ = 0)."""
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
    return X3, Y3, Z3


def _add_body(F, X1, Y1, Z1, X2, Y2, Z2):
    """add-2007-bl with the same select-completeness as PointOps.add."""
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

    i1 = F.is_zero(Z1)
    i2 = F.is_zero(Z2)
    same = (~i1) & (~i2) & F.is_zero(H) & F.is_zero(rr)
    dX, dY, dZ = _double_body(F, X1, Y1, Z1)
    out = []
    for r, d, a, b in ((X3, dX, X1, X2), (Y3, dY, Y1, Y2), (Z3, dZ, Z1, Z2)):
        r = F.select(same, d, r)
        r = F.select(i2, a, r)
        r = F.select(i1, b, r)
        out.append(r)
    return tuple(out)


def _add_mixed_body(F, one_plane, X1, Y1, Z1, X2, Y2):
    """madd-2007-bl (ec.cl:45-82) with select-completeness; (X2, Y2) affine,
    (0,0) = identity; ``one_plane`` is the Montgomery 1 for to-Jacobian."""
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

    i1 = F.is_zero(Z1)
    i2 = F.is_zero(X2) & F.is_zero(Y2)
    same = (~i1) & (~i2) & F.is_zero(H) & F.is_zero(rr)
    dX, dY, dZ = _double_body(F, X1, Y1, Z1)
    zq = F.select(i2, F.zeros_like(Z1), one_plane)  # affine -> jacobian z
    out = []
    for r, d, a, b in (
        (X3, dX, X1, X2),
        (Y3, dY, Y1, Y2),
        (Z3, dZ, Z1, zq),
    ):
        r = F.select(same, d, r)
        r = F.select(i2, a, r)
        r = F.select(i1, b, r)
        out.append(r)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _point_call(spec: FieldSpec, op: str, n: int, block: int, interpret: bool):
    ppf = PlanePointField(spec)
    L = ppf.L
    n_in = {"add": 6, "add_mixed": 5, "double": 3}[op]
    n_consts = 3 if op == "add_mixed" else 2  # p, nprime[, one]

    def kernel(*refs):
        consts = [r[:] for r in refs[:n_consts]]
        ins = [r[:] for r in refs[n_consts : n_consts + n_in]]
        outs = refs[n_consts + n_in :]
        F = ppf.bind(consts[0], consts[1])
        if op == "add":
            res = _add_body(F, *ins)
        elif op == "add_mixed":
            one = jnp.broadcast_to(consts[2], ins[0].shape)
            res = _add_mixed_body(F, one, *ins)
        else:
            res = _double_body(F, *ins)
        for o, r in zip(outs, res):
            o[:] = r

    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), U32)
    muls = {"add": 23, "add_mixed": 19, "double": 7}[op]
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * 3,
        grid=(n // block,),
        in_specs=[cspec] * n_consts + [bspec] * n_in,
        out_specs=(bspec,) * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * muls * (3 * L * L * 2 + 16 * L),
            bytes_accessed=(n_in + 3) * n * L * 4,
            transcendentals=0,
        ),
    )


class _ListF:
    """ListField facade with the same op surface the bodies use, over
    limb *lists* (see mont.ListField): full-tile ops, inline constants."""

    def __init__(self, spec: FieldSpec):
        from .mont import list_field

        self.lf = list_field(spec)
        self.one_digits = [int(v) for v in spec.one_limbs]

    def add(self, a, b):
        return self.lf.add(a, b)

    def sub(self, a, b):
        return self.lf.sub(a, b)

    def mul(self, a, b):
        return self.lf.mul(a, b)

    def sqr(self, a):
        return self.lf.mul(a, a)

    def double(self, a):
        return self.lf.add(a, a)

    def is_zero(self, a):
        return self.lf.is_zero(a)  # (batch-shaped bool)

    def select(self, cond, a, b):
        if isinstance(a, list) or isinstance(b, list):
            ar = a if isinstance(a, list) else [a] * len(b)
            br = b if isinstance(b, list) else [b] * len(a)
            return [jnp.where(cond, x, y) for x, y in zip(ar, br)]
        return jnp.where(cond, a, b)

    def zeros_like(self, a):
        return [jnp.zeros_like(x) for x in a]


@functools.lru_cache(maxsize=None)
def _point_call_list(spec: FieldSpec, op: str, n8: int, block: int, interpret: bool):
    """List-formulation point kernel on (L, 8, n8) blocks."""
    F = _ListF(spec)
    L = spec.n_limbs
    n_in = {"add": 6, "add_mixed": 5, "double": 3}[op]

    def kernel(*refs):
        ins = [[r[i] for i in range(L)] for r in refs[:n_in]]
        outs = refs[n_in:]
        if op == "add":
            res = _add_body(F, *ins)
        elif op == "add_mixed":
            one = [jnp.full_like(ins[0][0], d) for d in F.one_digits]
            res = _add_mixed_body(F, one, *ins)
        else:
            res = _double_body(F, *ins)
        for o, rows in zip(outs, res):
            for i in range(L):
                o[i] = rows[i]

    bspec = pl.BlockSpec((L, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, 8, n8), U32)
    muls = {"add": 23, "add_mixed": 19, "double": 7}[op]
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * 3,
        grid=(n8 // block,),
        in_specs=[bspec] * n_in,
        out_specs=(bspec,) * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n8) * 8 * muls * (3 * L * L * 2 + 16 * L),
            bytes_accessed=(n_in + 3) * n8 * 8 * L * 4,
            transcendentals=0,
        ),
    )


def _consts(spec: FieldSpec, with_one: bool):
    p = jnp.asarray(np.asarray(spec.p_limbs, np.uint32)[:, None])
    npr = jnp.asarray(np.asarray(spec.nprime_limbs, np.uint32)[:, None])
    if with_one:
        one = jnp.asarray(np.asarray(spec.one_limbs, np.uint32)[:, None])
        return (p, npr, one)
    return (p, npr)


def _run(spec: FieldSpec, op: str, coords, *, block: int, interpret: bool | None):
    """coords: list of (n, L) arrays (AoS at the boundary; transposed to
    planes around the kernel — the transposes are HBM-bound and ~10x
    cheaper than the fused arithmetic inside)."""
    from ...config import get_config

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, L = coords[0].shape
    if get_config().ec_impl == "list":
        blk = min(block, 128)
        unit = 8 * blk
        npad = -(-n // unit) * unit
        planes = []
        for c in coords:
            t = jnp.swapaxes(c, 0, 1)
            if npad != n:
                t = jnp.pad(t, ((0, 0), (0, npad - n)))
            planes.append(t.reshape(L, 8, npad // 8))
        outs = _point_call_list(spec, op, npad // 8, blk, interpret)(*planes)
        return tuple(
            jnp.swapaxes(o.reshape(L, npad)[:, :n], 0, 1) for o in outs
        )
    blk = min(block, max(128, 1 << (n - 1).bit_length() if n > 1 else 128))
    npad = -(-n // blk) * blk
    planes = []
    for c in coords:
        t = jnp.swapaxes(c, 0, 1)
        if npad != n:
            t = jnp.pad(t, ((0, 0), (0, npad - n)))
        planes.append(t)
    consts = _consts(spec, with_one=(op == "add_mixed"))
    outs = _point_call(spec, op, npad, blk, interpret)(*consts, *planes)
    return tuple(jnp.swapaxes(o[:, :n], 0, 1) for o in outs)


def jac_add(spec: FieldSpec, P, Q, *, block: int = DEFAULT_BLOCK, interpret=None):
    """Complete Jacobian + Jacobian for an (n, L)-coordinate batch."""
    return _run(spec, "add", [*P, *Q], block=block, interpret=interpret)


def jac_add_mixed(spec: FieldSpec, P, A, *, block: int = DEFAULT_BLOCK, interpret=None):
    """Complete Jacobian + affine ((0,0) identity) batch."""
    return _run(spec, "add_mixed", [*P, *A], block=block, interpret=interpret)


def jac_double(spec: FieldSpec, P, *, block: int = DEFAULT_BLOCK, interpret=None):
    return _run(spec, "double", [*P], block=block, interpret=interpret)
