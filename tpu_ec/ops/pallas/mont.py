"""Pallas TPU kernels: plane-layout Montgomery field arithmetic.

The TPU-native replacement for the generated CUDA field kernels
(`ag-build/cl/field.cl:268-299` CIOS mul, `:58-69` add/sub) and the PTX
``madc.cc`` carry chains (`ag-build/cl/common.cl:127-248`).

Layout: **limb planes** — a batch of N field elements is ``uint32[L, N]``
with the limb index on the *sublane* axis and the element index on the
*lane* axis, so every VPU op processes 8 limbs x 128 elements and the
schoolbook product's cross-limb shifts become static sublane slices.  (The
jnp fallback in fields/fp.py keeps the (N, L) "array of structs" layout for
composability; `to_planes` / `from_planes` convert.)

All arithmetic is carried out entirely in VMEM: one HBM read of each input
block and one write of the output block — memory-optimal, unlike the fused
XLA path which may materialize (N, L, L) partial-product intermediates.

Carry propagation is the same Kogge-Stone (generate, propagate) lookahead
as fp.py, here unrolled as log2(M) static sublane shifts (identity-padded),
since it runs inside the kernel where HLO count is irrelevant but vector-op
depth matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...fields.params import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32
MASK = LIMB_MASK  # python int: stays an inline literal inside Pallas kernels
DEFAULT_BLOCK = 512


def to_planes(x: jax.Array) -> jax.Array:
    """(N, L) array-of-structs -> (L, N) limb planes."""
    return jnp.swapaxes(x, -1, -2)


def from_planes(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x, -1, -2)


# ---------------------------------------------------------------------------
# In-kernel primitives (operate on (M, TN) VMEM-resident values)
# ---------------------------------------------------------------------------


def _ks_scan_rows(g, p):
    """Inclusive Kogge-Stone scan along axis 0 of (g=generate, p=propagate);
    identity element is (0, 1)."""
    M = g.shape[0]
    ones = jnp.ones_like(p)
    zeros = jnp.zeros_like(g)
    s = 1
    while s < M:
        gs = jnp.concatenate([zeros[:s], g[: M - s]], axis=0)
        ps = jnp.concatenate([ones[:s], p[: M - s]], axis=0)
        g = g | (p & gs)
        p = p & ps
        s *= 2
    return g


def normalize_rows(cols):
    """Exact base-2^16 digits of (M, TN) column values (< 2^31); returns
    (M+1, TN) — the extra top row is the carry-out digit."""
    d = cols & MASK
    c = cols >> LIMB_BITS
    z1 = jnp.zeros_like(d[:1])
    u = jnp.concatenate([d, z1], axis=0) + jnp.concatenate([z1, c], axis=0)
    g = u >> LIMB_BITS
    p = ((u & MASK) == MASK).astype(U32)
    G = _ks_scan_rows(g, p)
    C = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    return (u + C) & MASK


def sub_rows(a, b):
    """(a - b) mod 2^(16M) in planes, plus (1, TN) borrow row."""
    t = a + (1 << LIMB_BITS) - b
    d = t & MASK
    g = 1 - (t >> LIMB_BITS)
    p = (d == 0).astype(U32)
    G = _ks_scan_rows(g, p)
    B = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    return (t - B) & MASK, G[-1:]


def _pad0(x, before: int, after: int):
    """Pad only axis 0 (limb axis), any trailing shape."""
    return jnp.pad(x, ((before, after),) + ((0, 0),) * (x.ndim - 1))


def mul_cols_rows(a, b, L: int):
    """Schoolbook column sums of two (L, ...) limb planes -> (2L, ...),
    each column < 2L * 2^16 < 2^22 (the 32-bit headroom carries the rest)."""
    acc = jnp.zeros((2 * L,) + a.shape[1:], U32)
    for i in range(L):
        prod = a[i : i + 1] * b  # (L, ...); 16x16 -> 32 exact
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        # static-offset adds via pad (Mosaic has no scatter-add; pads keep
        # every op a plain vector add over aligned rows)
        acc = acc + _pad0(lo, i, L - i)
        acc = acc + _pad0(hi, i + 1, L - i - 1)
    return acc


class PlaneField:
    """Static per-field metadata + in-kernel op builders (plane layout).

    The closure-constant analog of the reference's per-field source
    generation (`ag-build/src/source/template.rs:35-71`) — but Pallas
    forbids captured array constants, so the (L, 1) modulus / nprime
    planes are threaded through as explicit kernel inputs (``p``/``npr``
    arguments below); :func:`consts` builds them host-side."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.n_limbs

    def consts(self):
        """Host-side (L, 1) constant planes to pass as kernel inputs."""
        p = np.asarray(self.spec.p_limbs, np.uint32)[:, None]
        npr = np.asarray(self.spec.nprime_limbs, np.uint32)[:, None]
        return jnp.asarray(p), jnp.asarray(npr)

    def cond_sub_p(self, t, p):
        d, br = sub_rows(t, p)
        return jnp.where(br == 0, d, t)

    def add(self, a, b, p):
        t = normalize_rows(a + b)[:-1]
        return self.cond_sub_p(t, p)

    def sub(self, a, b, p):
        d, br = sub_rows(a, b)
        wrapped = normalize_rows(d + p)[:-1]
        return jnp.where(br == 1, wrapped, d)

    def mul(self, a, b, p, npr):
        """Montgomery SOS multiply in planes (same algebra as fp.FieldOps.mul,
        see headroom proof there)."""
        L = self.L
        t = mul_cols_rows(a, b, L)  # (2L, TN)
        t_lo_full = normalize_rows(t[:L])  # (L+1, TN)
        t_lo, c_lo = t_lo_full[:L], t_lo_full[L:]
        m = normalize_rows(mul_cols_rows(t_lo, jnp.broadcast_to(npr, t_lo.shape), L)[:L])[:L]
        mp = mul_cols_rows(m, jnp.broadcast_to(p, m.shape), L)  # (2L, TN)
        u_hi = t[L:] + mp[L:] + _pad0(c_lo, 0, L - 1)
        u = jnp.concatenate([t_lo + mp[:L], u_hi], axis=0)
        un = normalize_rows(u)[: 2 * L]  # final carry provably 0
        return self.cond_sub_p(un[L:], p)


# ---------------------------------------------------------------------------
# Limb-list arithmetic — the low-op-count in-kernel formulation.
#
# A batch of field elements is a *python list* of L equal-shaped uint32
# arrays (one per 16-bit half-limb), so every vector op runs on a full
# (sublane, lane)-tiled array with zero sublane waste, partial products
# accumulate by direct indexed adds (no pad-materialized shifts, no scratch
# read-modify-write traffic — ~2x fewer lane-ops than the plane path), and
# the field constants appear as inline scalar literals instead of constant
# refs.  Carry chains are sequential (3 ops/limb); inside a kernel the batch
# dimension provides the ILP to hide their latency.
# ---------------------------------------------------------------------------


def to_rows(x: jax.Array) -> list[jax.Array]:
    """(L, ...) plane array (or ref slice source) -> list of L limb arrays."""
    return [x[i] for i in range(x.shape[0])]


def from_rows(rows: list[jax.Array]) -> jax.Array:
    return jnp.stack(rows, axis=0)


def _carry_norm(cols, n_out: int):
    """Sequential base-2^16 carry over column values (< 2^31 each);
    returns exactly n_out digit arrays (drops higher carries — callers
    guarantee they are zero or deliberately truncated)."""
    out = []
    carry = None
    for k in range(n_out):
        v = cols[k] if k < len(cols) else None
        if v is None:
            v = carry
            carry = None
        elif carry is not None:
            v = v + carry
        if v is None:
            v = jnp.zeros_like(cols[0])
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out


def _borrow_sub(a, b_const_or_rows):
    """a - b over limb lists (b may be a list of python ints); returns
    (digits, ok) where ok = 1 where no final borrow (a >= b)."""
    out = []
    borrow = None  # "not-borrow" carry encoding: t>>16 is 1 when no borrow
    for i, x in enumerate(a):
        y = b_const_or_rows[i]
        base = (1 << LIMB_BITS) if borrow is None else ((1 << LIMB_BITS) - 1)
        if isinstance(y, (int, np.integer)):
            t = x + (base - int(y)) if borrow is None else x + (base - int(y)) + borrow
        else:
            t = (x + base - y) if borrow is None else x + (base - y) + borrow
        out.append(t & MASK)
        borrow = t >> LIMB_BITS
    return out, borrow


class ListField:
    """In-kernel field ops on limb lists, bound to one FieldSpec.

    The modulus / nprime digits are baked in as scalar literals; there are
    no constant operands to thread through pallas_call (contrast
    PlaneField.consts)."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.n_limbs
        self.p_digits = [int(v) for v in spec.p_limbs]
        self.np_digits = [int(v) for v in spec.nprime_limbs]

    def zero_like(self, a):
        return [jnp.zeros_like(a[0]) for _ in range(self.L)]

    def cond_sub_p(self, t):
        d, ok = _borrow_sub(t, self.p_digits)
        return [jnp.where(ok == 1, x, y) for x, y in zip(d, t)]

    def add(self, a, b):
        s = [x + y for x, y in zip(a, b)]
        return self.cond_sub_p(_carry_norm(s, self.L))

    def sub(self, a, b):
        d, ok = _borrow_sub(a, b)
        wrapped = _carry_norm(
            [x + int(pd) for x, pd in zip(d, self.p_digits)], self.L
        )
        return [jnp.where(ok == 1, x, y) for x, y in zip(d, wrapped)]

    def double(self, a):
        return self.add(a, a)

    @staticmethod
    def _prod_cols(a, b, top: int):
        """Column sums of the schoolbook product, direct accumulation.
        b entries may be python ints (constant operand)."""
        c = [None] * (top + 1)

        def acc(k, v):
            c[k] = v if c[k] is None else c[k] + v

        for i in range(len(a)):
            for j in range(len(b)):
                k = i + j
                if k >= top:
                    continue
                y = b[j]
                if isinstance(y, (int, np.integer)):
                    if int(y) == 0:
                        continue
                    prod = a[i] * np.uint32(y)
                else:
                    prod = a[i] * y
                acc(k, prod & MASK)
                acc(k + 1, prod >> LIMB_BITS)
        z = None
        out = []
        for v in c[:top]:
            if v is None:
                if z is None:
                    z = jnp.zeros_like(a[0])
                v = z
            out.append(v)
        return out

    def mul(self, a, b):
        """SOS Montgomery product of two limb lists (16-bit digits,
        R = 2^(16L) — same algebra/domain as PlaneField.mul)."""
        L = self.L
        t = self._prod_cols(a, b, 2 * L)  # cols < 2L * 2^16
        t_dig = _carry_norm(t, 2 * L)  # t < p^2 -> fits 2L digits
        m_cols = self._prod_cols(t_dig[:L], self.np_digits, L)
        m = _carry_norm(m_cols, L)
        mp = self._prod_cols(m, self.p_digits, 2 * L)
        u = [x + y for x, y in zip(t_dig, mp)]
        u_dig = _carry_norm(u, 2 * L + 1)  # u/R < 2p may need the top carry
        return self._final(u_dig, L)

    def _final(self, u_dig, L):
        # u = t + m*p with u mod R == 0; result = u / R < 2p.  2p may exceed
        # R for tight moduli, so keep the (2L)th digit in the compare.
        hi = u_dig[L : 2 * L]
        top = u_dig[2 * L]
        d, ok = _borrow_sub(hi, self.p_digits)
        # a >= p iff top > 0 or no borrow
        take_d = (top > 0) | (ok == 1)
        return [jnp.where(take_d, x, y) for x, y in zip(d, hi)]

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        z = a[0] == 0
        for x in a[1:]:
            z = z & (x == 0)
        return z

    def select(self, cond, a, b):
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]


@functools.lru_cache(maxsize=None)
def list_field(spec: FieldSpec) -> ListField:
    return ListField(spec)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, n: int, block: int, interpret: bool):
    pf = PlaneField(spec)
    L = pf.L

    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        o_ref[:] = pf.mul(a_ref[:], b_ref[:], p_ref[:], np_ref[:])

    grid = (n // block,)
    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=grid,
        in_specs=[cspec, cspec, bspec, bspec],
        out_specs=bspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * (3 * L * L * 2 + 16 * L),
            bytes_accessed=3 * n * L * 4,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=None)
def _mont_mul_call_list(spec: FieldSpec, n8: int, block: int, interpret: bool):
    """List-formulation mont mul on (L, 8, n8) blocks (limb arrays are full
    (8, block) tiles; constants inline — no const refs)."""
    lf = list_field(spec)
    L = lf.L

    def kernel(a_ref, b_ref, o_ref):
        out = lf.mul([a_ref[i] for i in range(L)], [b_ref[i] for i in range(L)])
        for i in range(L):
            o_ref[i] = out[i]

    bspec = pl.BlockSpec((L, 8, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 8, n8), jnp.uint32),
        grid=(n8 // block,),
        in_specs=[bspec, bspec],
        out_specs=bspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n8) * 8 * (3 * L * L * 2 + 16 * L),
            bytes_accessed=3 * n8 * 8 * L * 4,
            transcendentals=0,
        ),
    )


def mont_mul_planes(
    spec: FieldSpec, a: jax.Array, b: jax.Array, *, block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> jax.Array:
    """Montgomery product of two (L, N) limb-plane batches (one fused HBM
    pass).  N is padded to the block size internally."""
    from ...config import get_config

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, n = a.shape
    if get_config().mont_impl == "list":
        unit = 8 * block
        npad = -(-n // unit) * unit
        if npad != n:
            pad = ((0, 0), (0, npad - n))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        n8 = npad // 8
        out = _mont_mul_call_list(spec, n8, block, interpret)(
            a.reshape(L, 8, n8), b.reshape(L, 8, n8)
        )
        return out.reshape(L, npad)[:, :n]
    npad = -(-n // block) * block
    if npad != n:
        pad = ((0, 0), (0, npad - n))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    pc, nc = PlaneField(spec).consts()
    out = _mont_mul_call(spec, npad, block, interpret)(pc, nc, a, b)
    return out[:, :n]


def mont_mul(spec: FieldSpec, a: jax.Array, b: jax.Array, **kw) -> jax.Array:
    """(N, L)-layout convenience wrapper around :func:`mont_mul_planes`."""
    return from_planes(mont_mul_planes(spec, to_planes(a), to_planes(b), **kw))
