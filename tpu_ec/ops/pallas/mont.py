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


def mont_mul_planes(
    spec: FieldSpec, a: jax.Array, b: jax.Array, *, block: int = DEFAULT_BLOCK,
    interpret: bool | None = None,
) -> jax.Array:
    """Montgomery product of two (L, N) limb-plane batches (one fused HBM
    pass).  N is padded to the block size internally."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, n = a.shape
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
