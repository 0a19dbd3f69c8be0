"""MXU digit-matmul NTT: leaf transforms as int8 matrix multiplies.

The round-3 analysis (PERF.md) showed the fused VPU NTT is ALU-bound at
~2.5 ns per Montgomery mul — the mulmod op count itself is the wall, and
the one credible route past it is the MXU.  This module is that route,
built on one observation: a leaf NTT is a CONSTANT linear map over the
field, so with inputs decomposed into base-2^7 digits it becomes an exact
int8 matrix multiply with int32 accumulation:

    Y[k] = sum_j W^{kj} X[j]          (mod p)
         = sum_{j,d} (W^{kj} 2^{7d} mod p) x[j,d]
    col[e,k] = sum_{j,d} G[kj mod m][e,d] x[d,j]   <- ONE s8xs8->s32 matmul

where G[t][e,d] = digit_e(w_m^t 2^{7d} mod p).  Key properties:

- base-2^7 UNSIGNED digits: both operands are in [0,127], so they fit int8
  with no balanced recoding, products are nonnegative, and column sums are
  bounded by m*37*127^2 < 2^31 — exact in int32 (m <= 2^7).
- mod p is folded into the constant matrix (G entries are digits of
  residues), so outputs come back as 37 int32 columns whose weighted sum
  is < m*37*2^7*p ~ 2^276 — never a full-width integer.
- the map is linear, so Montgomery representation (a global scale R)
  passes through untouched: twiddle constants enter PLAIN, data stays in
  the arkworks R = 2^256 domain end to end.
- the leaf matrix bakes in output order — no bit-reversal pass exists.

Between four-step levels the Bailey twiddle T[k2,j1] varies per element and
stays on the VPU — as a WIDENED Montgomery multiply with R' = 2^288
(18x16 half-limbs) fused into ONE Pallas kernel (digit pack -> wide mul ->
digit split, all VMEM-resident): leaf outputs (< 2^280) are consumed
directly without pre-reduction, and u = (v*T' + m*p)/2^288 < p + 2^242
< 2^256 lands back on 16 limbs for the next level's digits.  Stored
constants are pre-scaled by 2^288 (T' = t*2^288 mod p), so the R' division
cancels exactly — the same trick the leaf plays with R.  The final-level
cleanup (and the inverse transform's n^-1 scale) is the same kernel with a
constant twiddle and a canonical-reduce epilogue.

Data layout: value axes LEADING (digit/limb planes), batch flattened into
lanes — (D, n) like ops/pallas/mont.py — so every matmul contracts
adjacent leading axes and every carry is an axis-0 shift.

Reference counterpart: the radix-2^8 shared-memory rounds of
`ag-build/cl/fft.cl:40-67` driven by `ec-gpu-proxy/src/fft.rs:93-127`; the
four-step factorization and tables mirror ops/pallas/ntt_fused.py, which
remains selectable via config ``ntt_impl``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import LIMB_BITS, FieldSpec, int_to_limbs
from .ntt import get_domain, twiddle_table_np
from .pallas.mont import ListField, _carry_norm, _borrow_sub

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32
DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1
WIDE_LIMBS = 18  # R' = 2^(16*18) = 2^288


def _digit_count(bits: int) -> int:
    return -(-bits // DIGIT_BITS)


# ---------------------------------------------------------------------------
# numpy constant builders
# ---------------------------------------------------------------------------


def leaf_matrix_np(spec: FieldSpec, log_m: int, omega_m: int, d_in: int) -> np.ndarray:
    """(D_OUT, m, m, D_IN) int8: A[e,k,j,d] = digit_e(w_m^{kj} 2^{7d} mod p).

    Only m distinct powers w_m^t exist, so build G[t,e,d] with Python
    bigints and fancy-index it out to (k, j)."""
    p = spec.modulus
    m = 1 << log_m
    d_out = _digit_count(p.bit_length())
    G = np.zeros((m, d_out, d_in), np.int8)
    w_t = 1
    for t in range(m):
        v = w_t
        for d in range(d_in):
            x = v
            for e in range(d_out):
                G[t, e, d] = x & DIGIT_MASK
                x >>= DIGIT_BITS
            v = (v << DIGIT_BITS) % p
        w_t = (w_t * omega_m) % p
    k = np.arange(m)[:, None]
    j = np.arange(m)[None, :]
    t = (k * j) % m  # (m, m)
    return np.transpose(G[t], (2, 0, 1, 3)).copy()  # (e, k, j, d)


def _np_mont_mul_chunked(spec, a: np.ndarray, b: np.ndarray, chunk: int = 1 << 15) -> np.ndarray:
    """np_mont_mul in bounded-memory chunks: the vectorized backend
    materializes (n, L, L) uint64 temporaries (~2 GB at n = 2^20), which
    thrashes the host — cap the batch instead."""
    from ..fields.bigint import np_mont_mul

    n = a.shape[0]
    if n <= chunk:
        return np_mont_mul(spec, a, b)
    b = np.broadcast_to(np.asarray(b, np.uint64), a.shape)
    outs = [
        np_mont_mul(spec, a[i : i + chunk], b[i : i + chunk])
        for i in range(0, n, chunk)
    ]
    return np.concatenate(outs, axis=0)


def inter_table288_np(
    spec: FieldSpec, omega: int, log_n: int, log_m: int, log_n1: int
) -> np.ndarray:
    """(L16, n2, n1) plain-twiddle table scaled by 2^288:
    T'[k2, j1] = w_m^{k2 j1} * 2^288 mod p  (w_m = omega^(n/m)).

    Row-doubling construction as in ntt_fused.FusedDomain._inter_table
    (Montgomery R0-form t*R0); one extra np_mont_mul by C = 2^288 mod p
    converts: mont(t*R0, C) = t*C = t*2^288."""
    from ..fields.bigint import np_mont_mul

    L = spec.n_limbs
    n1 = 1 << log_n1
    n2 = 1 << (log_m - log_n1)
    w_m = pow(omega, 1 << (log_n - log_m), spec.modulus)
    table = np.broadcast_to(
        int_to_limbs(spec.one, L).astype(np.uint32), (1, n1, L)
    ).copy()
    cur = twiddle_table_np(spec, w_m, log_n1)[:n1]
    for _ in range(log_m - log_n1):
        grown = _np_mont_mul_chunked(
            spec, table.reshape(-1, L), np.tile(cur, (table.shape[0], 1))
        ).reshape(table.shape[0], n1, L)
        table = np.concatenate([table, grown], axis=0)
        cur = np_mont_mul(spec, cur, cur)
    table = table[:n2]
    C = int_to_limbs((1 << (16 * WIDE_LIMBS)) % spec.modulus, L)
    flat = _np_mont_mul_chunked(
        spec, table.reshape(-1, L), np.broadcast_to(C, (n2 * n1, L))
    )
    return np.transpose(flat.reshape(n2, n1, L), (2, 0, 1)).copy()


def inter_table288_device(
    spec: FieldSpec, omega: int, log_n: int, log_m: int, log_n1: int
) -> jnp.ndarray:
    """Device-built (L16, n2, n1) 2^288-scaled twiddle table.

    The numpy builder takes minutes at n2*n1 >= 2^22 (host Montgomery);
    the same row-doubling runs in ~1 s on the chip via the Pallas mont
    kernel.  Rows are kept in 2^288-scaled plain form (seed row = C =
    2^288 mod p) while the doubling multiplier stays in R0-Montgomery
    form, so mont(t*2^288, cur*R0) = t*cur*2^288 at every step.  Eager
    (not traced): called at domain-constant setup like digit_consts."""
    from .pallas.mont import mont_mul_planes

    L = spec.n_limbs
    p = spec.modulus
    n1 = 1 << log_n1
    n2 = 1 << (log_m - log_n1)
    w_m = pow(omega, 1 << (log_n - log_m), p)
    cur = jnp.asarray(twiddle_table_np(spec, w_m, log_n1)[:n1].T.copy())  # (L, n1)
    C = int_to_limbs((1 << (16 * WIDE_LIMBS)) % p, L)
    table = jnp.broadcast_to(
        jnp.asarray(C.astype(np.uint32))[:, None, None], (L, 1, n1)
    )
    r = 1
    while r < n2:
        flat = table.reshape(L, r * n1)
        mult = jnp.broadcast_to(cur[:, None, :], (L, r, n1)).reshape(L, r * n1)
        grown = mont_mul_planes(spec, flat, mult).reshape(L, r, n1)
        table = jnp.concatenate([table, grown], axis=1)
        cur = mont_mul_planes(spec, cur, cur)
        r *= 2
    return table[:, :n2, :]


# numpy tables above this element count take minutes on the host; build on
# device instead (and skip the disk cache — they rebuild in ~1 s)
_DEVICE_TABLE_MIN = 1 << 22

# levels with at least this many elements never materialize the full Bailey
# table OR the full raw-column tensor (at 2^26 those are 4.3 GB and 9.9 GB
# — past the chip's HBM together with the data): the level runs in
# _CHUNK_COUNT slices of the leaf-output axis k2, with each slice's
# twiddle block synthesized in-trace from factored seeds
# (T[k2,j1] = base[k2 mod c, j1] * w^(c*floor(k2/c)*j1)).
_CHUNK_MIN = 1 << 25
_CHUNK_COUNT = 16


def _mont_planes(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """(L, N) plane Montgomery product; jnp path on CPU (Pallas-interpret
    lowering is pathological there), Pallas kernel otherwise."""
    if interpret:
        from ..fields.fp import field_ops

        f = field_ops(spec)
        return jnp.swapaxes(f.mul(jnp.swapaxes(a, 0, 1), jnp.swapaxes(b, 0, 1)), 0, 1)
    from .pallas.mont import mont_mul_planes

    return mont_mul_planes(spec, a, b, interpret=False)


# ---------------------------------------------------------------------------
# axis-0 digit plumbing (pure jnp, fuses)
# ---------------------------------------------------------------------------


def split_digits_rows(v16: jnp.ndarray, d_out: int) -> jnp.ndarray:
    """(L16, ...) u32 16-bit limb planes -> (d_out, ...) int8 base-2^7."""
    L16 = v16.shape[0]
    outs = []
    for e in range(d_out):
        s = e * DIGIT_BITS
        i0, off = divmod(s, LIMB_BITS)
        if i0 >= L16:
            outs.append(jnp.zeros_like(v16[:1]))
            continue
        d = v16[i0 : i0 + 1] >> off
        if off > LIMB_BITS - DIGIT_BITS and i0 + 1 < L16:
            d = d | (v16[i0 + 1 : i0 + 2] << (LIMB_BITS - off))
        outs.append(d & DIGIT_MASK)
    return jnp.concatenate(outs, axis=0).astype(I8)


def _shift_up_rows(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def carry7_rows(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Matmul column outputs (D, ...) int32 (>= 0, < 2^31) -> normalized
    base-2^7 digits (n_out, ...) int8, via 3 parallel fold passes (carry
    < 2^24 -> 2^17 -> 2^10 -> 2^3) + one Kogge-Stone lookahead for the
    residual 0/1 carries.  Every op is a full-array add/shift — XLA fuses
    the whole chain into ~one pass (the sequential 40-step version cost
    15 ms/level at 2^20)."""
    D = cols.shape[0]
    x = cols.astype(U32)
    if D < n_out:
        x = jnp.concatenate(
            [x, jnp.zeros((n_out - D,) + x.shape[1:], U32)], axis=0
        )
    else:
        x = x[:n_out]  # callers guarantee the dropped columns are zero
    for _ in range(3):
        x = (x & DIGIT_MASK) + _shift_up_rows(x >> DIGIT_BITS)
    # residual: x < 128 + 8 -> generate in {0,1}, disjoint from propagate
    g = x >> DIGIT_BITS
    p = ((x & DIGIT_MASK) == DIGIT_MASK).astype(U32)
    ones = jnp.ones_like(p)
    zeros = jnp.zeros_like(g)
    s = 1
    while s < n_out:
        gs = jnp.concatenate([zeros[:s], g[:-s]], axis=0)
        ps = jnp.concatenate([ones[:s], p[:-s]], axis=0)
        g = g | (p & gs)
        p = p & ps
        s *= 2
    C = _shift_up_rows(g)
    return ((x + C) & DIGIT_MASK).astype(I8)


# ---------------------------------------------------------------------------
# wide Montgomery multiply core (limb LISTS — usable inside Pallas kernels
# and as the jnp fallback on CPU)
# ---------------------------------------------------------------------------


def _pack7_lists(vd: list[jnp.ndarray], n_limbs: int) -> list[jnp.ndarray]:
    """List of D base-2^7 digit arrays (u32) -> n_limbs 16-bit limb arrays."""
    acc: list = [None] * n_limbs
    for e, d in enumerate(vd):
        s = e * DIGIT_BITS
        i0, off = divmod(s, LIMB_BITS)
        if i0 >= n_limbs:
            continue
        c = d << off
        acc[i0] = c if acc[i0] is None else acc[i0] + c
    cols = [a if a is not None else jnp.zeros_like(vd[0]) for a in acc]
    return _carry_norm(cols, n_limbs)


def _split7_lists(limbs: list[jnp.ndarray], d_out: int) -> list[jnp.ndarray]:
    """16-bit limb arrays -> d_out base-2^7 digit arrays (u32, < 128)."""
    L16 = len(limbs)
    out = []
    for e in range(d_out):
        s = e * DIGIT_BITS
        i0, off = divmod(s, LIMB_BITS)
        if i0 >= L16:
            out.append(jnp.zeros_like(limbs[0]))
            continue
        d = limbs[i0] >> off
        if off > LIMB_BITS - DIGIT_BITS and i0 + 1 < L16:
            d = d | (limbs[i0 + 1] << (LIMB_BITS - off))
        out.append(d & DIGIT_MASK)
    return out


def _carry_norm7(cols: list, n_out: int) -> list:
    """Sequential base-2^7 carry over int32/uint32 column values (>= 0,
    < 2^31): exactly n_out digit arrays (u32, < 128)."""
    out = []
    carry = None
    for k in range(n_out):
        v = cols[k] if k < len(cols) else None
        if v is None:
            v = carry if carry is not None else None
            carry = None
        elif carry is not None:
            v = v + carry
        if v is None:
            v = jnp.zeros_like(cols[0])
        out.append(v & DIGIT_MASK)
        carry = v >> DIGIT_BITS
    return out


class WideMont:
    """v * t * 2^-288 for v < 2^288 (digit list) and t < p (16 limbs),
    result < p + 2^242: the inter-twiddle multiply.  Limb-list formulation
    (ops/pallas/mont.ListField patterns) shared by the Pallas kernel body
    and the CPU jnp path."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L16 = spec.n_limbs
        self.Lw = WIDE_LIMBS
        self.p_digits = [int(v) for v in spec.p_limbs]
        R = 1 << (LIMB_BITS * WIDE_LIMBS)
        npr = (-pow(spec.modulus, -1, R)) % R
        self.np_digits = [int(v) for v in int_to_limbs(npr, WIDE_LIMBS)]

    def mul(self, a18: list, t16: list) -> list:
        """a (18 limbs u32) x t (16 limbs u32) -> 16 limbs of a*t/2^288."""
        Lw, L16 = self.Lw, self.L16
        top = Lw + L16
        t_cols = ListField._prod_cols(a18, t16, top)
        t_dig = _carry_norm(t_cols, top + 1)  # a*t < 2^543: top+1 exact
        m_cols = ListField._prod_cols(t_dig[:Lw], self.np_digits, Lw)
        m = _carry_norm(m_cols, Lw)
        mp = ListField._prod_cols(m, self.p_digits, top)
        u = [x + y for x, y in zip(t_dig, mp)] + t_dig[top:]
        u_dig = _carry_norm(u, top + 1)
        return u_dig[Lw : Lw + L16]  # low Lw limbs are exactly zero

    def cond_sub_p(self, v16: list) -> list:
        d, ok = _borrow_sub(v16, self.p_digits)
        return [jnp.where(ok == 1, x, y) for x, y in zip(d, v16)]


@functools.lru_cache(maxsize=None)
def _wide_mont(spec: FieldSpec) -> WideMont:
    return WideMont(spec)


def _inter_core(wm: WideMont, cols: list, t16: list, n_dig: int, d_out: int, canonical: bool):
    """Raw matmul columns (int32 list, >= 0, < 2^31) + twiddle limbs ->
    digit list (d_out u32) or, when ``canonical``, 16 reduced limbs (< p).
    Fuses the base-7 carry normalization that turns columns into digits."""
    vd = _carry_norm7(cols, n_dig)
    a18 = _pack7_lists(vd, wm.Lw)
    r16 = wm.mul(a18, t16)
    if canonical:
        return wm.cond_sub_p(r16)
    return _split7_lists(r16, d_out)


@functools.lru_cache(maxsize=None)
def _inter_call(
    spec: FieldSpec, dc: int, n_dig: int, d_out: int, n: int, block: int,
    canonical: bool, interpret: bool, const_t: bool = False, in_i8: bool = False,
):
    """Pallas kernel: (dc, n) i32 matmul columns (or i8 digits, ``in_i8``)
    x (16, n) u32 twiddles -> (d_out, n) i8 digits, or (16, n) u32
    canonical limbs.  One VMEM-resident pass: carry -> pack -> wide
    Montgomery -> split.  ``const_t``: the twiddle input is one (16, block)
    tile served to every grid step (a per-transform constant — avoids
    materializing an (16, n) broadcast in HBM)."""
    wm = WideMont(spec)
    L16 = spec.n_limbs

    def kernel(c_ref, t_ref, o_ref):
        cols = [c_ref[e].astype(U32) for e in range(dc)]
        t16 = [t_ref[i] for i in range(L16)]
        out = _inter_core(wm, cols, t16, n_dig, d_out, canonical)
        if canonical:
            for i in range(L16):
                o_ref[i] = out[i]
        else:
            for e in range(d_out):
                o_ref[e] = out[e].astype(I8)

    rows_out = L16 if canonical else d_out
    dt_out = U32 if canonical else I8
    dt_in = I8 if in_i8 else I32
    cspec = pl.BlockSpec((dc, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(
        (L16, block),
        (lambda i: (0, 0)) if const_t else (lambda i: (0, i)),
        memory_space=pltpu.VMEM,
    )
    ospec = pl.BlockSpec((rows_out, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_out, n), dt_out),
        grid=(n // block,),
        in_specs=[cspec, tspec],
        out_specs=ospec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * (2 * 18 * 16 + 18 * 18) * 2,
            bytes_accessed=n * ((1 if in_i8 else 4) * dc + 4 * L16 + rows_out * (4 if canonical else 1)),
            transcendentals=0,
        ),
    )


def inter_twiddle(
    spec: FieldSpec,
    cols: jnp.ndarray,  # (dc, N) i32 raw matmul columns (or i8 digits)
    t16: jnp.ndarray,  # (L16, N) u32 limbs (plain twiddle * 2^288), or
    #                    (L16,) when const_t (one per-transform constant)
    *,
    canonical: bool = False,
    const_t: bool = False,
    block: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One fused carry -> pack -> wide-Montgomery -> split pass."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dc, n = cols.shape
    in_i8 = cols.dtype == I8
    d_out = _digit_count(16 * spec.n_limbs)
    n_dig = _digit_count(16 * WIDE_LIMBS)  # 42: covers any < 2^288 value
    if interpret:
        # CPU path: same core as plain jnp (Pallas-interpret is pathologically
        # slow to lower; the core is shared so results are bit-identical)
        cl = [cols[e].astype(U32) for e in range(dc)]
        if const_t:
            tl = [jnp.broadcast_to(t16[i], cl[0].shape) for i in range(spec.n_limbs)]
        else:
            tl = [t16[i] for i in range(spec.n_limbs)]
        out = _inter_core(_wide_mont(spec), cl, tl, n_dig, d_out, canonical)
        if canonical:
            return jnp.stack(out, axis=0)
        return jnp.stack(out, axis=0).astype(I8)
    npad = -(-n // block) * block
    if npad != n:
        cols = jnp.pad(cols, ((0, 0), (0, npad - n)))
    if const_t:
        t_arg = jnp.broadcast_to(t16[:, None], (spec.n_limbs, block))
    else:
        t_arg = jnp.pad(t16, ((0, 0), (0, npad - n))) if npad != n else t16
    out = _inter_call(
        spec, dc, n_dig, d_out, npad, block, canonical, False, const_t, in_i8
    )(cols, t_arg)
    return out[:, :n]


# ---------------------------------------------------------------------------
# domain + transform
# ---------------------------------------------------------------------------


class DigitDomain:
    """Constant tables for one (field, log_n, inverse) digit-matmul NTT."""

    def __init__(self, spec: FieldSpec, log_n: int, inverse: bool, leaf: int):
        self.spec = spec
        self.log_n = log_n
        self.inverse = inverse
        self.leaf = leaf
        base = get_domain(spec, log_n, inverse)
        self.omega = base.omega
        p = spec.modulus
        self.d_in = _digit_count(LIMB_BITS * spec.n_limbs)  # inputs < 2^256
        self.plan = self._plan(log_n, leaf)
        mmax = 1 << max(self.plan)
        bound_bits = p.bit_length() + DIGIT_BITS + (mmax * self.d_in).bit_length()
        self.d_leaf = _digit_count(bound_bits)  # leaf output digits
        assert self.d_leaf * DIGIT_BITS <= LIMB_BITS * WIDE_LIMBS
        assert mmax * self.d_in * DIGIT_MASK * DIGIT_MASK < (1 << 31)
        self.matrices: dict[int, np.ndarray] = {}
        self.inter: dict[tuple[int, int], np.ndarray] = {}
        self._build()

    @staticmethod
    def _plan(log_n: int, leaf: int) -> list[int]:
        """Balanced factorization: fewest levels with factors <= leaf, each
        factor as equal as possible (22, leaf 8 -> [8, 7, 7], not the
        naive [8, 8, 6] whose tail wastes a matrix, and never a degenerate
        [7, 7, 7, 1])."""
        k = -(-log_n // leaf)
        base, extra = divmod(log_n, k)
        return [base + (1 if i < extra else 0) for i in range(k)]

    def _table_cache(self, kind: str, *key_parts) -> str | None:
        """Disk-cache path for one built table (the big inter tables take
        ~minutes of numpy Montgomery at 2^20+; the compile-cache analog of
        the reference's fatbin cache, compile.rs:79-114)."""
        import os

        from ..config import get_config

        if not get_config().cache:
            return None
        base = get_config().cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "tpu_ec"
        )
        d = os.path.join(base, "digit_tables")
        os.makedirs(d, exist_ok=True)
        name = "_".join(
            [self.spec.name, kind] + [str(k) for k in key_parts]
        )
        return os.path.join(d, name + ".npy")

    def _cached(self, kind, key_parts, build):
        path = self._table_cache(kind, *key_parts)
        if path is not None and __import__("os").path.exists(path):
            return np.load(path)
        arr = build()
        if path is not None:
            np.save(path + ".tmp.npy", arr)
            __import__("os").replace(path + ".tmp.npy", path)
        return arr

    def _build(self):
        spec, p = self.spec, self.spec.modulus
        log_rest = self.log_n
        for lf in self.plan[:-1]:
            n1_log = log_rest - lf
            if (1 << log_rest) >= _CHUNK_MIN:
                # never materialized: the level runs chunked over k2 with
                # in-trace twiddle synthesis (digit_consts builds the
                # factored seeds)
                self.inter[(log_rest, n1_log)] = "factored"
            elif (1 << log_rest) >= _DEVICE_TABLE_MIN:
                # too big for host-side numpy Montgomery (minutes) or the
                # disk cache (GBs): digit_consts builds it on device
                self.inter[(log_rest, n1_log)] = None
            else:
                self.inter[(log_rest, n1_log)] = self._cached(
                    "inter288",
                    (self.log_n, int(self.inverse), log_rest, n1_log),
                    lambda lr=log_rest, nl=n1_log: inter_table288_np(
                        spec, self.omega, self.log_n, lr, nl
                    ),
                )
            if lf not in self.matrices:
                w_m = pow(self.omega, 1 << (self.log_n - lf), p)
                self.matrices[lf] = self._cached(
                    "leafmat",
                    (int(self.inverse), lf, self.d_in),
                    lambda w=w_m, l=lf: leaf_matrix_np(spec, l, w, self.d_in),
                )
            log_rest = n1_log
        last = self.plan[-1]
        if last not in self.matrices:
            w_m = pow(self.omega, 1 << (self.log_n - last), p)
            self.matrices[last] = self._cached(
                "leafmat",
                (int(self.inverse), last, self.d_in),
                lambda: leaf_matrix_np(spec, last, w_m, self.d_in),
            )
        # final cleanup constant: 2^288 (forward) / n_inv * 2^288 (inverse)
        R = 1 << (LIMB_BITS * WIDE_LIMBS)
        c = R % p
        if self.inverse:
            c = (c * pow(1 << self.log_n, -1, p)) % p
        self.final_c = int_to_limbs(c, spec.n_limbs)


@functools.lru_cache(maxsize=16)
def get_digit_domain(spec: FieldSpec, log_n: int, inverse: bool, leaf: int) -> DigitDomain:
    return DigitDomain(spec, log_n, inverse, leaf)


def digit_consts(dom: DigitDomain):
    """Device-side constants for one domain; keep and pass as ``consts`` so
    repeated calls skip the host->device upload.  Tables the host can't
    build in reasonable time (None markers from DigitDomain._build) are
    constructed on device here (~1 s each at 2^24)."""
    A = {k: jnp.asarray(v) for k, v in dom.matrices.items()}
    interpret = jax.default_backend() == "cpu"
    inter = {}
    for (log_m, log_n1), v in dom.inter.items():
        if isinstance(v, np.ndarray):
            inter[(log_m, log_n1)] = jnp.asarray(v)
        elif v == "factored":
            inter[(log_m, log_n1)] = _factored_seeds(dom, log_m, log_n1, interpret)
        elif interpret:
            inter[(log_m, log_n1)] = jnp.asarray(
                inter_table288_np(dom.spec, dom.omega, dom.log_n, log_m, log_n1)
            )
        else:
            inter[(log_m, log_n1)] = jax.block_until_ready(
                inter_table288_device(
                    dom.spec, dom.omega, dom.log_n, log_m, log_n1
                )
            )
    return A, inter


def _factored_seeds(dom: DigitDomain, log_m: int, log_n1: int, interpret: bool) -> dict:
    """Seeds for in-trace chunked twiddle synthesis at one level:
    cur_pows[t][:, j1] = w_m^(2^t * j1) in R0-Montgomery form (so
    mont(x*2^288, cur) = x*w^... *2^288 stays pre-scaled), plus the
    2^288-scaled seed row and the Montgomery one-row."""
    spec = dom.spec
    p = spec.modulus
    L = spec.n_limbs
    n1 = 1 << log_n1
    log_n2 = log_m - log_n1
    w_m = pow(dom.omega, 1 << (dom.log_n - log_m), p)
    cur0 = dom._cached(
        "curpow0",
        (dom.log_n, int(dom.inverse), log_m, log_n1),
        lambda: twiddle_table_np(spec, w_m, log_n1)[:n1].T.copy(),
    )  # (L, n1) Montgomery form
    cur = jnp.asarray(cur0)
    pows = [cur]
    for _ in range(log_n2 - 1):
        cur = jax.jit(lambda c: _mont_planes(spec, c, c, interpret))(cur)
        pows.append(cur)
    pows = [jax.block_until_ready(c) for c in pows]
    C = int_to_limbs((1 << (16 * WIDE_LIMBS)) % p, L).astype(np.uint32)
    one = int_to_limbs(spec.one, L).astype(np.uint32)
    # NOTE: no plain ints in this dict — it travels through jit as a
    # pytree and every leaf gets traced; chunk counts derive statically
    return {
        "cur_pows": pows,
        "c_row": jnp.broadcast_to(jnp.asarray(C)[:, None], (L, n1)),
        "one_row": jnp.broadcast_to(jnp.asarray(one)[:, None], (L, n1)),
    }


def _rec(dom: DigitDomain, x: jnp.ndarray, log_m: int, consts, interpret, level: int = 0) -> jnp.ndarray:
    """x: (d_in, m, M) int8 digit planes (values < 2^256, R-domain) ->
    (d_out, m, M) int32 RAW COLUMN planes of the size-m NTT (weighted sum
    < 2^280), natural order along axis 1.  Columns stay raw so the next
    consumer (inter-twiddle / final-cleanup kernel) fuses the carry.

    ``level`` indexes dom.plan: each depth splits off plan[level] as the
    leaf transform of that level."""
    A, inter = consts
    d_in, m_, M = x.shape
    if level == len(dom.plan) - 1:
        assert log_m == dom.plan[level]
        if m_ * M >= _CHUNK_MIN:
            # chunked tail: matmul + carry-to-digits kernel (T = 2^288, a
            # value-preserving pass mod p) in M slices, so the full
            # (d_out, n) int32 column tensor never exists
            C16 = jnp.asarray(
                int_to_limbs(
                    (1 << (16 * WIDE_LIMBS)) % dom.spec.modulus,
                    dom.spec.n_limbs,
                ).astype(np.uint32)
            )
            nc = min(_CHUNK_COUNT, M)
            mc = M // nc
            parts = []
            for ci in range(nc):
                xc = x[:, :, ci * mc : (ci + 1) * mc]
                cols_c = jax.lax.dot_general(
                    A[log_m], xc, (((2, 3), (1, 0)), ((), ())),
                    preferred_element_type=I32,
                )  # (d_out, m, mc)
                dig_c = inter_twiddle(
                    dom.spec, cols_c.reshape(cols_c.shape[0], m_ * mc),
                    C16, const_t=True, interpret=interpret,
                )  # (d_in, m*mc) i8, value < 2^256 (== mod p)
                parts.append(dig_c.reshape(dom.d_in, m_, mc))
            return jnp.concatenate(parts, axis=2)
        return jax.lax.dot_general(
            A[log_m], x, (((2, 3), (1, 0)), ((), ())),
            preferred_element_type=I32,
        )  # (d_out, m, M)
    log_n2 = dom.plan[level]
    log_n1 = log_m - log_n2
    n1, n2 = 1 << log_n1, 1 << log_n2
    x4 = x.reshape(d_in, n2, n1 * M)
    T = inter[(log_m, log_n1)]
    if isinstance(T, dict) or n2 * n1 * M >= _CHUNK_MIN:
        ydig = _chunked_level(dom, A[log_n2], x4, T, n1, n2, M, interpret)
    else:
        # leaf NTT over j2 (axis 1), batched over (j1, M); contraction axes
        # (d, j2) are the two leading axes — no data transpose needed
        cols = jax.lax.dot_general(
            A[log_n2], x4, (((2, 3), (1, 0)), ((), ())),
            preferred_element_type=I32,
        )  # (d_out, n2, n1*M)
        # inter twiddle T'[k2, j1]: ONE fused kernel (carry -> pack -> wide
        # Montgomery -> digit split)
        tfull = jnp.broadcast_to(
            T[:, :, :, None], (T.shape[0], n2, n1, M)
        ).reshape(T.shape[0], n2 * n1 * M)
        y = inter_twiddle(
            dom.spec, cols.reshape(cols.shape[0], n2 * n1 * M), tfull,
            interpret=interpret,
        )  # (d_in, n2*n1*M) i8
        ydig = y.reshape(dom.d_in, n2, n1, M)
    # transpose and recurse over n1
    yt = jnp.swapaxes(ydig, 1, 2).reshape(dom.d_in, n1, n2 * M)
    z = _rec(dom, yt, log_n1, consts, interpret, level + 1)
    # k1-major flatten == natural order (X[k2 + n2*k1] = Z[k1, k2])
    return z.reshape(z.shape[0], n1 * n2, M)


def _chunked_level(dom, A2, x4, T, n1: int, n2: int, M: int, interpret) -> jnp.ndarray:
    """One four-step level in nc slices of the leaf-output axis k2, so the
    full raw-column tensor never exists.  When the Bailey table is factored
    seeds (a dict — levels whose table itself would be GBs), each chunk's
    (L, c, n1) twiddle block is synthesized in-trace as mont(base, row_a)
    with base = rows 0..c-1 (2^288-scaled) and row_a = w^(a*j1)
    (R0-Montgomery; extra cost ~1 Montgomery mul per element); when the
    table is materialized it is simply sliced."""
    spec = dom.spec
    L = spec.n_limbs
    nc = min(_CHUNK_COUNT, n2)
    c = n2 // nc
    logc = max(0, c.bit_length() - 1)
    factored = isinstance(T, dict)
    if factored:
        pows = T["cur_pows"]  # pows[t][:, j1] = w^(2^t j1), R0-form
        # base rows 0..c-1 by doubling (2^288-scaled)
        base = T["c_row"][:, None, :]  # (L, 1, n1)
        r = 1
        while r < c:
            t = r.bit_length() - 1
            flat = base.reshape(L, r * n1)
            mult = jnp.broadcast_to(pows[t][:, None, :], (L, r, n1)).reshape(L, r * n1)
            grown = _mont_planes(spec, flat, mult, interpret).reshape(L, r, n1)
            base = jnp.concatenate([base, grown], axis=1)
            r *= 2
        base_flat = base.reshape(L, c * n1)
    parts = []
    for ci in range(nc):
        a = ci * c
        cols_c = jax.lax.dot_general(
            A2[:, a : a + c], x4, (((2, 3), (1, 0)), ((), ())),
            preferred_element_type=I32,
        )  # (d_out, c, n1*M)
        if factored:
            row = T["one_row"]
            t = logc
            aa = a >> logc
            while aa:
                if aa & 1:
                    row = _mont_planes(spec, row, pows[t], interpret)
                aa >>= 1
                t += 1
            mult = jnp.broadcast_to(row[:, None, :], (L, c, n1)).reshape(L, c * n1)
            tchunk = _mont_planes(spec, base_flat, mult, interpret)  # 2^288-scaled
        else:
            tchunk = T[:, a : a + c, :].reshape(L, c * n1)
        tfull = jnp.broadcast_to(
            tchunk.reshape(L, c, n1, 1), (L, c, n1, M)
        ).reshape(L, c * n1 * M)
        y_c = inter_twiddle(
            spec, cols_c.reshape(cols_c.shape[0], c * n1 * M), tfull,
            interpret=interpret,
        )
        parts.append(y_c.reshape(dom.d_in, c, n1, M))
    return jnp.concatenate(parts, axis=1)  # (d_in, n2, n1, M)


def digit_ntt_planes(
    spec: FieldSpec,
    xp: jnp.ndarray,  # (L16, n) u32 half-limb planes, Montgomery form
    inverse: bool = False,
    *,
    leaf: int | None = None,
    consts=None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Natural-order NTT bit-exact with ops.ntt.FftKernel, via MXU digit
    matmuls.  Returns (L16, n) canonical Montgomery planes (< p)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L16, n = xp.shape
    log_n = int(n).bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("FFT size must be a power of two")
    if leaf is None:
        from ..config import get_config

        leaf = get_config().ntt_digit_leaf_log
    leaf = min(leaf, log_n)
    dom = get_digit_domain(spec, log_n, inverse, leaf)
    if consts is None:
        consts = digit_consts(dom)
    dig = split_digits_rows(xp, dom.d_in)[:, :, None]  # (d_in, n, 1)
    # i32 raw columns, or i8 digits when the chunked tail already ran its
    # value-preserving carry pass — the final kernel consumes either
    out = _rec(dom, dig, log_n, consts, interpret)
    y16 = inter_twiddle(
        spec,
        out.reshape(out.shape[0], n),
        jnp.asarray(dom.final_c.astype(np.uint32)),
        canonical=True,
        const_t=True,
        interpret=interpret,
    )  # (L16, n), < p
    return y16


def digit_ntt_planes_batch(
    spec: FieldSpec,
    xpb: jnp.ndarray,  # (L16, n, B) u32 half-limb planes, Montgomery form
    inverse: bool = False,
    *,
    leaf: int | None = None,
    consts=None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """B independent length-n NTTs in one program, sharing the single-
    transform constant tables: the recursion core (`_rec`) already threads
    a trailing lane axis M through every leaf matmul and twiddle kernel
    (digit_ntt_planes runs it with M=1), so a batch is the SAME dataflow
    with M=B — the MXU contraction just gets wider.  This is what the
    distributed NTT's local column/row DFT stages consume (a batch of n2
    sub-transforms per shard, `parallel/ntt_dist.py`), replacing the
    radix_fft_many whole-transform round-robin of the reference
    (ec-gpu-proxy/src/fft.rs:211-246) inside each four-step stage.

    Returns (L16, n, B) canonical Montgomery planes (< p).  For
    ``inverse=True`` the n^{-1} scale is folded into the final-cleanup
    constant per sub-transform (same contract as digit_ntt_planes).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L16, n, B = xpb.shape
    log_n = int(n).bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("FFT size must be a power of two")
    if leaf is None:
        from ..config import get_config

        leaf = get_config().ntt_digit_leaf_log
    leaf = min(leaf, log_n)
    dom = get_digit_domain(spec, log_n, inverse, leaf)
    if consts is None:
        consts = digit_consts(dom)
    dig = split_digits_rows(xpb.reshape(L16, n * B), dom.d_in)
    out = _rec(dom, dig.reshape(dom.d_in, n, B), log_n, consts, interpret)
    y16 = inter_twiddle(
        spec,
        out.reshape(out.shape[0], n * B),
        jnp.asarray(dom.final_c.astype(np.uint32)),
        canonical=True,
        const_t=True,
        interpret=interpret,
    )
    return y16.reshape(L16, n, B)
