"""MXU-based NTT: the systolic-array formulation of the radix-N transform.

The reference's FFT performance comes from shared-memory butterflies on CUDA
cores (`ag-build/cl/fft.cl:40-67`).  The VPU analog (ops/pallas/ntt_fused.py)
is Montgomery-multiply-throughput-bound at ~300M mulmod/s; meanwhile the MXU
sits idle — on a v5e it has ~100x the VPU's int8 MAC throughput.  This module
moves the butterflies there:

**DFT-as-matmul.**  A radix-16 DIT stage

    out[g, u, t] = sum_v  W16[u, v] * w_{16^{s+1}}^{v*t} * in[g, v, t]

is, for each twiddle offset t, a 16x16 matrix of field constants times a
vector of field elements.  Expanding both sides into base-128 digits turns
the modular-bigint matmul into an INTEGER matmul: with data digits
x[v, i] (i < D) and plain-integer constant digits m[u, v, l] (l < DC),

    col[u, c] = sum_{v, l+i=c}  m[u,v,l] * x[v,i]

which is exactly a (16*D)-deep int8 contraction per output column — a
(t)-batched ``dot_general`` with the Toeplitz structure baked into the
host-built matrix.  One stage of the whole transform = ONE MXU call.
Twiddles are absorbed into the per-t matrices, so a 16^d "super-leaf"
(d <= 3, bounded by matrix memory t <= 256) runs with zero twiddle passes;
between super-leaves one ordinary four-step twiddle multiply runs on the
existing Pallas Montgomery kernel.

**Why base-128 digits.**  TPU int8 matmuls are signed; digits in [0, 128)
keep every operand, accumulator and carry nonnegative (the Kogge-Stone
normalization below reuses the 0/1-carry argument of fields/fp.py), at the
cost of ~30% more MACs than base-256 — MXU headroom is the one thing this
design has in abundance.

**Bounds** (the invariant between stages is: D = 39 exact base-128 digits,
value < 2^267):
  matmul column: 16*39 terms * 127^2 = 1.01e7 < 2^24   (int32-safe)
  fold matmul:   36 high cols * 4 sub-digits = 144 rows * 127^2 < 2^22
  E = lo + fold < 2^25; 4 split passes (7 bits each) + one KS pass give
  exact digits; folding from digit 38 keeps the re-entry value < 2^267.

Montgomery domain: data digits encode x*R mod p; matrix digits encode PLAIN
constants c (not c*R), so sum c*(xR) = (sum c x)*R stays in-domain with no
REDC anywhere.  Bit-exact with ops/ntt (ark Radix2EvaluationDomain).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.params import LIMB_BITS, FieldSpec, int_to_limbs
from .ntt import get_domain

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32

DB = 7  # digit bits (base 128)
DMASK = (1 << DB) - 1
D_IN = 39  # digits per element between stages (7*39 = 273 bits >= 267)
MAX_SUPER = 12  # log2 of max super-leaf (batch of matrices <= 16^2 = 256)


# ---------------------------------------------------------------------------
# host-side digit helpers (numpy, exact)
# ---------------------------------------------------------------------------


def _int_digits(v: int, nd: int) -> np.ndarray:
    return np.array([(v >> (DB * i)) & DMASK for i in range(nd)], np.int8)


def _toeplitz_block(c: int, d_in: int, d_out: int) -> np.ndarray:
    """(d_in, d_out) int8 block: block[i, l+i] = digit_l(c)."""
    nd = -(-(c.bit_length() or 1) // DB)
    dig = _int_digits(c, nd)
    out = np.zeros((d_in, d_out), np.int8)
    for i in range(d_in):
        hi = min(nd, d_out - i)
        if hi > 0:
            out[i, i : i + hi] = dig[:hi]
    return out


@functools.lru_cache(maxsize=None)
def _plan(log_n: int) -> tuple[tuple[int, ...], ...]:
    """Split log_n into super-leaves (each <= 2^MAX_SUPER), then each
    super-leaf into radix logs (4, 4, 4, ...)."""
    supers = []
    rest = log_n
    while rest > MAX_SUPER:
        supers.append(MAX_SUPER)
        rest -= MAX_SUPER
    supers.append(rest)
    out = []
    for s in supers:
        radices = [4] * (s // 4)
        if s % 4:
            radices.append(s % 4)
        out.append(tuple(radices))
    return tuple(out)


class MxuDomain:
    """Per-(field, log_n, inverse) stage matrices and fold tables."""

    def __init__(self, spec: FieldSpec, log_n: int, inverse: bool):
        self.spec = spec
        self.log_n = log_n
        self.inverse = inverse
        p = spec.modulus
        base = get_domain(spec, log_n, inverse)
        # plain (non-Montgomery) canonical size-n root, inverse-adjusted
        self.omega = spec.from_mont(base.omega)
        self.n_inv_plain = (
            spec.from_mont(base.n_inv) if inverse else None
        )
        self.plan = _plan(log_n)
        self.d_const = -(-p.bit_length() // DB)  # 37 for 255-bit moduli
        self.d_out = self.d_const + D_IN - 1  # 75
        # stage matrices per super-leaf: list of lists of (t, V*D_IN, U*d_out)
        self.stages: list[list[np.ndarray]] = []
        self.perms: list[np.ndarray] = []
        log_rest = log_n
        for si, radices in enumerate(self.plan):
            s_log = sum(radices)
            # super-leaf root: w_S = omega^(n / S)
            w_s = pow(self.omega, 1 << (log_n - s_log), p)
            absorb = None
            if inverse and si == len(self.plan) - 1:
                absorb = self.n_inv_plain  # fold 1/n into the last stage
            self.stages.append(self._super_matrices(radices, w_s, absorb))
            self.perms.append(self._digit_reverse_perm(radices))
            log_rest -= s_log
        self._fold = self._fold_matrix()
        self._topk = self._top_fold_consts()

    # -- matrix builders ----------------------------------------------------

    def _super_matrices(self, radices, w_s, absorb_last):
        p = self.spec.modulus
        s_log = sum(radices)
        mats = []
        t_log = 0
        for depth, r_log in enumerate(radices):
            V = 1 << r_log
            T = 1 << t_log
            blk_log = t_log + r_log  # log size after this stage
            # within-stage root: order 2^blk_log
            w_blk = pow(w_s, 1 << (s_log - blk_log), p)
            w_v = pow(w_blk, T, p)  # order V: the DFT_V kernel root
            last = depth == len(radices) - 1
            scale = absorb_last if (absorb_last is not None and last) else 1
            M = np.zeros((T, V * D_IN, V * self.d_out), np.int8)
            for t in range(T):
                for u in range(V):
                    for v in range(V):
                        c = (
                            pow(w_v, (u * v) % V, p)
                            * pow(w_blk, (v * t) % (1 << blk_log), p)
                            % p
                        )
                        c = c * scale % p
                        M[t, v * D_IN : (v + 1) * D_IN,
                          u * self.d_out : (u + 1) * self.d_out] = (
                            _toeplitz_block(c, D_IN, self.d_out)
                        )
            mats.append(M)
            t_log = blk_log
        return mats

    @staticmethod
    def _digit_reverse_perm(radices) -> np.ndarray:
        """Mixed-radix digit reversal so DIT stages output natural order."""
        s = 1 << sum(radices)
        idx = np.arange(s)
        out = np.zeros_like(idx)
        # index j = j_0 + j_1*r0 + j_2*r0*r1 + ...  ->  reversed digit order
        rem = idx.copy()
        digits = []
        for r_log in radices:
            digits.append(rem & ((1 << r_log) - 1))
            rem >>= r_log
        for d, r_log in zip(digits, radices):
            out = (out << r_log) | d
        return out

    def _fold_matrix(self) -> np.ndarray:
        """(36*4, d_const) int8: row (c, k) holds digits of
        2^(7*(39+c) + 7*k) mod p — folds matmul columns >= D_IN."""
        p = self.spec.modulus
        n_hi = self.d_out - D_IN  # 36
        F = np.zeros((n_hi * 4, self.d_const), np.int8)
        for c in range(n_hi):
            for k in range(4):
                val = pow(2, DB * (D_IN + c + k), p)
                F[c * 4 + k] = _int_digits(val, self.d_const)
        return F

    def _top_fold_consts(self) -> np.ndarray:
        """(5, d_const) int8 digit rows of 2^(7*c) mod p for c = 38..42 —
        the small VPU fold bringing values back under 2^267."""
        p = self.spec.modulus
        return np.stack(
            [_int_digits(pow(2, DB * c, p), self.d_const) for c in range(38, 43)]
        )


@functools.lru_cache(maxsize=16)
def get_mxu_domain(spec: FieldSpec, log_n: int, inverse: bool) -> MxuDomain:
    return MxuDomain(spec, log_n, inverse)


# ---------------------------------------------------------------------------
# device-side digit arithmetic (jnp; nonnegative int32 columns throughout)
# ---------------------------------------------------------------------------


def _ks_carry(u):
    """Exact digits of nonnegative columns u (each < 2^8, i.e. after split
    passes) along the last axis; carries are 0/1 (see fields/fp.py for the
    generate/propagate disjointness argument, here base 128)."""
    g = u >> DB
    pr = (u & DMASK) == DMASK
    def op(x, y):
        gx, px = x
        gy, py = y
        return (gy | (py & gx), py & px)
    G, _ = jax.lax.associative_scan(op, (g, pr.astype(u.dtype)), axis=-1)
    C = jnp.concatenate([jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
    return (u + C) & DMASK


def _normalize_digits(cols, out_digits: int):
    """Nonnegative int32 columns (< 2^26) -> exact base-128 digits, length
    out_digits (caller guarantees the value fits)."""
    x = cols
    pad = out_digits - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x = x[..., :out_digits]
    # 3 split passes: 26 -> 19 -> 12 -> 8 bits per column
    for _ in range(3):
        d = x & DMASK
        c = x >> DB
        x = d + jnp.concatenate(
            [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1
        )
    return _ks_carry(x)


def _stage_apply(dom: MxuDomain, x, M, fold, topk):
    """One absorbed-twiddle DIT stage.

    x: (G, V, T, B, D_IN) int8 digit tensor (value < 2^267 each).
    M: (T, V*D_IN, V*d_out) int8.  Returns (G, V(out=u), T, B, D_IN).
    """
    G, V, T, B, D = x.shape
    d_out = dom.d_out
    # lhs: (T, G*B, V*D)
    lhs = jnp.transpose(x, (2, 0, 3, 1, 4)).reshape(T, G * B, V * D)
    out = jax.lax.dot_general(
        lhs, M, (((2,), (1,)), ((0,), (0,))), preferred_element_type=I32
    )  # (T, G*B, V*d_out)
    cols = out.reshape(T, G, B, V, d_out)
    lo = cols[..., :D_IN]  # (T, G, B, V, 39) int32 < 2^24
    hi = cols[..., D_IN:]  # (..., 36) int32 < 2^24
    # fold high columns on the MXU: decompose to 4 base-128 sub-digits
    hi_d = jnp.stack(
        [(hi >> (DB * k)) & DMASK for k in range(4)], axis=-1
    ).reshape(*hi.shape[:-1], -1).astype(I8)  # (..., 144)
    folded = jax.lax.dot_general(
        hi_d, fold, (((hi_d.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=I32,
    )  # (..., d_const=37)
    dc = folded.shape[-1]
    E = lo + jnp.pad(folded, [(0, 0)] * (lo.ndim - 1) + [(0, D_IN - dc)])
    dig = _normalize_digits(E, 43)  # value < 2^290 -> 43 exact digits
    # top fold: digits 38..42 via the small constant rows (VPU)
    top = dig[..., 38:43]  # each < 128
    contrib = jnp.einsum(
        "...k,kd->...d", top.astype(I32), jnp.asarray(topk, I32)
    )  # < 5*127*127 per digit-col
    low = dig[..., :38].at[..., : topk.shape[1]].add(
        jnp.pad(contrib, [(0, 0)] * (contrib.ndim - 1)
                + [(0, max(0, 38 - topk.shape[1]))])[..., :38]
    ) if False else None
    base = jnp.pad(contrib, [(0, 0)] * (contrib.ndim - 1)
                   + [(0, max(0, 39 - topk.shape[1]))])[..., :39]
    E2 = jnp.pad(dig[..., :38], [(0, 0)] * (dig.ndim - 1) + [(0, 1)]) + base
    dig2 = _normalize_digits(E2, D_IN)  # < 2^267 -> 39 exact digits
    # output index u sits where v was: (T, G, B, u, D) -> (G, u, T, B, D)
    return jnp.transpose(dig2.astype(I8), (1, 3, 0, 2, 4))


def _super_apply(dom: MxuDomain, si: int, x, tables):
    """Full super-leaf NTT along axis 0 of (S, B, D_IN) int8 digits."""
    radices = dom.plan[si]
    S, B, D = x.shape
    perm = jnp.asarray(dom.perms[si])
    x = x[perm]  # digit-reversed input order
    t_log = 0
    for depth, r_log in enumerate(radices):
        V = 1 << r_log
        T = 1 << t_log
        Gs = S >> (t_log + r_log)
        xv = x.reshape(Gs, V, T, B, D)
        xv = _stage_apply(dom, xv, tables[(si, depth)], tables["fold"],
                          dom._topk)
        x = xv.reshape(S, B, D)
        t_log += r_log
    return x


# ---------------------------------------------------------------------------
# digit <-> half-limb conversion (device)
# ---------------------------------------------------------------------------


def limbs_to_digits(xp: jnp.ndarray, L: int) -> jnp.ndarray:
    """(..., L) uint32 half-limbs -> (..., D_IN) int8 base-128 digits."""
    bits_total = L * LIMB_BITS
    outs = []
    for i in range(D_IN):
        lo_bit = DB * i
        if lo_bit >= bits_total:
            outs.append(jnp.zeros(xp.shape[:-1], U32))
            continue
        k, r = divmod(lo_bit, LIMB_BITS)
        v = xp[..., k] >> r
        if r + DB > LIMB_BITS and k + 1 < L:
            v = v | (xp[..., k + 1] << (LIMB_BITS - r))
        outs.append(v & DMASK)
    return jnp.stack(outs, axis=-1).astype(I8)


def digits_to_limbs_mod_p(spec: FieldSpec, dig: jnp.ndarray) -> jnp.ndarray:
    """(..., D_IN) exact digits (value < 2^267) -> (..., L) half-limbs,
    fully reduced mod p via binary conditional subtraction."""
    L = spec.n_limbs
    Lx = L + 2  # 2^267 needs 17 limbs; +1 headroom
    val = jnp.zeros(dig.shape[:-1] + (Lx,), U32)
    d32 = dig.astype(U32)
    for i in range(D_IN):
        lo_bit = DB * i
        k, r = divmod(lo_bit, LIMB_BITS)
        val = val.at[..., k].add((d32[..., i] << r) & 0xFFFF)
        spill = d32[..., i] >> (LIMB_BITS - r) if r + DB > LIMB_BITS else None
        if spill is not None and k + 1 < Lx:
            val = val.at[..., k + 1].add(spill)
    # normalize (columns < 2^16 * few) then subtract 2^k * p ladders
    from ..fields.fp import field_ops

    f = field_ops(spec)
    d = val & 0xFFFF
    c = val >> LIMB_BITS
    val = d + jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    # one 0/1-carry pass
    g = val >> LIMB_BITS
    pr = ((val & 0xFFFF) == 0xFFFF).astype(U32)
    def op(xx, yy):
        gx, px = xx
        gy, py = yy
        return (gy | (py & gx), py & px)
    G, _ = jax.lax.associative_scan(op, (g, pr), axis=-1)
    C = jnp.concatenate([jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
    val = (val + C) & 0xFFFF
    # value < 2^267 = 2^(267 - bits(p)) * p-ish: 14 conditional subtracts
    p = spec.modulus
    shifts = range(266 - p.bit_length(), -1, -1)
    for s in shifts:
        kp = int_to_limbs(p << s, Lx)
        t = val + (jnp.uint32(1) << LIMB_BITS) - jnp.asarray(kp, U32)
        d2 = t & 0xFFFF
        g2 = jnp.uint32(1) - (t >> LIMB_BITS)
        p2 = (d2 == 0).astype(U32)
        G2, _ = jax.lax.associative_scan(op, (g2, p2), axis=-1)
        B2 = jnp.concatenate([jnp.zeros_like(G2[..., :1]), G2[..., :-1]], axis=-1)
        sub = (t - B2) & 0xFFFF
        val = jnp.where((G2[..., -1:] == 0), sub, val)
    return val[..., :L]


# ---------------------------------------------------------------------------
# top-level transform
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _device_tables(spec: FieldSpec, log_n: int, inverse: bool):
    """Stage matrices / fold matrix as device arrays keyed for reuse."""
    dom = get_mxu_domain(spec, log_n, inverse)
    t = {}
    for si, mats in enumerate(dom.stages):
        for depth, M in enumerate(mats):
            t[(si, depth)] = jnp.asarray(M)
    t["fold"] = jnp.asarray(dom._fold)
    return dom, t


def mxu_ntt_planes(
    spec: FieldSpec, xp: jnp.ndarray, inverse: bool = False
) -> jnp.ndarray:
    """Natural-order NTT of an (L, n) half-limb plane batch on the MXU;
    bit-exact with ops/ntt.FftKernel.  Montgomery domain in and out."""
    L, n = xp.shape
    log_n = int(n).bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("FFT size must be a power of two")
    dom, tables = _device_tables(spec, log_n, inverse)
    x = limbs_to_digits(jnp.swapaxes(xp, 0, 1), L)  # (n, D)
    plan = dom.plan
    # recursive four-step over super-leaves (mirrors pallas/ntt_fused._rec)
    def rec(x, si, log_m):
        # x: (m, B, D) digits; NTT along axis 0 with canonical size-m root
        s_log = sum(plan[si])
        if log_m == s_log:
            return _super_apply(dom, si, x, tables)
        n2 = 1 << s_log
        n1 = 1 << (log_m - s_log)
        m, B, D = x.shape
        x4 = x.reshape(n2, n1 * B, D)
        y = _super_apply(dom, si, x4, tables)  # NTT_n2 over rows j2
        # twiddle w_m^(k2*j1): half-limb Montgomery multiply (Pallas kernel)
        y = y.reshape(n2, n1, B, D)
        y = _twiddle_pass(dom, y, log_m, s_log)
        y = jnp.swapaxes(y, 0, 1)  # (n1, n2, B, D)
        z = rec(y.reshape(n1, n2 * B, D), si + 1, log_m - s_log)
        return z.reshape(n1 * n2, B, D)

    out = rec(x[:, None, :], 0, log_n)[:, 0, :]
    limbs = digits_to_limbs_mod_p(spec, out)
    return jnp.swapaxes(limbs, 0, 1)


def _twiddle_pass(dom: MxuDomain, y, log_m: int, log_n2: int):
    """(n2, n1, B, D) digits *= w_m^(k2*j1): pack to half-limbs, one fused
    Montgomery-multiply pass, unpack.  Table built like ntt_fused."""
    from .pallas.mont import mont_mul_planes
    from .pallas.ntt_fused import get_fused_domain

    spec = dom.spec
    L = spec.n_limbs
    n2, n1, B, D = y.shape
    interpret = jax.default_backend() == "cpu"
    # reuse the fused-NTT inter-level table builder (Montgomery domain)
    fd = get_fused_domain.__wrapped__ if False else None
    tbl = _twiddle_table(dom, log_m, log_m - log_n2)  # (L, n2, n1) np
    limbs = _digits_to_limbs_raw(y)  # (n2, n1, B, L) u32, value < 2^267? no:
    # y digits are exact and < p? NOT guaranteed (< 2^267); must reduce first
    planes = jnp.swapaxes(limbs.reshape(n2 * n1 * B, -1), 0, 1)
    T = jnp.asarray(tbl)[:, :, :, None]  # (L, n2, n1, 1)
    Tb = jnp.broadcast_to(T, (L, n2, n1, B)).reshape(L, n2 * n1 * B)
    prod = mont_mul_planes(spec, planes, Tb, interpret=interpret)
    out = jnp.swapaxes(prod, 0, 1).reshape(n2, n1, B, L).astype(U32)
    return limbs_to_digits(out, L)


def _digits_to_limbs_raw(dig):
    raise NotImplementedError  # replaced below


@functools.lru_cache(maxsize=None)
def _twiddle_table(dom_key, log_m: int, log_n1: int):
    raise NotImplementedError  # replaced below
