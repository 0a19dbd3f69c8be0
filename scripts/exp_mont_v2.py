"""Experiment: Montgomery-mul kernel variants, racing the current pad-based
SOS (ops/pallas/mont.py) against lower-op-count formulations.

V1: current PlaneField.mul (pad-materialized shifted adds)
V2: scratch rmw — accumulate partial products into a (2L+1, TN) VMEM scratch
    via static-slice read-modify-write (touches L+1 rows per step, not 2L)
V3: V2 product + Montgomery reduction on the MXU — m = t_lo*p' and m*p are
    matmuls with CONSTANT Toeplitz matrices of 8-bit digits (bf16 in, f32
    accum, exact: digits < 2^8, sums < 2^22)

All keep the 16-bit halflimb plane layout and R = 2^(16L) domain.
Correctness: vs fields.bigint.np_mont_mul.  Throughput: dependent-chain
repeats inside one jit, minus the ~28.5 ms axon dispatch overhead.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..")))

import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ec.fields.params import BLS12_381_FQ, LIMB_BITS, LIMB_MASK
from tpu_ec.fields.bigint import np_mont_mul
from tpu_ec.ops.pallas.mont import PlaneField, _ks_scan_rows, normalize_rows, sub_rows
from tpu_ec.utils.measure import timeit

SPEC = BLS12_381_FQ
L = SPEC.n_limbs  # 24
TN = 512
U32 = jnp.uint32
MASK = LIMB_MASK
REPS = 8
N = 1 << 18


# ---------------------------------------------------------------------------
# V2: scratch rmw accumulation
# ---------------------------------------------------------------------------


def mul_cols_rmw(a, b, L_, acc_ref, lo_rows=None):
    """Column sums of a*b accumulated in acc_ref[(2L+1, ...)]; returns the
    accumulated value.  lo_rows: only outputs < lo_rows are needed."""
    shape = (2 * L_ + 1,) + a.shape[1:]
    acc_ref[:] = jnp.zeros(shape, U32)
    top = lo_rows if lo_rows is not None else 2 * L_
    for i in range(L_):
        if i >= top:
            break
        w = min(L_, top - i)
        prod = a[i : i + 1] * b[:w]
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        acc_ref[i : i + w] = acc_ref[i : i + w] + lo
        acc_ref[i + 1 : i + w + 1] = acc_ref[i + 1 : i + w + 1] + hi
    return acc_ref[: 2 * L_]


def mul_v2(pf, a, b, p, npr, acc_ref):
    L_ = pf.L
    t = mul_cols_rmw(a, b, L_, acc_ref)
    t_lo_full = normalize_rows(t[:L_])
    t_lo, c_lo = t_lo_full[:L_], t_lo_full[L_:]
    t_hi = t[L_:]
    m = normalize_rows(
        mul_cols_rmw(t_lo, jnp.broadcast_to(npr, t_lo.shape), L_, acc_ref, lo_rows=L_)[:L_]
    )[:L_]
    mp = mul_cols_rmw(m, jnp.broadcast_to(p, m.shape), L_, acc_ref)
    u_hi = t_hi + mp[L_:] + jnp.concatenate([c_lo, jnp.zeros((L_ - 1,) + c_lo.shape[1:], U32)], axis=0)
    u = jnp.concatenate([t_lo + mp[:L_], u_hi], axis=0)
    un = normalize_rows(u)[: 2 * L_]
    return pf.cond_sub_p(un[L_:], p)


@functools.lru_cache(maxsize=None)
def v2_call(n):
    pf = PlaneField(SPEC)

    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref, acc_ref):
        x = a_ref[:]
        b = b_ref[:]
        p = p_ref[:]
        npr = np_ref[:]
        for _ in range(REPS):
            x = mul_v2(pf, x, b, p, npr, acc_ref)
        o_ref[:] = x

    bspec = pl.BlockSpec((L, TN), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), U32),
        grid=(n // TN,),
        in_specs=[cspec, cspec, bspec, bspec],
        out_specs=bspec,
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TN), U32)],
    )


# ---------------------------------------------------------------------------
# V3: MXU Montgomery reduction
# ---------------------------------------------------------------------------


def _toeplitz8(val: int, rows: int, cols: int) -> np.ndarray:
    """W[r, c] = digit_{r-c}(val) in base 256 (0 if r < c) — so
    W @ d gives the digit-column sums of val * value(d)."""
    digs = [(val >> (8 * k)) & 0xFF for k in range(rows)]
    W = np.zeros((rows, cols), np.float32)
    for r in range(rows):
        for c in range(min(cols, r + 1)):
            W[r, c] = digs[r - c]
    return W


def _ks_carry_base(cols, base_bits):
    """Exact base-2^base_bits digits of column values (< 2^31)."""
    mask = (1 << base_bits) - 1
    d = cols & mask
    c = cols >> base_bits
    z1 = jnp.zeros_like(d[:1])
    u = jnp.concatenate([d, z1], axis=0) + jnp.concatenate([z1, c], axis=0)
    g = u >> base_bits
    pr = ((u & mask) == mask).astype(U32)
    G = _ks_scan_rows(g, pr)
    C = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    return (u + C) & mask


def mul_v3(pf, a, b, p, Wnp8, Wp8, acc_ref):
    """Product on VPU; both reduction multiplies on the MXU (bf16 digit
    matmuls).  Wnp8: (2L, 2L) Toeplitz of nprime (mod 2^16L via truncation);
    Wp8: (4L, 2L) Toeplitz of p."""
    L_ = pf.L
    t = mul_cols_rmw(a, b, L_, acc_ref)  # (2L, TN) cols < 2^21
    t_n = normalize_rows(t)  # (2L+1, TN) 16-bit digits
    t_lo, t_hi = t_n[:L_], t_n[L_:]
    # 8-bit digit split of t_lo: (2L, TN) rows [lo8_0, hi8_0, lo8_1, ...]
    lo8 = t_lo & 0xFF
    hi8 = t_lo >> 8
    t8 = jnp.concatenate([lo8[:, None], hi8[:, None]], axis=1).reshape(
        (2 * L_,) + t_lo.shape[1:]
    )
    t8f = t8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    m_cols = jax.lax.dot_general(
        Wnp8, t8f, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (2L, TN) < 2^22
    m8 = _ks_carry_base(m_cols.astype(jnp.int32).astype(U32), 8)[: 2 * L_]
    m8f = m8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    mp_cols = jax.lax.dot_general(
        Wp8, m8f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4L, TN) < 2^22
    mpc = mp_cols.astype(jnp.int32).astype(U32)
    mpc2 = mpc.reshape((2 * L_, 2) + mpc.shape[1:])  # pair adjacent digit rows
    mp16 = mpc2[:, 0] + (mpc2[:, 1] << 8)  # (2L, TN) 16-bit cols < 2^30
    u = jnp.concatenate([t_lo, t_hi[:L_]], axis=0) + mp16
    un = normalize_rows(u)[: 2 * L_]
    return pf.cond_sub_p(un[L_:], p)


@functools.lru_cache(maxsize=None)
def v3_call(n):
    pf = PlaneField(SPEC)
    Wnp = jnp.asarray(_toeplitz8(SPEC.nprime, 2 * L, 2 * L).astype(jnp.bfloat16))
    Wp = jnp.asarray(_toeplitz8(SPEC.modulus, 4 * L, 2 * L).astype(jnp.bfloat16))

    def kernel(p_ref, wn_ref, wp_ref, a_ref, b_ref, o_ref, acc_ref):
        x = a_ref[:]
        b = b_ref[:]
        p = p_ref[:]
        for _ in range(REPS):
            x = mul_v3(pf, x, b, p, wn_ref[:], wp_ref[:], acc_ref)
        o_ref[:] = x

    bspec = pl.BlockSpec((L, TN), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wn_spec = pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wp_spec = pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), U32),
        grid=(n // TN,),
        in_specs=[cspec, wn_spec, wp_spec, bspec, bspec],
        out_specs=bspec,
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TN), U32)],
    )
    pc = jnp.asarray(np.asarray(SPEC.p_limbs, np.uint32)[:, None])
    return lambda a, b: call(pc, Wnp, Wp, a, b)


# ---------------------------------------------------------------------------
# V1 baseline with same REPS chaining
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def v1_call(n):
    pf = PlaneField(SPEC)

    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        x = a_ref[:]
        b = b_ref[:]
        for _ in range(REPS):
            x = pf.mul(x, b, p_ref[:], np_ref[:])
        o_ref[:] = x

    bspec = pl.BlockSpec((L, TN), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), U32),
        grid=(n // TN,),
        in_specs=[cspec, cspec, bspec, bspec],
        out_specs=bspec,
    )


def check_and_time(name, fn, a_np, b_np, want):
    a = jnp.asarray(a_np.T)
    b = jnp.asarray(b_np.T)
    t0 = time.time()
    out = np.asarray(jax.block_until_ready(fn(a, b))).T
    print(f"  [compile+run {time.time()-t0:.0f}s]", end=" ")
    ok = np.array_equal(out, want)
    dt = timeit(lambda: jax.block_until_ready(fn(a, b)), iters=3, warmup=1)
    per = (dt - 0.0285) / REPS / N * 1e9
    print(f"{name:10s} ok={ok}  {per:6.2f} ns/mul  ({N*REPS/(dt-0.0285)/1e6:.0f} M muls/s marginal)", flush=True)
    return ok


def main():
    rng = np.random.default_rng(0)
    # tile 64 distinct random field elements (keeps host-side oracle fast)
    av = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % SPEC.modulus for _ in range(64)]
    base_a = np.array([[(v >> (16 * i)) & 0xFFFF for i in range(L)] for v in av], np.uint32)
    bv = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % SPEC.modulus for _ in range(64)]
    base_b = np.array([[(v >> (16 * i)) & 0xFFFF for i in range(L)] for v in bv], np.uint32)
    reps = N // 64
    a_np = np.tile(base_a, (reps, 1))
    b_np = np.tile(base_b, (reps, 1))

    want = a_np.copy()
    for _ in range(REPS):
        want = np_mont_mul(SPEC, want, b_np)

    pc = jnp.asarray(np.asarray(SPEC.p_limbs, np.uint32)[:, None])
    nc = jnp.asarray(np.asarray(SPEC.nprime_limbs, np.uint32)[:, None])

    v1 = v1_call(N)
    check_and_time("V1 pad", lambda a, b: v1(pc, nc, a, b), a_np, b_np, want)
    v2 = v2_call(N)
    check_and_time("V2 rmw", lambda a, b: v2(pc, nc, a, b), a_np, b_np, want)
    v3 = v3_call(N)
    check_and_time("V3 mxu", v3, a_np, b_np, want)
    v2c = v2c_call(N)
    check_and_time("V2c list", v2c, a_np, b_np, want)





# ---------------------------------------------------------------------------
# V2c: limb-list layout — each limb is a full (8, TB) tile value; diagonal
# accumulation with no scratch traffic; sequential carry chains.
# ---------------------------------------------------------------------------


def norm_list(c, nbits=LIMB_BITS):
    """Sequential carry: list of column values -> exact digit list + carry."""
    mask = (1 << nbits) - 1
    out = []
    carry = None
    for v in c:
        if carry is not None:
            v = v + carry
        out.append(v & mask)
        carry = v >> nbits
    return out, carry


def sub_list(a, b):
    """(a - b) mod 2^(16L) digit list + borrow flag (1 if a < b)."""
    out = []
    borrow = None
    for x, y in zip(a, b):
        t = x + (1 << LIMB_BITS) - y if borrow is None else x + ((1 << LIMB_BITS) - 1) - y + borrow
        # borrow-in handling: first limb has no borrow; later: +carry_in where
        # carry_in = 1 - borrow_prev encoded via (t >> 16)
        out.append(t & MASK)
        borrow = t >> LIMB_BITS  # 1 = no borrow, 0 = borrow
    # normalize semantics: borrow flag returned as 1 if a < b
    return out, 1 - borrow


def mul_prod_list(a, b, lo_only=False):
    La, Lb = len(a), len(b)
    top = La if lo_only else La + Lb
    c = [None] * (La + Lb + 1)
    for i in range(La):
        for j in range(Lb):
            k = i + j
            if k >= top:
                continue
            prod = a[i] * b[j]
            lo = prod & MASK
            hi = prod >> LIMB_BITS
            c[k] = lo if c[k] is None else c[k] + lo
            c[k + 1] = hi if c[k + 1] is None else c[k + 1] + hi
    z = jnp.zeros_like(a[0])
    return [z if v is None else v for v in c[:top]]


def mul_v2c(a, b, p, npr):
    """Full SOS Montgomery mul on limb lists (16-bit digits)."""
    L_ = len(a)
    t = mul_prod_list(a, b)  # 2L cols (+1 slot trimmed)
    t_dig, t_carry = norm_list(t)  # 2L digits + carry(=0)
    t_lo, t_hi = t_dig[:L_], t_dig[L_:]
    m_cols = mul_prod_list(t_lo, npr, lo_only=True)
    m, _ = norm_list(m_cols)
    mp = mul_prod_list(m, p)
    u = [x + y for x, y in zip(t_lo + t_hi, mp)]
    u_dig, u_carry = norm_list(u)
    r = u_dig[L_:]
    # r + carry-in row: u < 2^766 so carry beyond 2L digits is 0
    d, br = sub_list(r, p)
    return [jnp.where(br.astype(jnp.bool_), x, y) for x, y in zip(r, d)]


@functools.lru_cache(maxsize=None)
def v2c_call(n):
    TB = 512

    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        p = [p_ref[i] for i in range(L)]
        npr = [np_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        x = [a_ref[i] for i in range(L)]
        for _ in range(REPS):
            x = mul_v2c(x, b, p, npr)
        for i in range(L):
            o_ref[i] = x[i]

    bspec = pl.BlockSpec((L, 8, TB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    nblk = n // (8 * TB)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, 8, n // 8), U32),
        grid=(nblk,),
        in_specs=[cspec, cspec, bspec, bspec],
        out_specs=bspec,
    )
    pc = jnp.asarray(np.asarray(SPEC.p_limbs, np.uint32)[:, None, None])
    nc = jnp.asarray(np.asarray(SPEC.nprime_limbs, np.uint32)[:, None, None])
    return lambda a, b: call(pc, nc, a.reshape(L, 8, n // 8), b.reshape(L, 8, n // 8)).reshape(L, n)


if __name__ == "__main__":
    main()
