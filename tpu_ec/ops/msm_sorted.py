"""Sort-based Pippenger MSM — the TPU-native bucket-accumulation engine.

Replaces the GPU's per-thread serial bucket accumulation
(`ag-build/cl/multiexp.cl:95-119`: each thread owns 2^(w-1) buckets and
serially `POINT_add_mixed`s its chunk) with a fully data-parallel pipeline
that never does a per-lane indexed read-modify-write:

  per window (lax.map over the W windows, one compiled body):
    1. signed digit -> (|digit|, sign) keys              (multiexp.cl:103-118)
    2. sort (key, index) — XLA sort groups equal buckets into contiguous runs
    3. gather points into sorted order, negating y where sign<0
       ("neg_is_cheap", multiexp.cl:30-38)
    4. run-halving rounds: pair adjacent same-key entries, ONE batched
       point-add over all pairs, compact survivors.  Each round halves every
       run, so sizes shrink geometrically (n/2+B, n/4+B, ... ~B); the add
       work totals ~n point-adds per window — the same count as the GPU's
       serial bucket loop, but batched across the full VPU.
    5. once sizes bottom out near the bucket count, a fori_loop of
       constant-size halving rounds (one add in the compiled graph) finishes
       ARBITRARY residual run lengths — worst-case correct for adversarial
       digit distributions in ceil(log2(size)) extra rounds.
    6. every run now has length 1: entries scatter directly into a
       (2^(w-1)+2)-slot bucket array; the triangular weighted sum
       S = sum_k k*bucket[k] (multiexp.cl:121-131) is a Hillis-Steele
       suffix scan + log-depth tree sum.
  window combine: Horner with w doublings per window, on device
  (the reference does this on the CPU, ec-gpu-proxy/src/multiexp.rs:221-235).

Total point-add work per window: ~1.1n (halving) + O(B log B) tail — within
~20% of the GPU algorithm's n + 2B for the default window sizing, with every
add an 8x128-lane batched op (the Pallas fused kernels in ops/pallas/point.py
via PointOps dispatch).

The compiled graph stays small by construction: the shrinking rounds unroll
(~log2(n/B) adds), everything else is fori_loop bodies holding one add —
compile time is flat in n.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import PointOps
from .msm import SCALAR_BITS, make_digits

tmap = jax.tree_util.tree_map


def default_window_size_sorted(n: int) -> int:
    """Window bits minimizing W*(1.1n + 3*B*log2(B)), B = 2^(w-1): the sorted
    engine's measured work model (halving rounds + fixed-point tail +
    triangular scan).  Clamped to [2, 16] (digit extraction spans at most two
    16-bit limbs, msm.make_digits)."""
    if n <= 1:
        return 2
    best_w, best_cost = 2, float("inf")
    for w in range(2, 17):
        W = -(-SCALAR_BITS // w)
        B = 1 << (w - 1)
        cost = W * (1.1 * n + 3 * B * max(1, w - 1))
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w


def _gather(P, idx):
    return tmap(lambda l: l[idx], P)


def _halving_round(ops: PointOps, key, P, s_out: int, *, affine: bool):
    """One run-halving round over ``(key, P)`` sorted arrays of length s.

    Pairs the entries at even position within each equal-key run with their
    odd successor, adds each pair with ONE batched point-add, and compacts
    survivors (pair sums + unpaired evens) into arrays of length ``s_out``.
    Unused tail slots hold (sentinel_key, identity).  ``affine=True`` for the
    first round where entries are still affine (output is always Jacobian).

    Survivor-count bound: each run of length len yields ceil(len/2)
    survivors; summed over at most (2^(w-1)+2) distinct keys this is
    <= s//2 + half//2 + 2 <= s_out (callers size s_out accordingly), so the
    compaction never overflows.
    """
    s = key.shape[0]
    sentinel = jnp.asarray(np.iinfo(np.int32).max, key.dtype)
    i = jnp.arange(s, dtype=jnp.int32)
    f = jnp.concatenate([jnp.ones((1,), bool), key[1:] != key[:-1]])
    start = jax.lax.cummax(jnp.where(f, i, 0))
    parity_even = ((i - start) & 1) == 0
    nxt_same = jnp.concatenate([key[1:] == key[:-1], jnp.zeros((1,), bool)])
    paired = parity_even & nxt_same

    # compaction: survivor (= even-parity) entry i goes to slot c[i]
    c = jnp.cumsum(parity_even.astype(jnp.int32)) - 1
    tgt = jnp.where(parity_even, c, s_out)  # non-survivors -> overflow slot
    # sel[j] = original index of the j-th survivor (s = appended sentinel)
    sel = (
        jnp.full((s_out + 1,), s, jnp.int32)
        .at[tgt]
        .set(i, mode="drop")[:s_out]
    )

    key_ext = jnp.concatenate([key, sentinel[None]])
    new_key = key_ext[sel]
    paired_s = jnp.concatenate([paired, jnp.zeros((1,), bool)])[sel]
    selB = jnp.where(paired_s, sel + 1, s)  # partner or sentinel-identity

    if affine:
        ident_a = tmap(lambda l: jnp.zeros((1,) + l.shape[1:], l.dtype), P)
        P_ext = tmap(lambda l, z: jnp.concatenate([l, z]), P, ident_a)
        A = _gather(P_ext, sel)
        B = _gather(P_ext, selB)
        new_P = ops.add_mixed(ops.to_jacobian(A), B)
    else:
        ident = ops.identity_jacobian((1,))
        P_ext = tmap(lambda l, z: jnp.concatenate([l, z]), P, ident)
        A = _gather(P_ext, sel)
        B = _gather(P_ext, selB)
        new_P = ops.add(A, B)
    return new_key, new_P


def _hs_prefix_scan(ops: PointOps, v, length: int):
    """Inclusive Hillis-Steele prefix scan with point-add over axis 0.

    Work O(B log B) instead of associative_scan's O(B), in exchange for a
    compiled graph holding exactly ONE add (the shift distance is a traced
    fori_loop value) — compile time is what binds here, not the tail work.
    """
    iota = jnp.arange(length, dtype=jnp.int32)
    ident = ops.identity_jacobian((length,))

    def body(j, acc):
        d = jnp.int32(1) << j
        rolled = tmap(lambda l: jnp.roll(l, d, axis=0), acc)
        nb = ops.select((iota >= d), rolled, ident)
        return ops.add(acc, nb)

    n_steps = max(1, math.ceil(math.log2(length))) if length > 1 else 0
    return jax.lax.fori_loop(0, n_steps, body, v)


def _triangular_sum(ops: PointOps, buckets, half: int):
    """S = sum_{k=1..half} k * bucket[k] (multiexp.cl:121-131): suffix scan
    (suffix[k] = sum_{j>=k} b_j, so S = sum_k suffix[k]) + tree sum.
    ``buckets`` has half+2 slots; slot 0 (digit 0) and slot half+1
    (overflow/sentinel) are excluded."""
    body = tmap(lambda l: l[1 : half + 1][::-1], buckets)  # reversed (half,)
    suffix = _hs_prefix_scan(ops, body, half)
    acc = suffix  # summing all suffix values, any order
    g = half
    while g > 1:
        lo = tmap(lambda l: l[: g // 2], acc)
        hi = tmap(lambda l: l[g // 2 : g], acc)
        acc = ops.add(lo, hi)
        g //= 2
    return tmap(lambda l: l[0], acc)


def _plan_sizes(n: int, half: int) -> list[int]:
    """Static compaction sizes for the unrolled halving rounds: shrink while
    the geometric term dominates the ~(half+6) fixed point, then hand off to
    the constant-size fori_loop rounds."""
    sizes = []
    s = n
    floor = int(1.25 * (half + 6)) + 8
    while s > floor:
        nxt = min(s, s // 2 + half // 2 + 3)
        if nxt >= s:
            break
        s = nxt
        sizes.append(s)
    return sizes


def msm_sorted(
    ops: PointOps,
    points,  # affine pytree, leaves (n, L); (0,0) = identity
    scalars: jnp.ndarray,  # (n, Ls+1) plain-int limbs, zero-padded one limb
    *,
    window_size: int,
    signed: bool = True,
):
    """One full MSM -> Jacobian point batch shape (1,).  Trace-time body;
    jit via MultiexpKernel."""
    assert signed, "sorted engine implements signed digits only"
    w = window_size
    num_windows = -(-SCALAR_BITS // w)
    half = 1 << (w - 1)
    n = scalars.shape[0]
    nbuckets = half + 2  # slot 0 = digit 0, slot half+1 = overflow/sentinel

    digits = make_digits(scalars, w, num_windows, signed)  # (n, W) int32
    digits_t = jnp.swapaxes(digits, 0, 1)  # (W, n)
    x, y = points
    yneg = ops.F.neg(y)
    sizes = _plan_sizes(n, half)

    def window_body(dig):
        key = jnp.abs(dig).astype(jnp.int32)
        sign = dig < 0
        idx = jnp.arange(n, dtype=jnp.int32)
        key_s, perm = jax.lax.sort_key_val(key, idx)
        xs = _gather(x, perm)
        sg = sign[perm]
        ys = ops.F.select(sg, _gather(yneg, perm), _gather(y, perm))
        P = (xs, ys)
        k = key_s
        # unrolled shrinking rounds (~log2(n/half) adds in the graph)
        for r, s_out in enumerate(sizes):
            k, P = _halving_round(ops, k, P, s_out, affine=(r == 0))
        if not sizes:  # tiny n: no halving ran; convert for the tail
            P = ops.to_jacobian(P)
        # constant-size rounds finish arbitrary residual runs (1 add in graph)
        s_f = k.shape[0]

        def fix_body(_, state):
            kk, PP = state
            return _halving_round(ops, kk, PP, s_f, affine=False)

        rounds = max(1, math.ceil(math.log2(s_f))) if s_f > 1 else 0
        k, P = jax.lax.fori_loop(0, rounds, fix_body, (k, P))
        # every run has length 1: scatter straight into buckets
        slot = jnp.minimum(k, nbuckets - 1)  # sentinels -> overflow slot
        buckets = ops.identity_jacobian((nbuckets,))
        buckets = tmap(lambda bl, vl: bl.at[slot].set(vl, mode="drop"), buckets, P)
        return _triangular_sum(ops, buckets, half)

    partials = jax.lax.map(window_body, digits_t)  # leaves (W, ...)

    # Horner window combine, high-to-low (multiexp.rs:221-235, on device)
    W = num_windows

    def combine(j, res):
        res = jax.lax.fori_loop(0, w, lambda _, r: ops.double(r), res)
        Sj = tmap(
            lambda l: jax.lax.dynamic_slice_in_dim(l, W - 1 - j, 1, axis=0),
            partials,
        )
        return ops.add(res, Sj)

    return jax.lax.fori_loop(0, W, combine, ops.identity_jacobian((1,)))
