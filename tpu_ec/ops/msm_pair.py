"""Pair-halving MSM engine — movement-minimal TPU bucket accumulation.

Fourth-generation bucket engine (after lattice / sorted / co-Z), same job as
the GPU's per-thread serial bucket loop (`ag-build/cl/multiexp.cl:95-119`)
but shaped by measured movement costs on this chip class (see
scripts/profile_movement.py):

    narrow sort (key, idx)        ~6.6 ns/row
    row gather (n, 48) u32        ~56  ns/row   <- paid ONCE per window
    monotone masked gather        ~37  ns/row   <- only on spill rows (<= B)
    scatter                       ~165 ns/row   <- only on <= B bucket rows

The engines this replaces paid several wide gathers *per halving round*
(msm_sorted) or a log-depth product tree of kernel launches per round
(msm_coz).  Here every round's data movement is a free reshape:

  1. per window: sort (|digit|, index) -> gather the points into bucket
     order ONCE as a fused (n, 2L) row matrix (one gather, not one per
     coordinate).
  2. pair round: view (s, C) as (s/2, 2, C); pair (2i, 2i+1).  Equal keys
     merge with ONE batched point add; a boundary pair (different keys)
     keeps its left entry and SPILLS its right entry to a bounded side
     buffer (#boundary pairs <= #live runs <= B+1, so the spill buffer is
     a static (B + slack) allocation packed by a masked monotone gather).
     The output width is s/2 UNCONDITIONALLY — compaction is a reshape,
     sorted order is preserved, and each round costs exactly one add per
     surviving pair.  Total adds per window ~= n (optimal for Pippenger
     accumulation; the GPU kernel's count is the same).
  3. finish: concat all spills (keys may repeat across rounds) + the last
     survivor, re-sort, and clear the short residual runs with a strided
     segmented Hillis-Steele scan (log2 rounds of shift+select+add, zero
     irregular movement), keeping each run's last (= complete) entry.
  4. unique survivors scatter into the (B+2)-slot bucket array; the
     triangular weighted sum and Horner window combine run as in
     msm_sorted (`multiexp.cl:121-131`, `multiexp.rs:221-235` analogs).

All W windows run under one `lax.map` (one compiled window body), so the
whole MSM is a single XLA program regardless of n.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import PointOps
from .msm import SCALAR_BITS, make_digits
from .msm_sorted import _triangular_sum

tmap = jax.tree_util.tree_map
I32 = jnp.int32
U32 = jnp.uint32
SENT = np.int32(np.iinfo(np.int32).max)


def default_window_size_pair(n: int) -> int:
    """Measured-constant cost model: per window the engine pays
    ~(sort 6.6 + gather 56)*n ns fixed, ~70*n ns of adds, and a bucket
    tail ~ 2*B*log2(B) add-lanes; W = ceil(256/w) windows."""
    if n <= 1:
        return 2
    best_w, best_cost = 2, float("inf")
    for w in range(2, 17):
        W = -(-SCALAR_BITS // w)
        B = 1 << (w - 1)
        cost = W * (n * (6.6 + 56 + 70) + 90.0 * B * max(1, int(math.log2(B)) + 1))
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w


def _fuse(P):
    """Affine/Jacobian coord tuple of (s, L) leaves -> one (s, kL) matrix."""
    return jnp.concatenate(P, axis=1)


def _unfuse(D, L, k):
    return tuple(D[:, i * L : (i + 1) * L] for i in range(k))


def _masked_monotone_pack(keys, data, mask, cap: int):
    """Pack rows of ``data`` (s, C) where mask is set into a (cap, C) buffer
    (narrow sort for the indices + one monotone row gather).  Overflow rows
    beyond cap are dropped — callers must size cap to the proven bound.
    Returns (packed_keys, packed_data); empty slots hold (SENT, 0)."""
    s = keys.shape[0]
    iota = jnp.arange(s, dtype=I32)
    slot = jnp.where(mask, iota, s)
    order = jax.lax.sort(slot)[: cap]
    valid = order < s
    safe = jnp.minimum(order, s - 1)
    pk = jnp.where(valid, keys[safe], SENT)
    pd = jnp.where(valid[:, None], data[safe], 0)
    return pk, pd


def _pair_round(ops: PointOps, key, data, *, affine: bool, spill_cap: int):
    """One halving round: (s,) keys + (s, C) fused rows -> (s/2,) + spill.

    Pairs (2i, 2i+1): equal keys merge (one batched add), boundary pairs
    keep left and spill right.  Returns (key', data', spill_key, spill_data)
    with data' always Jacobian-fused (3L columns)."""
    L = ops.L
    s = key.shape[0]
    kp = key.reshape(s // 2, 2)
    ke, ko = kp[:, 0], kp[:, 1]
    C = data.shape[1]
    dp = data.reshape(s // 2, 2, C)
    A, B = dp[:, 0, :], dp[:, 1, :]
    same = ke == ko

    if affine:
        Aj = ops.to_jacobian(_unfuse(A, L, 2))
        Bj = _unfuse(B, L, 2)
        merged = ops.add_mixed(Aj, Bj)
        Afull = _fuse(Aj)
    else:
        Aj = _unfuse(A, L, 3)
        merged = ops.add(Aj, _unfuse(B, L, 3))
        Afull = A
    out = jnp.where(same[:, None], _fuse(merged), Afull)

    spill_mask = (~same) & (ko != SENT)
    sk, sd = _masked_monotone_pack(ko, B, spill_mask, spill_cap)
    return ke, out, sk, sd


def _seg_scan_finish(ops: PointOps, key, data, max_run_log: int):
    """Strided segmented scan: after sorting, residual runs are short
    (<= 2^max_run_log); log-depth shifted adds fold each run into its LAST
    entry.  Returns (key, data) with non-last entries keyed SENT."""
    L = ops.L
    s = key.shape[0]

    def body(r, st):
        k, d = st
        sh = 1 << r
        # partner at i - sh (shift down the array)
        k_sh = jnp.concatenate([jnp.full((sh,), SENT, k.dtype), k[:-sh]])
        d_sh = jnp.concatenate([jnp.zeros((sh, d.shape[1]), d.dtype), d[:-sh]])
        m = (k == k_sh) & (k != SENT)
        added = _fuse(ops.add(_unfuse(d, L, 3), _unfuse(d_sh, L, 3)))
        return k, jnp.where(m[:, None], added, d)

    # mark: run position r folds predecessors within distance 2^r; an entry
    # at run position q accumulates all q predecessors after ceil(log2)
    # rounds ONLY if partner strides align — Hillis-Steele inclusive scans
    # do: after round r each entry holds the sum of itself and up to 2^r-1
    # predecessors in its run (standard segmented-scan induction).
    for r in range(max_run_log):
        key, data = body(r, (key, data))
    nxt = jnp.concatenate([key[1:], jnp.full((1,), SENT, key.dtype)])
    is_last = (key != nxt) & (key != SENT)
    key = jnp.where(is_last, key, SENT)
    return key, data


def msm_pair_buckets(
    ops: PointOps,
    points,  # affine (x, y), leaves (n, L); (0, 0) = identity
    scalars: jnp.ndarray,  # (n, Ls+1) plain-int limbs, zero-padded one limb
    *,
    window_size: int,
    window_vmap: bool | None = None,
):
    """Bucket-accumulation stage only: returns a fused (W, half+2, 3L)
    uint32 array of Jacobian buckets (slot 0 = digit-0 dummy, slot half+1 =
    overflow; both excluded by the reduction).  Exposed separately so the
    distributed driver (parallel/msm_dist.py) can combine bucket arrays
    across shards on-fabric before paying the triangular tail once."""
    assert ops.spec.ext == 1, "pair engine is G1-only (Fp2 towers use sorted)"
    F = ops.F
    L = ops.L
    w = window_size
    num_windows = -(-SCALAR_BITS // w)
    half = 1 << (w - 1)
    nbuckets = half + 2
    n0 = scalars.shape[0]
    n = 1 << max(1, (n0 - 1).bit_length())

    digits = make_digits(scalars, w, num_windows, True)  # (n0, W)
    if n != n0:
        digits = jnp.concatenate(
            [digits, jnp.zeros((n - n0, num_windows), digits.dtype)], axis=0
        )
        points = tmap(
            lambda l: jnp.concatenate(
                [l, jnp.zeros((n - n0,) + l.shape[1:], l.dtype)], axis=0
            ),
            points,
        )
    digits_t = jnp.swapaxes(digits, 0, 1)  # (W, n)
    x, y = points
    fused = _fuse((x, y))  # (n, 2L)
    spill_cap = half + 2  # spills/round <= #live runs <= half+1
    rounds = int(math.log2(n))  # n is a power of two; halve down to width 1

    def window_body(dig):
        key = jnp.abs(dig).astype(I32)
        # digit 0 contributes nothing: key 0 -> bucket slot 0 is skipped by
        # the triangular sum, so zero digits ride along harmlessly.
        sign = dig < 0
        iota = jnp.arange(n, dtype=I32)
        key_s, perm = jax.lax.sort_key_val(key, iota)
        data = fused[perm]  # THE one wide gather per window
        sgn = sign[perm]
        # negate y where sign: cheap vector ops on the gathered rows
        yneg_g = F.neg(data[:, L:])
        data = jnp.concatenate(
            [data[:, :L], jnp.where(sgn[:, None], yneg_g, data[:, L:])], axis=1
        )

        k = key_s
        d = data
        spills = []
        for r in range(rounds):
            k, d, sk, sd = _pair_round(
                ops, k, d, affine=(r == 0), spill_cap=min(k.shape[0] // 2, spill_cap)
            )
            if r == 0:
                # round-1 spills are affine rows (2L); lift to Jacobian
                sdj = _fuse(ops.to_jacobian(_unfuse(sd, L, 2)))
                # keep identity encoding for empty slots: key SENT + z=0
                sdj = jnp.where((sk != SENT)[:, None], sdj, 0)
                sd = sdj
            spills.append((sk, sd))

        # survivors: the single remaining row + all spills
        fk = jnp.concatenate([k] + [s[0] for s in spills])
        fd = jnp.concatenate([d] + [s[1] for s in spills], axis=0)
        # keys repeat at most (#rounds + 1) times across spill generations
        order = jax.lax.sort_key_val(fk, jnp.arange(fk.shape[0], dtype=I32))[1]
        fk = fk[order]
        fd = fd[order]
        max_run_log = max(1, math.ceil(math.log2(rounds + 2)))
        fk, fd = _seg_scan_finish(ops, fk, fd, max_run_log)

        # unique survivors -> pack -> scatter into buckets
        pk, pd = _masked_monotone_pack(fk, fd, fk != SENT, nbuckets + 2)
        slot = jnp.where(pk == SENT, nbuckets - 1, jnp.minimum(pk, nbuckets - 1))
        return jnp.zeros((nbuckets, 3 * L), U32).at[slot].set(pd, mode="drop")

    # window scheduling: at small/mid n the whole accumulation runs with
    # every window batched (vmap: W-wide sorts/gathers/adds, full VPU
    # lanes); above the cap the live set would crowd HBM, so windows run
    # serially under lax.map.  Cap calibration on v5e: a single
    # window-vmapped 2^16 MSM compiles and runs (the 2^16 commit pipeline,
    # BENCH_PIPELINE_r05.json), but a 64-chunk batch with windows ALSO
    # vmapped tried to reserve 32 GiB at compile — the batch driver
    # therefore passes window_vmap=False (its chunk axis already fills the
    # lanes) and the single-MSM cap stays at 2^16.
    if window_vmap is None:
        window_vmap = n <= (1 << 16)
    if window_vmap:
        return jax.vmap(window_body)(digits_t)  # (W, nbuckets, 3L)
    return jax.lax.map(window_body, digits_t)  # (W, nbuckets, 3L)


def horner_combine(ops: PointOps, partials, w: int):
    """Per-window sums -> final point: res = 2^w * res + S_j, high to low
    (the reference's CPU-side combine, multiexp.rs:221-235, on device)."""
    W = jax.tree_util.tree_leaves(partials)[0].shape[0]

    def combine(j, res):
        res = jax.lax.fori_loop(0, w, lambda _, r: ops.double(r), res)
        Sj = tmap(
            lambda l: jax.lax.dynamic_slice_in_dim(l, W - 1 - j, 1, axis=0),
            partials,
        )
        return ops.add(res, Sj)

    return jax.lax.fori_loop(0, W, combine, ops.identity_jacobian((1,)))


def msm_pair(
    ops: PointOps,
    points,
    scalars: jnp.ndarray,
    *,
    window_size: int,
    window_vmap: bool | None = None,
):
    """One full MSM -> Jacobian point batch shape (1,).  Trace-time body,
    jit via MultiexpKernel.  G1 only; G2 towers use msm_sorted."""
    w = window_size
    half = 1 << (w - 1)
    L = ops.L
    buckets = msm_pair_buckets(
        ops, points, scalars, window_size=w, window_vmap=window_vmap
    )

    def window_tail(b):
        return _triangular_sum(ops, _unfuse(b, L, 3), half)

    # vmap, not lax.map: the tail's working set is only (W, half, 3L), so
    # all W windows' triangular reductions run batched (W*half lanes wide)
    # instead of serially at half lanes — the small-n fixed-cost cut of the
    # r4 VERDICT (the accumulation stage above keeps lax.map because its
    # per-window sort+gather working set is n rows).  EXCEPT under the
    # chunk-vmapped batch driver (window_vmap=False): a tail vmap nested
    # inside the chunk vmap makes the point ops see only the innermost
    # (half,)-row batch — below the Pallas gate — so the generic jnp mul's
    # (chunks, W, half, L, L) outer-product temps blow up at 5.3x TPU
    # padding (measured 21 GiB at slab 64, .chiplogs/amt_pair2.log).
    if window_vmap is False:
        partials = jax.lax.map(window_tail, buckets)
    else:
        partials = jax.vmap(window_tail)(buckets)
    return horner_combine(ops, partials, w)
