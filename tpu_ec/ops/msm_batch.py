"""Flat batch MSM: all chunks in ONE bucket space per window.

This is the TPU shape of the reference fork's single-launch batch kernel
(`ag-build/cl/multiexp.cl:217-263`: a num_chunks x num_windows grid whose
threads share one launch).  The r4/r5 measurements killed the two obvious
orchestrations of many small MSMs:

- lax.map over chunks runs each chunk's point ops at batch-1 lane
  occupancy (r4 AMT: 6,570 pts/s, 37x off the single-MSM pace);
- vmap over chunks batches the sorts/gathers per chunk, but batched
  gathers lower to a slow path and the per-row cost LANDED 4x worse than
  serial (r5 amt_pair3: 2,642 pts/s) — and nesting the window vmap on
  top reserves 32 GiB at compile (.chiplogs/amt_pair2.log).

The fix is structural, not a scheduling knob: a batch of C chunks is ONE
MSM over C*n rows whose bucket key carries the chunk id —

    key[i] = chunk(i) * (half+1) + |digit(i)|

One sort + one wide gather + one pair-halving cascade per window covers
the WHOLE batch, so every per-row cost amortizes at the large-n rate
(measured ~0.2 us/row at 2^20 rows vs ~2.3 us/row at 2^14 — the whole
reason chunked execution was 20x off).  Buckets land in a (C, half+2)
grid; the triangular tails run lane-parallel across all C*W window
slices with the axis-aware masked scans (no vmap nesting — the point ops
see the full C*W*half batch and stay on the fused Pallas kernels), and
one batched Horner combine finishes all chunks together.

Reference parity: POINT_multiexp's chunk/window grid + bucket scratch
(`multiexp.cl:217-263`), the per-window triangular sum (:121-131) and
the cross-window aggregation (:159-197) — here as sort-based bucket
accumulation (PERF.md movement model), lane-parallel tails, and a
batched Horner, all inside one XLA program per slab.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..curves.point import PointOps
from .msm import SCALAR_BITS, make_digits
from .msm_pair import (
    SENT,
    _fuse,
    _masked_monotone_pack,
    _pair_round,
    _seg_scan_finish,
    _unfuse,
)
from .msm_scan import masked_prefix_scan_add, masked_tree_sum

tmap = jax.tree_util.tree_map
I32 = jnp.int32
U32 = jnp.uint32


def horner_combine_batch(ops: PointOps, partials, w: int):
    """Per-(window, chunk) sums -> (C,) final points: res = 2^w*res + S_j,
    high window to low, all chunks advancing together (batch-(C,) doubles
    and adds — the per-chunk serial combine of msm_pair.horner_combine,
    vectorized across the batch)."""
    leaves = jax.tree_util.tree_leaves(partials)
    W, C = leaves[0].shape[0], leaves[0].shape[1]

    def combine(j, res):
        res = jax.lax.fori_loop(0, w, lambda _, r: ops.double(r), res)
        Sj = tmap(
            lambda l: jax.lax.dynamic_index_in_dim(l, W - 1 - j, 0, False),
            partials,
        )  # leaves (C, L)
        return ops.add(res, Sj)

    return jax.lax.fori_loop(0, W, combine, ops.identity_jacobian((C,)))


def msm_batch_flat(
    ops: PointOps,
    points,  # affine (x, y), leaves (C, n, L); (0, 0) = identity
    scalars: jnp.ndarray,  # (C, n, Ls+1) plain-int limbs, zero-padded limb
    *,
    window_size: int,
):
    """C independent n-point MSMs -> Jacobian batch (C,).  G1 only."""
    assert ops.spec.ext == 1, "flat batch engine is G1-only (G2 uses scan)"
    F = ops.F
    L = ops.L
    w = window_size
    num_windows = -(-SCALAR_BITS // w)
    half = 1 << (w - 1)
    nbuckets = half + 2
    C, n_c = scalars.shape[0], scalars.shape[1]
    rows0 = C * n_c
    rows = 1 << max(1, (rows0 - 1).bit_length())

    digits = make_digits(
        scalars.reshape(rows0, scalars.shape[2]), w, num_windows, True
    )  # (C*n, W) signed
    x, y = points
    fused = _fuse((x.reshape(rows0, L), y.reshape(rows0, L)))  # (C*n, 2L)
    chunk_id = jnp.repeat(jnp.arange(C, dtype=I32), n_c)
    if rows != rows0:
        pad = rows - rows0
        digits = jnp.concatenate(
            [digits, jnp.zeros((pad, num_windows), digits.dtype)]
        )
        fused = jnp.concatenate([fused, jnp.zeros((pad, 2 * L), fused.dtype)])
        # pad rows carry digit 0 -> they merge into some chunk's slot 0,
        # which the tail slice [1, half] never reads
        chunk_id = jnp.concatenate(
            [chunk_id, jnp.full((pad,), C - 1, dtype=I32)]
        )
    digits_t = jnp.swapaxes(digits, 0, 1)  # (W, rows)
    # distinct live keys <= C*(half+1), so spills per round are bounded by
    # that (+slack), exactly the single-MSM run-count argument at C=1
    spill_cap = C * (half + 1) + 2
    rounds = int(math.log2(rows))
    key_stride = half + 1

    def window_body(dig):
        key = chunk_id * key_stride + jnp.abs(dig).astype(I32)
        sign = dig < 0
        iota = jnp.arange(rows, dtype=I32)
        key_s, perm = jax.lax.sort_key_val(key, iota)
        data = fused[perm]  # THE one wide gather per window
        sgn = sign[perm]
        yneg_g = F.neg(data[:, L:])
        data = jnp.concatenate(
            [data[:, :L], jnp.where(sgn[:, None], yneg_g, data[:, L:])],
            axis=1,
        )

        k = key_s
        d = data
        spills = []
        for r in range(rounds):
            k, d, sk, sd = _pair_round(
                ops,
                k,
                d,
                affine=(r == 0),
                spill_cap=min(k.shape[0] // 2, spill_cap),
            )
            if r == 0:
                sdj = _fuse(ops.to_jacobian(_unfuse(sd, L, 2)))
                sdj = jnp.where((sk != SENT)[:, None], sdj, 0)
                sd = sdj
            spills.append((sk, sd))

        fk = jnp.concatenate([k] + [s[0] for s in spills])
        fd = jnp.concatenate([d] + [s[1] for s in spills], axis=0)
        order = jax.lax.sort_key_val(fk, jnp.arange(fk.shape[0], dtype=I32))[1]
        fk = fk[order]
        fd = fd[order]
        max_run_log = max(1, math.ceil(math.log2(rounds + 2)))
        fk, fd = _seg_scan_finish(ops, fk, fd, max_run_log)

        pk, pd = _masked_monotone_pack(fk, fd, fk != SENT, spill_cap)
        chunk = jnp.where(pk == SENT, 0, pk // key_stride)
        slot = jnp.where(pk == SENT, nbuckets - 1, pk % key_stride)
        flat = chunk * nbuckets + jnp.minimum(slot, nbuckets - 1)
        buckets = (
            jnp.zeros((C * nbuckets, 3 * L), U32).at[flat].set(pd, mode="drop")
        )
        return buckets.reshape(C, nbuckets, 3 * L)

    buckets_w = jax.lax.map(window_body, digits_t)  # (W, C, nbuckets, 3L)

    # lane-parallel triangular tails over ALL (window, chunk) slices at
    # once: sum_j j*b_j via reversed inclusive prefix scan + masked tree
    # sum (the parallel/msm_dist.py tail with base=0), point ops batched
    # (W, C, half) wide — never a nested vmap
    cur = buckets_w[:, :, 1 : half + 1, :]  # values 1..half
    rev = cur[:, :, ::-1, :]
    pre = masked_prefix_scan_add(ops, rev, L, half)
    tri = masked_tree_sum(ops, pre, L, half)  # (W, C, 3L)
    partials = tuple(tri[..., i * L : (i + 1) * L] for i in range(3))
    return horner_combine_batch(ops, partials, w)
