"""Compile-light MSM engine: masked segmented-scan bucket accumulation.

Fifth engine (after lattice / sorted / co-Z / pair), built for a different
axis than the others: **program size**.  XLA-CPU compiles every inlined
point-op instance in ~6 s (see parallel/msm_dist.py header), so the
movement-minimal engines — whose unrolled halving rounds inline dozens of
instances — take minutes to compile on the CPU backend, which is what made
the r3 test suite and virtual-mesh dryrun time out.  This engine keeps
every repeated point op inside a `lax.fori_loop` body (~5 field-heavy
instances total) at the cost of log2(n) x the optimal point-add count:

  1. per window (all windows batched — no lax.map): sort (|digit|, idx),
     gather the points into bucket order once, then a masked Hillis-Steele
     *segmented* inclusive scan along the sorted axis (log2(n) rounds of
     roll+select+add — ONE add instance); each run's last row holds its
     bucket sum and scatters into the (half+2)-slot bucket array.
  2. triangular tail sum_k k*b_k: inclusive prefix scan of the reversed
     bucket row (one loop instance) summed by a masked-roll halving tree
     (one more) — sum of reversed-prefix entries = sum_k k*b_k.
  3. Horner window combine (fori_loop, as the other engines).

Used as the default on the CPU backend (tests, virtual-mesh runs) and as
the building block of the distributed driver; the TPU single-chip default
remains the pair engine (ops/msm_pair.py), which does ~log2(n)x fewer
adds.  Reference counterpart: the same Pippenger bucket accumulation as
`ag-build/cl/multiexp.cl:95-131`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..curves.point import PointOps
from .msm import SCALAR_BITS, make_digits

tmap = jax.tree_util.tree_map
I32 = jnp.int32
U32 = jnp.uint32


def _jac_unfuse(ops: PointOps, D):
    """Fused (..., 3*ext*L) block -> Jacobian coordinate pytree (G1 coords
    are single limb arrays, G2 coords are (c0, c1) Fp2 pairs)."""
    L = ops.L
    if ops.spec.ext == 1:
        return tuple(D[..., i * L : (i + 1) * L] for i in range(3))
    return tuple(
        (
            D[..., (2 * i) * L : (2 * i + 1) * L],
            D[..., (2 * i + 1) * L : (2 * i + 2) * L],
        )
        for i in range(3)
    )


def _tree_fuse(tree):
    """Coordinate pytree -> one fused block (leaf order = tree_leaves)."""
    return jnp.concatenate(jax.tree_util.tree_leaves(tree), axis=-1)


def _fused_add(ops: PointOps, a, b, L: int):
    """Point add on fused (..., 3*ext*L) coordinate blocks."""
    return _tree_fuse(ops.add(_jac_unfuse(ops, a), _jac_unfuse(ops, b)))


def scalar_mul_small(ops: PointOps, P_, k, nbits: int):
    """k * P for a traced non-negative scalar k < 2^nbits (double-and-add,
    MSB first) over a batched Jacobian pytree."""

    def body(i, acc):
        bit = (k >> (nbits - 1 - i)) & 1
        acc = ops.double(acc)
        return ops.select(bit == 1, ops.add(acc, P_), acc)

    batch = jax.tree_util.tree_leaves(P_[0])[0].shape[:-1]
    return jax.lax.fori_loop(0, nbits, body, ops.identity_jacobian(batch))


def scan_buckets(ops: PointOps, points, digits_t: jnp.ndarray, *, half: int):
    """(W, n) signed digits + affine points -> fused (W, half+2, 3*ext*L)
    Jacobian buckets (slot 0 = digit-0 junk, slot half+1 = scatter junk;
    both excluded downstream)."""
    L = ops.L
    F = ops.F
    W, n = digits_t.shape
    x, y = points  # G1: (n, L) arrays; G2: (c0, c1) pairs of them

    key = jnp.abs(digits_t).astype(I32)
    sign = digits_t < 0
    iota_n = jnp.arange(n, dtype=I32)
    key_s, perm = jax.lax.sort_key_val(key, jnp.broadcast_to(iota_n, (W, n)))
    xg = tmap(lambda l: l[perm], x)  # (W, n, L) leaves — the one wide gather
    yg = tmap(lambda l: l[perm], y)
    sg = jnp.take_along_axis(sign, perm, axis=1)
    yneg = F.neg(yg)
    yg = tmap(lambda a, b: jnp.where(sg[..., None], a, b), yneg, yg)
    jac = ops.to_jacobian((xg, yg))  # z=0 for (0,0) identities
    data = _tree_fuse(jac)  # (W, n, 3*ext*L)

    rounds = max(0, (n - 1).bit_length())

    def scan_round(r, st):
        k, d = st
        h = jnp.int32(1) << r
        k_sh = jnp.roll(k, h, axis=1)
        d_sh = jnp.roll(d, h, axis=1)
        m = (k == k_sh) & (iota_n >= h)
        added = _fused_add(ops, d, d_sh, L)
        return k, jnp.where(m[..., None], added, d)

    _, data = jax.lax.fori_loop(0, rounds, scan_round, (key_s, data))

    nxt = jnp.concatenate([key_s[:, 1:], jnp.full((W, 1), -1, key_s.dtype)], axis=1)
    is_last = key_s != nxt
    slot = jnp.where(is_last, jnp.minimum(key_s, half + 1), half + 1)
    out = jnp.zeros((W, half + 2, 3 * ops.spec.ext * L), U32)
    wi = jnp.arange(W, dtype=I32)[:, None]
    return out.at[wi, slot].set(data, mode="drop")


def masked_prefix_scan_add(ops: PointOps, x, L: int, width: int):
    """Inclusive prefix point-scan along axis -2 of a fused (..., width, 3L)
    block: one add instance in a fori_loop."""
    iota = jnp.arange(width, dtype=I32)
    rounds = max(0, (width - 1).bit_length())

    def body(r, d):
        h = jnp.int32(1) << r
        d_sh = jnp.roll(d, h, axis=-2)
        m = iota >= h
        return jnp.where(m[:, None], _fused_add(ops, d, d_sh, L), d)

    return jax.lax.fori_loop(0, rounds, body, x)


def masked_tree_sum(ops: PointOps, x, L: int, width: int):
    """Sum along axis -2 of a fused (..., width, 3L) block (width a power
    of two) via a masked halving tree at constant shape; result row 0."""
    iota = jnp.arange(width, dtype=I32)
    rounds = max(0, width.bit_length() - 1)

    def body(r, d):
        h = jnp.int32(width) >> (r + 1)
        d_sh = jnp.roll(d, -h, axis=-2)
        m = iota < h
        return jnp.where(m[:, None], _fused_add(ops, d, d_sh, L), d)

    return jax.lax.fori_loop(0, rounds, body, x)[..., 0, :]


def msm_scan(
    ops: PointOps,
    points,  # affine (x, y), leaves (n, L); (0, 0) = identity
    scalars: jnp.ndarray,  # (n, Ls+1) plain-int limbs, zero-padded one limb
    *,
    window_size: int,
):
    """One full MSM -> Jacobian point batch shape (1,).  Trace-time body;
    jit via MultiexpKernel.  Generic over the base field (G1 and G2: the
    fused blocks carry 3*ext*L columns)."""
    from .msm_pair import horner_combine

    L = ops.L
    w = window_size
    num_windows = -(-SCALAR_BITS // w)
    half = 1 << (w - 1)
    digits = make_digits(scalars, w, num_windows, True)  # (n, W)
    fused = scan_buckets(
        ops, points, jnp.swapaxes(digits, 0, 1), half=half
    )
    cur = fused[:, 1 : half + 1, :]  # (W, half, 3*ext*L): values 1..half
    rev = cur[:, ::-1, :]
    pre = masked_prefix_scan_add(ops, rev, L, half)
    tri_f = masked_tree_sum(ops, pre, L, half)  # (W, 3*ext*L)
    partials = _jac_unfuse(ops, tri_f)
    return horner_combine(ops, partials, w)


def default_window_size_scan(n: int) -> int:
    """The scan engine pays ~log2(n) masked adds per point per window plus
    a ~2*half*log2(half) tail — smaller windows than the pair engine."""
    import math

    if n <= 1:
        return 2
    best_w, best_cost = 2, float("inf")
    logn = max(1, (n - 1).bit_length())
    for w in range(2, 17):
        W = -(-SCALAR_BITS // w)
        B = 1 << (w - 1)
        cost = W * (n * logn + 2.0 * B * max(1, B.bit_length()))
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w
