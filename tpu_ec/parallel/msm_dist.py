"""Multi-chip MSM: points sharded per chip, bucket-space on-fabric combine.

The reference splits one MSM's input across GPUs and sums the per-GPU
partial results **on the host** (`ec-gpu-proxy/src/multiexp.rs:324-400`,
final sum at :392-399).  Round-2's port of that shape — every shard runs a
FULL local MSM (buckets + triangular tail) and partials are tree-added —
missed the >=80% scaling target in its own model (SCALING.json r2: 0.766 at
d=16) because the per-window bucket tail is paid d times.

This version restructures the combine (VERDICT r2 item 5):

1. each shard accumulates its (W, B, 3L) Jacobian *bucket array* only
   (ops/msm_pair.msm_pair_buckets — the pair engine's accumulation stage,
   run at the GLOBAL-n window size so the tail shrinks with d);
2. buckets combine across the mesh with a recursive-halving exchange:
   log2(d) rounds of `ppermute` each sending half the current bucket
   slice to the partner (s XOR 2^r) and point-adding — a reduce-scatter
   with group addition.  Total bytes per chip ~ W*B*288, milliseconds on
   ICI; afterwards shard s owns the fully-combined bucket slice
   [bitrev(s)*B/d, (bitrev(s)+1)*B/d);
3. each shard pays the triangular tail only on its OWN slice:
   sum_{k in slice} k*b_k = base * sum b_k + sum_j j*b_j  (base = slice
   offset, applied with a log-depth double-and-add);
4. per-(shard, window) partials all_gather (tiny) + tree add + Horner.

Per-chip cost = W*n/d accumulation + (W*B/d)*tail + O(W*B) comm bytes —
every term scales with d, which is what pushes the model to >=0.8 at d=16
(see scripts/scaling_harness.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.params import CurveSpec
from ..curves.point import point_ops
from ..ops.msm_pair import (
    _triangular_sum,
    _unfuse,
    default_window_size_pair,
    horner_combine,
    msm_pair_buckets,
)

tmap = jax.tree_util.tree_map


def _bitrev(x, bits: int):
    r = x * 0
    for i in range(bits):
        r = (r << 1) | ((x >> i) & 1)
    return r


def _scalar_mul_small(ops, P_, k, nbits: int):
    """k * P for a traced non-negative scalar k < 2^nbits (log-depth
    double-and-add, MSB first) over a batched Jacobian pytree."""
    def body(i, acc):
        bit = (k >> (nbits - 1 - i)) & 1
        acc = ops.double(acc)
        return ops.select(bit == 1, ops.add(acc, P_), acc)

    batch = jax.tree_util.tree_leaves(P_[0])[0].shape[:-1]
    return jax.lax.fori_loop(0, nbits, body, ops.identity_jacobian(batch))


class DistMultiexpKernel:
    """Sharded MSM driver (MultiexpKernel::multiexp multi-GPU parity)."""

    def __init__(self, spec: CurveSpec, mesh: Mesh):
        self.spec = spec
        self.ops = point_ops(spec)
        self.mesh = mesh
        self._jitted = {}

    def _fn(self, n: int, w: int):
        key = (n, w)
        if key not in self._jitted:
            ops = self.ops
            L = ops.L
            d = self.mesh.devices.size
            ax = self.mesh.axis_names[0]
            half = 1 << (w - 1)
            logd = max(0, d.bit_length() - 1)
            assert d == 1 << logd, "mesh size must be a power of two"
            assert half >= d, "window too small for mesh: need 2^(w-1) >= devices"

            def body(points, scalars):
                # local shard: bucket accumulation only, GLOBAL window size
                fused = msm_pair_buckets(ops, points, scalars, window_size=w)
                # strip dummy slot 0 / overflow slot: combine k = 1..half
                cur = fused[:, 1 : half + 1, :]  # (W, half, 3L)
                s_idx = jax.lax.axis_index(ax)
                # recursive-halving reduce-scatter with point addition
                for r in range(logd):
                    m = cur.shape[1] // 2
                    lo, hi = cur[:, :m, :], cur[:, m:, :]
                    bit = (s_idx >> r) & 1
                    send = jnp.where(bit == 0, hi, lo)
                    perm = [(s, s ^ (1 << r)) for s in range(d)]
                    recv = jax.lax.ppermute(send, ax, perm)
                    keep = jnp.where(bit == 0, lo, hi)
                    added = _fuse3(
                        ops.add(_unfuse_last(keep, L), _unfuse_last(recv, L))
                    )
                    cur = added
                own = cur.shape[1]  # half / d
                base = _bitrev(s_idx, logd) * own  # owned slice starts at base+1
                # sum over slice = base * sum(b) + sum_{j=1..own} j*b_j
                tris, tots = jax.lax.map(
                    lambda b: _slice_tail(ops, b, L, own), cur
                )  # leaves (W, 1, L)
                tris = tmap(lambda l: l[:, 0], tris)  # (W, L)
                tots = tmap(lambda l: l[:, 0], tots)
                part = ops.add(
                    tris, _scalar_mul_small(ops, tots, base, max(1, w - 1))
                )
                # gather (d, W) partials, tree-add over shards
                gathered = tmap(
                    lambda l: jax.lax.all_gather(l, ax, axis=0, tiled=False),
                    part,
                )  # (d, W, ...)
                g = d
                acc = gathered
                while g > 1:
                    lo_ = tmap(lambda l: l[: g // 2], acc)
                    hi_ = tmap(lambda l: l[g // 2 : g], acc)
                    acc = ops.add(lo_, hi_)
                    g //= 2
                partials = tmap(lambda l: l[0], acc)  # (W, ...)
                return horner_combine(ops, partials, w)

            @jax.jit
            def run(points, scalars):
                return shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(ax), P(ax)),
                    out_specs=P(),
                    check_vma=False,
                )(points, scalars)

            self._jitted[key] = run
        return self._jitted[key]

    def multiexp(
        self,
        bases,
        scalars: jnp.ndarray,
        *,
        window_size: int | None = None,
    ):
        """sum_i scalars[i] * bases[i] across the whole mesh.

        ``bases`` is an affine pytree batch, ``scalars`` a (n, Ls) plain-int
        limb batch.  n is padded with (identity, 0) pairs to a multiple of
        the mesh size; device k owns the contiguous slab [k*n/d, (k+1)*n/d)."""
        d = self.mesh.devices.size
        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        pad = (-n) % d
        if pad:
            bases = tmap(
                lambda l: jnp.concatenate(
                    [l, jnp.zeros((pad,) + l.shape[1:], l.dtype)], axis=0
                ),
                bases,
            )
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((pad,) + scalars.shape[1:], scalars.dtype)],
                axis=0,
            )
            n += pad
        # one zero limb for cross-limb window extraction (msm.make_digits)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)],
            axis=-1,
        )
        # GLOBAL-n window size: the bucket tail is shared across the mesh
        w = window_size or default_window_size_pair(n)
        while (1 << (w - 1)) < d:  # need at least one bucket per shard
            w += 1
        return self._fn(n, w)(bases, scalars)


def _fuse3(P_):
    return jnp.concatenate(P_, axis=-1)


def _unfuse_last(D, L):
    """Split a fused (..., 3L) coordinate matrix on its LAST axis (the
    msm_pair._unfuse helper slices axis 1 and only fits 2-D data)."""
    return tuple(D[..., i * L : (i + 1) * L] for i in range(3))


def _pad_slot0(bu, L):
    """Prefix a dummy slot-0 and suffix an overflow slot so the slice fits
    the (half+2)-slot convention _triangular_sum expects."""
    return tuple(
        jnp.concatenate(
            [jnp.zeros_like(c[..., :1, :]), c, jnp.zeros_like(c[..., :1, :])],
            axis=-2,
        )
        for c in bu
    )


def _tree_sum(ops, bu, m):
    """Plain (unweighted) tree sum of m bucket points along axis 0."""
    acc = bu
    g = m
    while g > 1:
        lo = tmap(lambda l: l[: g // 2], acc)
        hi = tmap(lambda l: l[g // 2 : g], acc)
        acc = ops.add(lo, hi)
        g //= 2
    return tmap(lambda l: l[:1], acc)


def _slice_tail(ops, b, L, own):
    """(own, 3L) fused bucket slice -> (weighted-within-slice partial,
    unweighted slice sum), both batch shape (1,)."""
    bu = _unfuse(b, L, 3)
    tri = _triangular_sum(ops, _pad_slot0(bu, L), own)
    tri = tmap(lambda l: l[None], tri)  # (1, L)
    tot = _tree_sum(ops, bu, own)
    return tri, tot
