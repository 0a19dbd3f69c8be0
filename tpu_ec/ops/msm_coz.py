"""Co-Z sorted-bucket MSM — the inversion-free scaled-affine engine.

Third-generation TPU bucket accumulation (after the lattice and Jacobian
sorted engines), same role as the GPU's serial per-thread bucket loop
(`ag-build/cl/multiexp.cl:95-119`) but shaped by measured TPU primitive
costs on this chip class:

  gather        ~13 ns/row — flat in row WIDTH (1 col == 72 cols)
  sort+payload  ~6 ns/row
  scatter       ~116 ns/row (avoided everywhere except the final
                 bucket placement at ~2^(w-1) rows)
  Fermat inverse 26 ms of sequential depth per call (per-round batch
                 inversion is therefore a non-starter)

Consequences baked into this engine, versus ops/msm_sorted.py:

1. **Co-Z scaled-affine adds** (ops/pallas/affine.py `coz_apply`): every
   round's points share one implicit scale Z; a pair add costs ~12
   Montgomery muls (9 fused + ~3 for the partial-product tree) instead of
   19-23 for the Jacobian formulas — with ZERO inversions.  The running
   scale z_run multiplies each round's tree root; buckets are read out as
   Jacobian points with z = z_run.
2. **One fused state array**: key and both coordinates travel in a single
   ``uint32 (s, 1 + 2L)`` array so each round issues ONE gather per
   operand side instead of one per pytree leaf (gather cost is per row).
3. **Sort-based compaction**: survivor selection is a stable 2-operand
   sort on the drop flag (6 ns/row) instead of a cumsum+scatter
   (116 ns/row).

Round structure (per window, under one ``lax.map``):
  sort digits once; then run-halving rounds pair adjacent same-key
  entries (parity within run via ``cummax`` of run starts), gather the
  pair operands, co-Z add them, and compact survivors — identical
  run-halving math to msm_sorted (see its correctness notes), different
  movement primitives.  Unrolled shrinking rounds + a constant-size
  ``fori_loop`` tail guarantee arbitrary (adversarial) digit
  distributions terminate, then survivors scatter into the
  ``2^(w-1)+2``-slot bucket array and the triangular + Horner combines
  run in Jacobian (`multiexp.cl:121-131`, `multiexp.rs:221-235` analogs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.point import PointOps
from .msm import SCALAR_BITS, make_digits
from .msm_sorted import _plan_sizes, _triangular_sum

I32 = jnp.int32
U32 = jnp.uint32
SENTINEL = np.iinfo(np.int32).max


def default_window_size_coz(n: int) -> int:
    """Window bits minimizing measured round cost: per window the engine
    pays ~(sort 6 + gathers 13 + kernels 44) ns per carried row, rows
    total ~2n across rounds, plus the B*log2(B) Jacobian triangular tail.
    Larger windows win once n dwarfs the bucket tail."""
    if n <= 1:
        return 2
    best_w, best_cost = 2, float("inf")
    for w in range(2, 17):
        W = -(-SCALAR_BITS // w)
        B = 1 << (w - 1)
        cost = W * (2.0 * n + 6.0 * B * max(1, w - 1))
        if cost < best_cost:
            best_w, best_cost = w, cost
    return best_w


def _run_parity(key):
    """(run_start_flags, even_parity_within_run) for a sorted key array."""
    s = key.shape[0]
    i = jnp.arange(s, dtype=I32)
    f = jnp.concatenate([jnp.ones((1,), bool), key[1:] != key[:-1]])
    start = jax.lax.cummax(jnp.where(f, i, 0))
    return f, ((i - start) & 1) == 0


def _halving_round_coz(spec, F, key, data, zrun, s_out: int, *, interpret):
    """One co-Z run-halving round.

    ``data`` is the fused (s, 2L) coordinate array (X | Y columns) at
    shared scale ``zrun``; returns (key', data', zrun') at size s_out and
    scale zrun * R.  Survivor-count bound: as in msm_sorted._halving_round,
    survivors <= s//2 + half//2 + 2 <= s_out for the caller's sizing.
    """
    from .pallas.affine import coz_add_batch

    s = key.shape[0]
    L2 = data.shape[1]
    L = L2 // 2
    i = jnp.arange(s, dtype=I32)
    _, par_even = _run_parity(key)
    nxt_same = jnp.concatenate([key[1:] == key[:-1], jnp.zeros((1,), bool)])
    paired = par_even & nxt_same

    # survivors-first stable sort of the drop flag: sel = original indices
    # of survivors in order (the scatter-free compaction)
    drop = (~par_even).astype(I32)
    _, sel_full = jax.lax.sort([drop, i], num_keys=1, is_stable=True)
    sel = sel_full[:s_out]
    m = jnp.sum(par_even.astype(I32))  # survivor count (traced)
    valid = jnp.arange(s_out, dtype=I32) < m

    keyn = jnp.where(valid, key[sel], jnp.asarray(SENTINEL, key.dtype))
    A = jnp.where(valid[:, None], data[sel], 0)
    pairedA = paired[sel] & valid
    selB = jnp.minimum(sel + 1, s - 1)
    B = jnp.where(pairedA[:, None], data[selB], 0)

    (x3, y3), r1 = coz_add_batch(
        spec, (A[:, :L], A[:, L:]), (B[:, :L], B[:, L:]), interpret=interpret
    )
    zrun = F.mul(zrun, r1)
    return keyn, jnp.concatenate([x3, y3], axis=1), zrun


def msm_coz(
    ops: PointOps,
    points,  # affine (x, y), leaves (n, L); (0, 0) = identity
    scalars: jnp.ndarray,  # (n, Ls+1) plain-int limbs, zero-padded one limb
    *,
    window_size: int,
    interpret: bool | None = None,
):
    """One full MSM -> Jacobian point batch shape (1,).  G1 (ext == 1) only;
    trace-time body, jit via MultiexpKernel."""
    assert ops.spec.ext == 1, "co-Z engine is G1-only (Fp2 towers use sorted)"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    spec = ops.spec.base
    F = ops.fq
    L = F.L
    w = window_size
    num_windows = -(-SCALAR_BITS // w)
    half = 1 << (w - 1)
    n = scalars.shape[0]
    nbuckets = half + 2  # slot 0 = digit 0, slot half+1 = overflow/sentinel

    digits = make_digits(scalars, w, num_windows, True)  # (n, W) int32
    digits_t = jnp.swapaxes(digits, 0, 1)  # (W, n)
    x, y = points
    yneg = F.neg(y)
    sizes = _plan_sizes(n, half)
    one_np = np.asarray(spec.one_limbs, np.uint32)[None, :]

    def window_body(dig):
        key = jnp.abs(dig).astype(I32)
        sign = dig < 0
        idx = jnp.arange(n, dtype=I32)
        key_s, perm = jax.lax.sort_key_val(key, idx)
        ys = F.select(sign, yneg, y)
        fused = jnp.concatenate([x, ys], axis=1)  # (n, 2L)
        data = fused[perm]  # ONE gather for both coordinates
        k = key_s
        zrun = jnp.asarray(one_np)  # (1, L) running scale, Montgomery 1

        for s_out in sizes:
            k, data, zrun = _halving_round_coz(
                spec, F, k, data, zrun, s_out, interpret=interpret
            )

        s_f = k.shape[0]

        def fix_body(_, state):
            kk, dd, zz = state
            return _halving_round_coz(
                spec, F, kk, dd, zz, s_f, interpret=interpret
            )

        rounds = max(1, math.ceil(math.log2(s_f))) if s_f > 1 else 0
        k, data, zrun = jax.lax.fori_loop(0, rounds, fix_body, (k, data, zrun))

        # every run has length 1: scatter into buckets (small: nbuckets rows)
        slot = jnp.minimum(k, nbuckets - 1)  # sentinels -> overflow slot
        bx = jnp.zeros((nbuckets, L), U32).at[slot].set(data[:, :L], mode="drop")
        by = jnp.zeros((nbuckets, L), U32).at[slot].set(data[:, L:], mode="drop")
        ident = F.is_zero(bx) & F.is_zero(by)
        bz = jnp.where(ident[:, None], jnp.zeros((nbuckets, L), U32),
                       jnp.broadcast_to(zrun, (nbuckets, L)))
        return _triangular_sum(ops, (bx, by, bz), half)

    partials = jax.lax.map(window_body, digits_t)  # leaves (W, ...)

    W = num_windows

    def combine(j, res):
        res = jax.lax.fori_loop(0, w, lambda _, r: ops.double(r), res)
        Sj = jax.tree_util.tree_map(
            lambda l: jax.lax.dynamic_slice_in_dim(l, W - 1 - j, 1, axis=0),
            partials,
        )
        return ops.add(res, Sj)

    return jax.lax.fori_loop(0, W, combine, ops.identity_jacobian((1,)))
