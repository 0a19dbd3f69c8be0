"""Pallas TPU kernels: batch-affine point addition with shared inversion.

The TPU-native answer to the MSM hot loop that the reference runs as one
serial ``POINT_add_mixed`` per element per window on the GPU
(`ag-build/cl/multiexp.cl:95-119`, formulas `ag-build/cl/ec.cl:45-82`).
Jacobian mixed addition costs 19 field muls; the *affine* chord formula

    lambda = (y2 - y1) / (x2 - x1)          (or 3*x1^2 / 2*y1 when P == Q)
    x3 = lambda^2 - x1 - x2
    y3 = lambda*(x1 - x3) - y1

costs 4 muls plus one inversion — and Montgomery's batch-inversion trick
amortizes the inversion to ~3 muls/element across a large batch, for ~7
muls per point add, ~2.7x less multiply work than the Jacobian path.  A GPU
thread cannot use this (its adds are serial, nothing to batch against); a
TPU batch of 2^19 simultaneous bucket adds is exactly the shape the trick
wants.  This is the engine behind ``ops/msm_sorted.msm_sorted(affine=True)``.

Three pieces:

- :func:`affine_denom` — fused kernel producing each pair's inversion
  denominator with every degenerate case (identity operands, P == -Q,
  P == Q) mapped to 1 so the batch is inversion-safe by construction.
- :func:`batch_inverse_planes` — work-efficient product-tree batch
  inversion (~3N Montgomery muls total, every level a contiguous-halves
  `mont_mul_planes` call; one Fermat inversion at the root).
- :func:`affine_apply` — fused kernel consuming the inverted denominators
  and emitting (x3, y3) with branchless select-completeness: identity
  operands pass the other point through, P == -Q yields (0, 0), P == Q
  takes the tangent lambda.

Layout follows ops/pallas/mont.py: coordinates are ``uint32[L, N]`` limb
planes (batch in lanes); (0, 0) encodes the identity (GpuRepr convention,
`ag-types/src/impls.rs:48-58`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...fields.params import FieldSpec
from .mont import PlaneField, mont_mul_planes

U32 = jnp.uint32
DEFAULT_BLOCK = 512


def _flags(x1, y1, x2, y2):
    """(1, N) case predicates shared by the kernels.

    same   — both finite, identical points       -> tangent lambda
    cancel — both finite, x equal, y different   -> P + (-P) = identity
             (x1 == x2 on a short-Weierstrass curve forces y2 = +-y1,
             so y-unequal IS the cancellation case); ALSO covers the
             order-2 tangent y1 == 0 (2P = O), folded in below
    """
    iz1 = jnp.all((x1 == 0) & (y1 == 0), axis=0, keepdims=True)
    iz2 = jnp.all((x2 == 0) & (y2 == 0), axis=0, keepdims=True)
    xeq = jnp.all(x1 == x2, axis=0, keepdims=True)
    yeq = jnp.all(y1 == y2, axis=0, keepdims=True)
    y1z = jnp.all(y1 == 0, axis=0, keepdims=True)
    finite = (~iz1) & (~iz2)
    same = finite & xeq & yeq & ~y1z
    cancel = finite & xeq & (~yeq | y1z)
    return iz1, iz2, same, cancel


@functools.lru_cache(maxsize=None)
def _denom_call(spec: FieldSpec, n: int, block: int, interpret: bool):
    pf = PlaneField(spec)
    L = pf.L

    def kernel(p_ref, one_ref, x1_ref, y1_ref, x2_ref, y2_ref, o_ref):
        p = p_ref[:]
        x1, y1, x2, y2 = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:]
        iz1, iz2, same, cancel = _flags(x1, y1, x2, y2)
        chord = pf.sub(x2, x1, p)  # nonzero whenever used
        tangent = pf.add(y1, y1, p)  # 2*y1; nonzero for same (y=0 has order 2)
        d = jnp.where(same, tangent, chord)
        one = jnp.broadcast_to(one_ref[:], d.shape)
        o_ref[:] = jnp.where(iz1 | iz2 | cancel, one, d)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), U32),
        grid=(n // block,),
        in_specs=[cspec, cspec] + [bspec] * 4,
        out_specs=bspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 32 * L,
            bytes_accessed=5 * n * L * 4,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=None)
def _apply_call(spec: FieldSpec, n: int, block: int, interpret: bool):
    pf = PlaneField(spec)
    L = pf.L

    def kernel(p_ref, np_ref, x1_ref, y1_ref, x2_ref, y2_ref, iv_ref, x3_ref, y3_ref):
        p, npr = p_ref[:], np_ref[:]
        x1, y1, x2, y2, iv = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:], iv_ref[:]
        iz1, iz2, same, cancel = _flags(x1, y1, x2, y2)
        # numerator: chord y2-y1, or tangent 3*x1^2 (a = 0 curves)
        x1sq = pf.mul(x1, x1, p, npr)
        three_x1sq = pf.add(pf.add(x1sq, x1sq, p), x1sq, p)
        num = jnp.where(same, three_x1sq, pf.sub(y2, y1, p))
        lam = pf.mul(num, iv, p, npr)
        x3 = pf.sub(pf.sub(pf.mul(lam, lam, p, npr), x1, p), x2, p)
        y3 = pf.sub(pf.mul(lam, pf.sub(x1, x3, p), p, npr), y1, p)
        zero = jnp.zeros_like(x3)
        for o_ref, r, a, b in ((x3_ref, x3, x1, x2), (y3_ref, y3, y1, y2)):
            r = jnp.where(cancel, zero, r)
            r = jnp.where(iz2, a, r)
            r = jnp.where(iz1, b, r)
            o_ref[:] = r

    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), U32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=(n // block,),
        in_specs=[cspec, cspec] + [bspec] * 5,
        out_specs=(bspec, bspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 4 * (3 * L * L * 2 + 16 * L),
            bytes_accessed=7 * n * L * 4,
            transcendentals=0,
        ),
    )


def _pad_planes(a, npad: int):
    return a if a.shape[1] == npad else jnp.pad(a, ((0, 0), (0, npad - a.shape[1])))


def _plane_consts(spec: FieldSpec, which: str):
    arrs = {
        "p": spec.p_limbs,
        "npr": spec.nprime_limbs,
        "one": spec.one_limbs,
    }
    return tuple(
        jnp.asarray(np.asarray(arrs[k], np.uint32)[:, None]) for k in which.split()
    )


def affine_denom(spec, x1, y1, x2, y2, *, block: int = DEFAULT_BLOCK, interpret=None):
    """Inversion denominators for a batch of affine pair adds; (L, N) planes
    in, (L, N) out.  Degenerate lanes (either operand identity, or P == -Q)
    get 1, so the output batch contains no zeros."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, n = x1.shape
    npad = -(-n // block) * block
    ins = [_pad_planes(c, npad) for c in (x1, y1, x2, y2)]
    p, one = _plane_consts(spec, "p one")
    out = _denom_call(spec, npad, block, interpret)(p, one, *ins)
    return out[:, :n]


def affine_apply(spec, x1, y1, x2, y2, iv, *, block: int = DEFAULT_BLOCK, interpret=None):
    """Complete affine add given precomputed inverse denominators ``iv``:
    (x3, y3) planes with identity/cancel/double cases selected branchlessly."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, n = x1.shape
    npad = -(-n // block) * block
    ins = [_pad_planes(c, npad) for c in (x1, y1, x2, y2, iv)]
    consts = _plane_consts(spec, "p npr")
    x3, y3 = _apply_call(spec, npad, block, interpret)(*consts, *ins)
    return x3[:, :n], y3[:, :n]


def batch_inverse_planes(spec: FieldSpec, d: jax.Array, *, interpret=None) -> jax.Array:
    """Montgomery batch inversion of an (L, N) plane batch, work-efficient.

    Contiguous-halves product tree: up-sweep multiplies the first half of
    each level with the second (N-1 muls total), the (L, 1) root is inverted
    once by Fermat, and the down-sweep recovers both children's inverses
    with one concatenated mul per level (inv_left = inv_parent * right_prod,
    inv_right = inv_parent * left_prod) — ~2N more muls.  Total ~3N
    Montgomery muls, every one a fused `mont_mul_planes` pass over
    contiguous lanes (no strided slicing, no O(N log N) associative-scan
    blowup).  Inputs must be nonzero (affine_denom guarantees this).
    """
    from ...fields.fp import field_ops
    from .mont import from_planes, to_planes

    L, n = d.shape
    npad = 1 << max(0, (n - 1).bit_length())
    if npad != n:
        onecol = jnp.broadcast_to(
            jnp.asarray(np.asarray(spec.one_limbs, np.uint32)[:, None]), (L, npad - n)
        )
        d = jnp.concatenate([d, onecol], axis=1)

    levels = []
    cur = d
    while cur.shape[1] > 1:
        m = cur.shape[1] // 2
        levels.append(cur)
        cur = mont_mul_planes(spec, cur[:, :m], cur[:, m:], interpret=interpret)

    f = field_ops(spec)
    root_inv = to_planes(f.inv_(from_planes(cur)))  # (L, 1), Fermat

    inv = root_inv
    for lev in reversed(levels):
        m = lev.shape[1] // 2
        swapped = jnp.concatenate([lev[:, m:], lev[:, :m]], axis=1)
        inv2 = jnp.concatenate([inv, inv], axis=1)
        inv = mont_mul_planes(spec, inv2, swapped, interpret=interpret)
    return inv[:, :n]


@functools.lru_cache(maxsize=None)
def _coz_apply_call(spec: FieldSpec, n: int, block: int, interpret: bool):
    pf = PlaneField(spec)
    L = pf.L

    def kernel(p_ref, np_ref, r2_ref, r3_ref,
               x1_ref, y1_ref, x2_ref, y2_ref, pp_ref, x3_ref, y3_ref):
        p, npr = p_ref[:], np_ref[:]
        x1, y1, x2, y2, pp = x1_ref[:], y1_ref[:], x2_ref[:], y2_ref[:], pp_ref[:]
        r2 = jnp.broadcast_to(r2_ref[:], x1.shape)
        r3 = jnp.broadcast_to(r3_ref[:], x1.shape)
        iz1, iz2, same, cancel = _flags(x1, y1, x2, y2)
        x1sq = pf.mul(x1, x1, p, npr)
        three_x1sq = pf.add(pf.add(x1sq, x1sq, p), x1sq, p)
        num = jnp.where(same, three_x1sq, pf.sub(y2, y1, p))
        t = pf.mul(num, pp, p, npr)  # num * (R/d): the scaled slope * R
        x1r2 = pf.mul(x1, r2, p, npr)
        x2r2 = pf.mul(x2, r2, p, npr)
        y1r3 = pf.mul(y1, r3, p, npr)
        y2r3 = pf.mul(y2, r3, p, npr)
        x3 = pf.sub(pf.sub(pf.mul(t, t, p, npr), x1r2, p), x2r2, p)
        y3 = pf.sub(pf.mul(t, pf.sub(x1r2, x3, p), p, npr), y1r3, p)
        zero = jnp.zeros_like(x3)
        outx, outy = x3, y3
        outx = jnp.where(cancel, zero, outx)
        outy = jnp.where(cancel, zero, outy)
        outx = jnp.where(iz2, x1r2, outx)
        outy = jnp.where(iz2, y1r3, outy)
        outx = jnp.where(iz1, x2r2, outx)
        outy = jnp.where(iz1, y2r3, outy)
        # identity operands must STAY (0, 0), not be rescaled junk
        both = iz1 & iz2
        x3_ref[:] = jnp.where(both, zero, outx)
        y3_ref[:] = jnp.where(both, zero, outy)

    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), U32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=(n // block,),
        in_specs=[cspec] * 4 + [bspec] * 5,
        out_specs=(bspec, bspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 9 * (3 * L * L * 2 + 16 * L),
            bytes_accessed=7 * n * L * 4,
            transcendentals=0,
        ),
    )


def coz_apply(spec, x1, y1, x2, y2, pp, r2, r3, *, block: int = DEFAULT_BLOCK,
              interpret=None):
    """Scaled-affine ("co-Z") complete pair add, no inversion anywhere.

    All 2N input points share one implicit scale Z (actual coordinates are
    X/Z^2, Y/Z^3; Z itself never appears).  ``pp`` holds each pair's
    partial product P_i = R / d_i from :func:`partial_products_planes` over
    the denominators d = (same ? 2*Y1 : X2 - X1); ``r2``/``r3`` are the
    round constants R^2, R^3 as (L, 1) planes.  Outputs sit at the common
    scale Z' = Z * R:

        t  = num * P_i                  (num = same ? 3*X1^2 : Y2 - Y1)
        X3 = t^2 - X1*R^2 - X2*R^2
        Y3 = t * (X1*R^2 - X3) - Y1*R^3

    Identity operands pass the other point through (rescaled by R^2/R^3);
    P + (-P) and order-2 doublings yield (0, 0).  9 Montgomery muls per
    pair, fused in VMEM; with the ~3 muls/elt of the product tree this is
    ~12 muls per point-add vs 19/23 for the Jacobian formulas — and, unlike
    plain batch-affine, needs no 26-ms-deep Fermat inversion per round.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, n = x1.shape
    npad = -(-n // block) * block
    ins = [_pad_planes(c, npad) for c in (x1, y1, x2, y2, pp)]
    p, npr = _plane_consts(spec, "p npr")
    x3, y3 = _coz_apply_call(spec, npad, block, interpret)(p, npr, r2, r3, *ins)
    return x3[:, :n], y3[:, :n]


def partial_products_planes(spec: FieldSpec, d: jax.Array, *, interpret=None):
    """(P, R): P[:, i] = prod_{j != i} d[:, j] and the total R = prod_j d[:, j],
    via the same contiguous-halves tree as :func:`batch_inverse_planes` but
    with the down-sweep seeded by 1 instead of an inverted root — the
    inversion-free remainder of Montgomery's trick (~3N muls)."""
    L, n = d.shape
    npad = 1 << max(0, (n - 1).bit_length())
    if npad != n:
        onecol = jnp.broadcast_to(
            jnp.asarray(np.asarray(spec.one_limbs, np.uint32)[:, None]), (L, npad - n)
        )
        d = jnp.concatenate([d, onecol], axis=1)

    levels = []
    cur = d
    while cur.shape[1] > 1:
        m = cur.shape[1] // 2
        levels.append(cur)
        cur = mont_mul_planes(spec, cur[:, :m], cur[:, m:], interpret=interpret)

    root = cur  # (L, 1)
    part = jnp.asarray(np.asarray(spec.one_limbs, np.uint32)[:, None])
    for lev in reversed(levels):
        m = lev.shape[1] // 2
        swapped = jnp.concatenate([lev[:, m:], lev[:, :m]], axis=1)
        part2 = jnp.concatenate([part, part], axis=1)
        part = mont_mul_planes(spec, part2, swapped, interpret=interpret)
    return part[:, :n], root


def coz_add_batch(spec: FieldSpec, A, B, *, interpret=None):
    """Complete batched co-Z pair add at (n, L) layout; A, B share one
    implicit scale Z.  Returns ((x3, y3), R) with outputs at scale Z * R —
    callers fold R into their running scale (z' = z * R).
    """
    from ...fields.fp import field_ops
    from .mont import from_planes, to_planes

    x1, y1 = (to_planes(c) for c in A)
    x2, y2 = (to_planes(c) for c in B)
    d = affine_denom(spec, x1, y1, x2, y2, interpret=interpret)
    pp, root = partial_products_planes(spec, d, interpret=interpret)
    f = field_ops(spec)
    r1 = from_planes(root)  # (1, L)
    r2 = to_planes(f.sqr(r1))
    r3 = to_planes(f.mul(f.sqr(r1), r1))
    x3, y3 = coz_apply(spec, x1, y1, x2, y2, pp, r2, r3, interpret=interpret)
    return (from_planes(x3), from_planes(y3)), r1


def affine_add_batch(spec: FieldSpec, A, B, *, interpret=None):
    """Complete batched affine point add A + B -> affine, (n, L) coordinate
    layout at the boundary (transposed to planes around the kernels).

    A and B are (x, y) tuples of (n, L) arrays, (0, 0) = identity.  One
    denominator kernel pass + one batch inversion (~3 muls/elt) + one apply
    kernel pass (4 muls/elt): ~7 muls per add vs 19 for Jacobian mixed
    addition — the reason MSM bucket accumulation runs affine.
    """
    from .mont import from_planes, to_planes

    x1, y1 = (to_planes(c) for c in A)
    x2, y2 = (to_planes(c) for c in B)
    d = affine_denom(spec, x1, y1, x2, y2, interpret=interpret)
    iv = batch_inverse_planes(spec, d, interpret=interpret)
    x3, y3 = affine_apply(spec, x1, y1, x2, y2, iv, interpret=interpret)
    return from_planes(x3), from_planes(y3)
