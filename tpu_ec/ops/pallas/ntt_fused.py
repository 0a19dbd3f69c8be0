"""Fused multi-stage Pallas NTT: recursive four-step with VMEM-resident leaves.

The reference avoids one-launch-per-radix-2-stage by doing radix-2^8 rounds
with shared-memory butterflies (`ag-build/cl/fft.cl:40-67`, max_deg = 8 at
`ec-gpu-proxy/src/fft.rs:15-16`).  This is the TPU edition: the transform is
factorized recursively (Bailey/four-step),

    x (n = n1*n2, viewed (n2, n1), row j2, col j1; j = j1 + n1*j2)
      1. NTT_n2 along axis 0 (root w^n1 — the canonical size-n2 root)
      2. * twiddle  T[k2, j1] = w^(k2*j1)
      3. transpose -> (n1, n2)
      4. NTT_n1 along axis 0 (recurse; root w^n2)
      5. flatten row-major: X[k2 + n2*k1] = Z[k1, k2]  — natural order out

where each LEAF transform (m <= 2^8) runs as ONE Pallas kernel: all log2(m)
Pease butterfly stages execute on a VMEM-resident (L, m, TB) block — one HBM
read + one write per element per leaf pass instead of one per radix-2 stage.
Stage twiddles are tiny (log2(m), L, m/2) constants resident in VMEM.

The inter-level twiddle multiply and the per-leaf bit-reversal are XLA data
movement (gathers/transposes, HBM-bandwidth-bound); the 64 MB level-1
twiddle table at 2^20 is built once per domain (numpy, trace-immune) and
cached on the FusedDomain.

Work: identical mul count to the staged path (n/2 log n butterfly muls +
n per recursion level for inter-twiddles); the win is eliminating ~2/3 of
the HBM round-trips and all per-stage XLA interleave passes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...fields.params import FieldSpec, int_to_limbs
from ..ntt import bit_reverse_permutation, get_domain, twiddle_table_np
from .mont import PlaneField

U32 = jnp.uint32


def LEAF_LOG() -> int:
    """Radix log2 per leaf launch (the reference uses 2^8, fft.rs:15).
    Larger leaves amortize HBM round trips further but the unrolled stage
    graph grows linearly and the TPU compile helper OOMs near 2^7; 2^5 keeps
    the kernel ~5 fused Montgomery muls while still cutting stage round trips
    5x.  Config field ``ntt_leaf_log`` (TPU_EC_NTT_LEAF_LOG env)."""
    from ...config import get_config

    return get_config().ntt_leaf_log


# ---------------------------------------------------------------------------
# Leaf kernel: full NTT of length m = 2^R on axis 1 of (L, m, TB) blocks
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _leaf_call(spec: FieldSpec, log_m: int, btot: int, tb: int, interpret: bool):
    pf = PlaneField(spec)
    L = pf.L
    m = 1 << log_m

    def kernel(p_ref, np_ref, tw_ref, x_ref, o_ref):
        # DIF (decimation-in-frequency) stages: block-contiguous halves only —
        # every data-movement op is an axis-1 slice or concat of contiguous
        # chunks.  (A Pease constant-geometry variant needs a fine-grained
        # stack/reshape interleave every stage, whose relayout into the
        # Montgomery-mul graph sends the Mosaic compiler into a tailspin.)
        # Output is bit-reversed along the m axis; callers un-reverse in XLA.
        p = p_ref[:][:, :, None]  # (L, 1, 1)
        npr = np_ref[:][:, :, None]
        v = x_ref[:]  # (L, m, TB)
        for s in range(log_m):
            nb = 1 << s
            q2 = m >> s
            q = q2 // 2
            a = jnp.concatenate(
                [v[:, blk * q2 : blk * q2 + q, :] for blk in range(nb)], axis=1
            ) if nb > 1 else v[:, :q, :]
            b = jnp.concatenate(
                [v[:, blk * q2 + q : (blk + 1) * q2, :] for blk in range(nb)],
                axis=1,
            ) if nb > 1 else v[:, q:, :]
            tw = tw_ref[s][:, :, None]  # (L, m/2, 1) broadcasts over lanes
            u = pf.add(a, b, p)
            w = pf.mul(pf.sub(a, b, p), jnp.broadcast_to(tw, a.shape), p, npr)
            v = jnp.concatenate(
                [
                    h[:, blk * q : (blk + 1) * q, :]
                    for blk in range(nb)
                    for h in (u, w)
                ],
                axis=1,
            )
        o_ref[:] = v

    bspec = pl.BlockSpec((L, m, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(
        (log_m, L, m // 2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, m, btot), U32),
        grid=(btot // tb,),
        in_specs=[cspec, cspec, tspec, bspec],
        out_specs=bspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(btot) * m // 2 * log_m * (3 * L * L * 2 + 40 * L),
            bytes_accessed=2 * btot * m * L * 4,
            transcendentals=0,
        ),
    )


@functools.lru_cache(maxsize=None)
def _leaf_call_list(spec: FieldSpec, log_m: int, btot: int, tb: int, interpret: bool):
    """Limb-list formulation of the DIF leaf (see ops/pallas/mont.ListField):
    every stage op runs on full (m-ish, TB) tiles per limb, partial products
    accumulate directly, and the field constants are inline literals."""
    from .mont import list_field

    lf = list_field(spec)
    L = lf.L
    m = 1 << log_m

    def kernel(tw_ref, x_ref, o_ref):
        # per stage, view each limb as (nb, q2, TB): halves are contiguous
        # middle-axis slices and the interleaved writeback is a stack +
        # reshape — no concat chains (Mosaic compiles those poorly).
        v = [x_ref[i] for i in range(L)]  # each (m, TB)
        for s in range(log_m):
            nb = 1 << s
            q2 = m >> s
            q = q2 // 2
            v4 = [vi.reshape(nb, q2, tb) for vi in v]
            a = [vi[:, :q, :] for vi in v4]
            b = [vi[:, q:, :] for vi in v4]
            # stage twiddle at in-block pair j is W_m^(j << s): the first q
            # entries of the stage-s table row (block-independent)
            tw = [tw_ref[s, i][:q][None, :, None] for i in range(L)]
            u = lf.add(a, b)
            w = lf.mul(lf.sub(a, b), tw)
            v = [
                jnp.stack([ui, wi], axis=1).reshape(m, tb)
                for ui, wi in zip(u, w)
            ]
        for i in range(L):
            o_ref[i] = v[i]

    bspec = pl.BlockSpec((L, m, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(
        (log_m, L, m // 2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, m, btot), U32),
        grid=(btot // tb,),
        in_specs=[tspec, bspec],
        out_specs=bspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(btot) * m // 2 * log_m * (3 * L * L * 2 + 40 * L),
            bytes_accessed=2 * btot * m * L * 4,
            transcendentals=0,
        ),
    )


class FusedDomain:
    """Per-(field, log_n, inverse) constant tables for the fused NTT."""

    def __init__(self, spec: FieldSpec, log_n: int, inverse: bool, leaf: int | None = None):
        self.spec = spec
        self.log_n = log_n
        self.inverse = inverse
        self.f = PlaneField(spec)
        base = get_domain(spec, log_n, inverse)
        self.omega = base.omega  # canonical size-n root (inverse-adjusted)
        self.n_inv = base.n_inv if inverse else None
        self.leaf = leaf or LEAF_LOG()  # snapshot: plan/traces stay consistent
        self.plan = self._plan(log_n, self.leaf)
        self._leaf_tw: dict[int, np.ndarray] = {}
        self._leaf_rev: dict[int, np.ndarray] = {}
        self._inter_tw: dict[tuple[int, int], np.ndarray] = {}
        self._build_tables()

    @staticmethod
    def _plan(log_n: int, leaf: int) -> list[int]:
        """Factor log_n into leaf-sized chunks, first factor = leaf."""
        out = []
        rest = log_n
        while rest > leaf:
            out.append(leaf)
            rest -= leaf
        out.append(rest)
        return out  # e.g. leaf=8: 20 -> [8, 8, 4]

    def _leaf_tables(self, log_m: int):
        """(log_m, L, m/2) DIF stage twiddles + bitrev perm for size 2^log_m
        with the canonical size-m root derived from self.omega.

        DIF stage s splits the array into 2^s blocks of m/2^s; the butterfly
        of within-block pair j multiplies by W_m^(j * 2^s), so the stage
        vector at concatenated position p = blk*q + j (q = m/2^(s+1)) is
        W_m^((p mod q) * 2^s) — block-independent."""
        spec = self.spec
        m = 1 << log_m
        # canonical size-m root = omega^(n/m)
        w_m = pow(self.omega, 1 << (self.log_n - log_m), spec.modulus)
        master = twiddle_table_np(spec, w_m, max(0, log_m - 1))  # (m/2, L)
        L = spec.n_limbs
        stages = np.zeros((max(1, log_m), L, max(1, m // 2)), np.uint32)
        idx = np.arange(m // 2)
        for s in range(log_m):
            q = m >> (s + 1)
            e = (idx % max(1, q)) << s
            stages[s] = master[e].T  # (L, m/2)
        return stages, bit_reverse_permutation(log_m)

    def _inter_table(self, log_m: int, log_n1: int) -> np.ndarray:
        """(L, n2, n1) table w_m^(k2*j1) for the size-2^log_m level whose
        split is n1 = 2^log_n1 columns, n2 = m/n1 rows.  Built by numpy
        row-doubling (trace-immune) like parallel/ntt_dist.DistDomain."""
        from ...fields.bigint import np_mont_mul

        spec = self.spec
        L = spec.n_limbs
        n1 = 1 << log_n1
        n2 = 1 << (log_m - log_n1)
        w_m = pow(self.omega, 1 << (self.log_n - log_m), spec.modulus)
        # rows k2: T[k2, j1] = (w_m^(2^t))^j1-accumulated — doubling over k2:
        # after round t the table holds rows k2 < 2^(t+1); multiplying the
        # existing rows by cur[j1] = w_m^(j1 * 2^t) appends rows k2 + 2^t.
        table = np.broadcast_to(
            int_to_limbs(spec.one, L).astype(np.uint32), (1, n1, L)
        ).copy()
        cur = twiddle_table_np(spec, w_m, log_n1)[:n1]  # w_m^j1
        for _ in range(log_m - log_n1):
            grown = np_mont_mul(
                spec,
                table.reshape(-1, L),
                np.tile(cur, (table.shape[0], 1)),
            ).reshape(table.shape[0], n1, L)
            table = np.concatenate([table, grown], axis=0)
            cur = np_mont_mul(spec, cur, cur)
        table = table[:n2]
        return np.transpose(table, (2, 0, 1)).copy()  # (L, n2, n1)

    def _build_tables(self):
        log_rest = self.log_n
        for leaf in self.plan[:-1]:
            n2_log = leaf
            n1_log = log_rest - leaf
            self._inter_tw[(log_rest, n1_log)] = self._inter_table(log_rest, n1_log)
            if n2_log not in self._leaf_tw:
                tw, rev = self._leaf_tables(n2_log)
                self._leaf_tw[n2_log], self._leaf_rev[n2_log] = tw, rev
            log_rest = n1_log
        last = self.plan[-1]
        if last not in self._leaf_tw:
            tw, rev = self._leaf_tables(last)
            self._leaf_tw[last], self._leaf_rev[last] = tw, rev


@functools.lru_cache(maxsize=32)
def _fused_domain(spec: FieldSpec, log_n: int, inverse: bool, leaf: int) -> FusedDomain:
    return FusedDomain(spec, log_n, inverse, leaf)


def get_fused_domain(spec: FieldSpec, log_n: int, inverse: bool = False) -> FusedDomain:
    return _fused_domain(spec, log_n, inverse, LEAF_LOG())


def _leaf_apply(dom: FusedDomain, xp: jax.Array, log_m: int, interpret: bool):
    """Full NTT of length 2^log_m along axis 1 of (L, m, B); natural order."""
    from ...config import get_config

    L, m, B = xp.shape
    if log_m == 0:
        return xp
    tb = min(128, B)
    while B % tb:
        tb //= 2
    tw = jnp.asarray(dom._leaf_tw[log_m])
    if get_config().mont_impl == "list":
        y = _leaf_call_list(dom.spec, log_m, B, tb, interpret)(tw, xp)
    else:
        pc, nc = dom.f.consts()
        y = _leaf_call(dom.spec, log_m, B, tb, interpret)(pc, nc, tw, xp)
    rev = jnp.asarray(dom._leaf_rev[log_m])
    return y[:, rev, :]


def _rec(dom: FusedDomain, xp: jax.Array, log_m: int, interpret: bool, inter):
    """Natural-in natural-out NTT of size 2^log_m along axis 1 of (L, m, B),
    root = canonical; recursive four-step.  ``inter`` maps (log_m, log_n1) ->
    the level twiddle table as a RUNTIME array (a trace constant would bake
    up to n*L*4 bytes of literal into the program — 256 MB at 2^22 — and
    overflow compile-request limits)."""
    L, m, B = xp.shape
    if log_m <= dom.leaf:
        return _leaf_apply(dom, xp, log_m, interpret)
    log_n2 = dom.leaf
    log_n1 = log_m - log_n2
    n1, n2 = 1 << log_n1, 1 << log_n2
    x4 = xp.reshape(L, n2, n1 * B)
    y = _leaf_apply(dom, x4, log_n2, interpret)  # NTT_n2 over rows j2
    y = y.reshape(L, n2, n1, B)
    T = inter[(log_m, log_n1)]  # (L, n2, n1) runtime arg
    pcast = jnp.broadcast_to(T[..., None], y.shape)
    y = _twiddle_mul(dom, y, pcast, interpret)
    y = jnp.swapaxes(y, 1, 2)  # (L, n1, n2, B)
    z = _rec(dom, y.reshape(L, n1, n2 * B), log_n1, interpret, inter)
    return z.reshape(L, n1 * n2, B)  # k1-major == natural


def _twiddle_mul(dom: FusedDomain, a: jax.Array, b: jax.Array, interpret: bool):
    """Elementwise Montgomery product of same-shape (L, ...) planes via the
    flat mont kernel (ops/pallas/mont.py)."""
    from .mont import mont_mul_planes

    L = a.shape[0]
    flat_a = a.reshape(L, -1)
    flat_b = b.reshape(L, -1)
    out = mont_mul_planes(dom.spec, flat_a, flat_b, interpret=interpret)
    return out.reshape(a.shape)


def fused_ntt_planes(
    spec: FieldSpec,
    xp: jax.Array,
    inverse: bool = False,
    *,
    interpret: bool | None = None,
    inter=None,
) -> jax.Array:
    """Natural-order NTT of a (L, n) plane batch; bit-exact with
    ops/ntt.FftKernel (ark Radix2EvaluationDomain convention).

    ``inter``: optional {(log_m, log_n1): (L, n2, n1) array} of inter-level
    twiddle tables passed as runtime values (see PallasFftKernel, which
    keeps them device-resident across calls); omitted -> tables embed as
    trace constants (fine for small n and interpret-mode tests)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, n = xp.shape
    log_n = int(n).bit_length() - 1
    if 1 << log_n != n:
        raise ValueError("FFT size must be a power of two")
    dom = get_fused_domain(spec, log_n, inverse)
    if inter is None:
        inter = {k: jnp.asarray(v) for k, v in dom._inter_tw.items()}
    y = _rec(dom, xp[:, :, None], log_n, interpret, inter)[:, :, 0]
    if inverse:
        ninv = jnp.broadcast_to(
            jnp.asarray(np.asarray(dom.n_inv, np.uint32))[:, None], (L, n)
        )
        y = _twiddle_mul(dom, y, ninv, interpret)
    return y
