"""Pippenger multi-scalar multiplication (MSM / "multiexp"), TPU-native.

Counterpart of the reference's MSM stack: the fork's single-launch WNAF
bucket kernel (`ag-build/cl/multiexp.cl:62-263`), its host driver
(`ag-cuda-ec/src/multiexp.rs:21-81`), the legacy bellman-style kernel + CPU
window-reduction (`ag-build/cl/multiexp_backup.cl`,
`ec-gpu-proxy/src/multiexp.rs:135-235`), and the window/work-size heuristics
(`ec-gpu-proxy/src/multiexp.rs:42-49,245-252`).

TPU reformulation
-----------------
The GPU kernel gives each *thread* a private bucket set and serially
accumulates `POINT_add_mixed` over its chunk (multiexp.cl:95-119).  TPUs have
no per-lane private state, so the bucket lattice becomes a tensor
``buckets[group, window, slot]`` of Jacobian points and the accumulation a
``fori_loop`` of **vectorized** steps: at step t every (group, window) lane
gathers its current bucket, performs ONE batched `add_mixed` across all
G x W lanes (8x128-lane friendly), and scatters back.  Within a step each
lane touches a distinct (group, window) row, so the scatter is
conflict-free (`unique_indices=True`).  Total point-add work is
``n * num_windows`` — identical to the GPU algorithm, not a log-factor
approximation.

Signed digits (WNAF) follow multiexp.cl:95-118: window digits are recoded
into [-2^(w-1), 2^(w-1)] with a carry chain, negative digits add the negated
point (y -> -y is free, "neg_is_cheap"), halving the bucket count.  Digit 0
is routed to a dummy slot 0 that the reduction skips — the branch-free
replacement for the GPU's `if (ind--) { add }` skip.

The triangular bucket reduction (multiexp.cl:121-131) and the cross-group /
cross-window combines (multiexp.cl:159-197's tree aggregation; the CPU
window-reduction at multiexp.rs:221-235) are `fori_loop`s / log-depth trees
over the same vectorized point ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveSpec
from ..curves.point import PointOps, point_ops
from ..errors import Aborted

SCALAR_BITS = 256  # Fr limb width for both supported curves (16 x 16-bit)


# ---------------------------------------------------------------------------
# Planning heuristics (multiexp.rs:42-49,245-252 analog, re-derived for the
# lattice formulation: total adds = W*(n + 2*B*G), bucket memory = G*W*B*pt).
# ---------------------------------------------------------------------------


def default_window_size(n: int) -> int:
    """Window bits w: balances accumulation (n adds/window) against the
    2*2^(w-1)*G reduction adds/window.  Empirically W*(n + 2BG) is minimized
    near w = log2(n) - 10 for G ~ 128 lanes-per-window (the same shape as the
    reference's log2(n/work_units)+2 with its 128*CU work units)."""
    if n <= 1:
        return 1
    return max(2, min(12, n.bit_length() - 11))


def default_num_groups(n: int, window_size: int) -> int:
    """Groups G (power of two): enough G*W lanes to fill the VPU, bounded so
    bucket scratch stays small relative to HBM (the reference bounds scratch
    by device memory, multiexp.rs:71-93)."""
    num_windows = -(-SCALAR_BITS // window_size)
    target_lanes = 4096
    g = max(1, target_lanes // num_windows)
    g = 1 << (g - 1).bit_length()  # round up to pow2 (tree-reduce needs it)
    while g > 1 and g * num_windows > 4 * n:
        g //= 2
    return g


# ---------------------------------------------------------------------------
# Digit extraction (multiexp.cl:95-118 WNAF recode, vectorized)
# ---------------------------------------------------------------------------


def _window_raws(scalars: jnp.ndarray, w: int, num_windows: int) -> list[jnp.ndarray]:
    """Unsigned base-2^w digits of (.., Ls+1)-limb scalars (zero-padded by
    one limb); window j covers bits [j*w, (j+1)*w).  Limb offsets are static
    per window, so this unrolls to shifts/masks only."""
    mask = jnp.uint32((1 << w) - 1)
    out = []
    for j in range(num_windows):
        lo = j * w
        li, ofs = lo // 16, lo % 16
        merged = scalars[..., li] | (scalars[..., li + 1] << jnp.uint32(16))
        out.append(((merged >> jnp.uint32(ofs)) & mask).astype(jnp.int32))
    return out


def _recode_signed(raws: list[jnp.ndarray], w: int) -> jnp.ndarray:
    """Carry-chain signed recode: digits in [-2^(w-1), 2^(w-1)]
    (multiexp.cl:103-118 'neg_is_cheap' path)."""
    half = 1 << (w - 1)
    digits = []
    c = jnp.zeros_like(raws[0])
    for r in raws:
        t = r + c
        c = (t > half).astype(jnp.int32)
        digits.append(t - (c << w))
    return jnp.stack(digits, axis=-1)


def make_digits(scalars: jnp.ndarray, w: int, num_windows: int, signed: bool) -> jnp.ndarray:
    """(..., Ls+1) zero-padded plain-int scalar limbs -> (..., W) int32 digits."""
    raws = _window_raws(scalars, w, num_windows)
    if signed:
        return _recode_signed(raws, w)
    return jnp.stack(raws, axis=-1)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _tree_get(P, idx):
    return jax.tree_util.tree_map(lambda l: l[idx], P)


def _msm_lattice(
    ops: PointOps,
    points,  # affine pytree, leaves (m, G, L)
    scalars: jnp.ndarray,  # (m, G, Ls+1) plain-int limbs, zero-padded
    *,
    window_size: int,
    signed: bool,
):
    """One full MSM: returns a single Jacobian point (batch shape (1,))."""
    F = ops.F
    w = window_size
    num_windows = -(-SCALAR_BITS // w)
    half = 1 << (w - 1)
    nbuckets = (half if signed else (1 << w) - 1) + 1  # slot 0 = dummy
    m, G = scalars.shape[0], scalars.shape[1]
    W = num_windows

    gi = jnp.arange(G)[:, None]  # (G, 1)
    wi = jnp.arange(W)[None, :]  # (1, W)

    def accumulate(t, buckets):
        A = _tree_get(points, t)  # affine (G,)
        s = scalars[t]  # (G, Ls+1)
        digits = make_digits(s, w, W, signed)  # (G, W)
        slot = jnp.abs(digits) if signed else digits
        x, y = A
        yneg = F.neg(y)
        bx = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l[:, None], (G, W) + l.shape[1:]), x
        )
        sign = (digits < 0)[..., None] if signed else None

        def pick_y(yp, yn):
            yb = jnp.broadcast_to(yp[:, None], (G, W) + yp.shape[1:])
            if not signed:
                return yb
            ynb = jnp.broadcast_to(yn[:, None], (G, W) + yn.shape[1:])
            return jnp.where(sign, ynb, yb)

        by = jax.tree_util.tree_map(pick_y, y, yneg)
        cur = jax.tree_util.tree_map(lambda l: l[gi, wi, slot], buckets)
        new = ops.add_mixed(cur, (bx, by))
        # digit 0 -> slot 0 still performs the add; the dummy slot is never
        # read by the reduction, so the work is wasted but the result exact
        # (the GPU instead skips; a lane-predicated Pallas kernel can too).
        return jax.tree_util.tree_map(
            lambda l, v: l.at[gi, wi, slot].set(v, unique_indices=True),
            buckets, new,
        )

    buckets = ops.identity_jacobian((G, W, nbuckets))
    buckets = jax.lax.fori_loop(0, m, accumulate, buckets)

    # Triangular running-sum bucket reduction (multiexp.cl:121-131):
    # sum_{k=1..B-1} k * bucket[k], vectorized over all G*W lanes.
    def reduce_step(i, carry):
        running, acc = carry
        k = nbuckets - 1 - i
        running = ops.add(running, _tree_get(buckets, (slice(None), slice(None), k)))
        acc = ops.add(acc, running)
        return (running, acc)

    running = ops.identity_jacobian((G, W))
    acc = ops.identity_jacobian((G, W))
    _, acc = jax.lax.fori_loop(0, nbuckets - 1, reduce_step, (running, acc))

    # Cross-group tree reduction (replaces POINT_aggregate_chunk's in-kernel
    # tree, multiexp.cl:159-197) — G is a power of two.
    g = G
    while g > 1:
        lo = jax.tree_util.tree_map(lambda l: l[: g // 2], acc)
        hi = jax.tree_util.tree_map(lambda l: l[g // 2 : g], acc)
        acc = ops.add(lo, hi)
        g //= 2
    per_window = jax.tree_util.tree_map(lambda l: l[0], acc)  # (W,)

    # Window combine, high-to-low: res = 2^w * res + S_j (the CPU-side
    # combine of multiexp.rs:221-235, kept on device).
    def combine(j, res):
        def dbl(_, r):
            return ops.double(r)

        res = jax.lax.fori_loop(0, w, dbl, res)
        Sj = jax.tree_util.tree_map(
            lambda l: jax.lax.dynamic_slice_in_dim(l, W - 1 - j, 1, axis=0),
            per_window,
        )
        return ops.add(res, Sj)

    return jax.lax.fori_loop(0, W, combine, ops.identity_jacobian((1,)))


# ---------------------------------------------------------------------------
# Driver (FftKernel-style class, multiexp.rs:256-404 / ag-cuda-ec parity)
# ---------------------------------------------------------------------------


def calc_chunk_size(spec: CurveSpec, hbm_budget_bytes: int | None = None) -> int:
    """Max points per on-device MSM launch, bounded by device memory
    (the `calc_chunk_size` analog, ec-gpu-proxy/src/multiexp.rs:71-93).

    Measured on v5e (r5, .chiplogs/msm24.log): a 2^23-point pair chunk's
    live working set is ~13.2 GiB = ~17 coordinate-sized arrays of length
    n (sorted gathers + halving generations + spill/scan temporaries), on
    top of which the WHOLE oversized input stays device-resident while
    chunks run (~230 B/point at 2^24 = 3.7 GiB).  The budget fraction is
    therefore 0.6 (not the reference's 0.8, multiexp.rs:23-24) so chunk +
    resident inputs + headroom fit together."""
    from ..config import get_config
    from ..curves.point import point_ops as _po

    if hbm_budget_bytes is None:
        hbm_budget_bytes = get_config().msm_hbm_budget_bytes
    L = _po(spec).fq.L * spec.ext
    per_point = 17 * L * 4
    n = int(0.6 * hbm_budget_bytes) // per_point
    return max(1 << 12, 1 << (n.bit_length() - 1))  # round down to pow2


class MultiexpKernel:
    """MSM driver bound to one curve.

    ``multiexp(bases, scalars)`` is the `MultiexpKernel::multiexp` analog
    (multiexp.rs:372-400); ``multiple_multiexp`` is the fork's batch entry
    point (`ag-cuda-ec/src/multiexp.rs:21-81`), running many independent
    MSMs that share one compiled kernel.  ``maybe_abort`` is polled between
    chunks (multiexp.rs:140-144 parity).

    Two engines: ``method="sorted"`` (default) — the sort + run-halving
    pipeline in ops/msm_sorted.py; ``method="lattice"`` — the gather/scatter
    bucket lattice below (kept for unsigned digits and as a differential
    cross-check).  Inputs larger than ``chunk_size`` are split and partial
    results combined on device (multiexp.rs:332-366 parity).
    """

    def __init__(self, spec: CurveSpec, maybe_abort=None, chunk_size: int | None = None):
        self.spec = spec
        self.ops = point_ops(spec)
        self.maybe_abort = maybe_abort
        self.chunk_size = chunk_size or calc_chunk_size(spec)
        self._jitted = {}

    def _check_abort(self):
        if self.maybe_abort is not None and self.maybe_abort():
            raise Aborted("MSM aborted by hook")

    def _fn(self, m: int, G: int, window_size: int, signed: bool):
        key = (m, G, window_size, signed)
        if key not in self._jitted:
            ops = self.ops

            @jax.jit
            def run(points, scalars):
                return _msm_lattice(
                    ops, points, scalars, window_size=window_size, signed=signed
                )

            self._jitted[key] = run
        return self._jitted[key]

    def prepare_inputs(self, bases, scalars, num_groups: int):
        """Host-side marshalling: pad n to a multiple of G (identity points
        with zero scalars land in the dummy slot) and reshape to the (m, G)
        lattice.  The scalar array is zero-padded by one limb for the
        cross-limb window extraction."""
        ops = self.ops
        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        G = num_groups
        m = -(-n // G)
        pad = m * G - n

        def pad_leaf(l):
            if pad:
                l = jnp.concatenate(
                    [l, jnp.zeros((pad,) + l.shape[1:], l.dtype)], axis=0
                )
            return l.reshape((m, G) + l.shape[1:])

        points = jax.tree_util.tree_map(pad_leaf, bases)
        s = jnp.concatenate(
            [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)], axis=-1
        )
        s = pad_leaf(s)
        return points, s, m

    def _fn_sorted(self, n: int, window_size: int):
        key = ("sorted", n, window_size)
        if key not in self._jitted:
            from .msm_sorted import msm_sorted

            ops = self.ops

            @jax.jit
            def run(points, scalars):
                return msm_sorted(ops, points, scalars, window_size=window_size)

            self._jitted[key] = run
        return self._jitted[key]

    def _fn_coz(self, n: int, window_size: int):
        key = ("coz", n, window_size)
        if key not in self._jitted:
            from .msm_coz import msm_coz

            ops = self.ops

            @jax.jit
            def run(points, scalars):
                return msm_coz(ops, points, scalars, window_size=window_size)

            self._jitted[key] = run
        return self._jitted[key]

    def _fn_pair(self, n: int, window_size: int):
        key = ("pair", n, window_size)
        if key not in self._jitted:
            from .msm_pair import msm_pair

            ops = self.ops

            @jax.jit
            def run(points, scalars):
                return msm_pair(ops, points, scalars, window_size=window_size)

            self._jitted[key] = run
        return self._jitted[key]

    def _fn_scan(self, n: int, window_size: int):
        key = ("scan", n, window_size)
        if key not in self._jitted:
            from .msm_scan import msm_scan

            ops = self.ops

            @jax.jit
            def run(points, scalars):
                return msm_scan(ops, points, scalars, window_size=window_size)

            self._jitted[key] = run
        return self._jitted[key]

    def multiexp(
        self,
        bases,
        scalars: jnp.ndarray,
        *,
        window_size: int | None = None,
        num_groups: int | None = None,
        signed: bool = True,
        method: str = "auto",
    ):
        """sum_i scalars[i] * bases[i] -> one Jacobian point (batch (1,)).

        ``bases`` is an affine pytree batch ((0,0) = identity); ``scalars``
        is a (n, Ls) plain-integer limb batch (NOT Montgomery — the
        reference converts with to_repr at multiexp.rs:152-153; use
        ``PointOps.scalars_to_limbs``)."""
        from ..utils import timer

        self._check_abort()
        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        if method == "auto":
            if not signed:
                method = "lattice"
            elif jax.default_backend() == "cpu":
                # CPU backend: the compile-light scan engine for both G1
                # and G2 (XLA-CPU pays ~6 s per inlined point-op instance —
                # the movement-minimal engines take minutes to compile
                # there, ops/msm_scan.py header)
                method = "scan"
            elif self.spec.ext == 1:
                method = "pair"  # movement-minimal halving engine
            else:
                # G2: the scan engine is generic over Fp2 and compile-light
                # (~2 min through the tunnel vs ~an hour for the
                # movement-minimal engines' unrolled Fp2 point ops)
                method = "scan"
        if method in ("sorted", "coz", "pair", "scan"):
            assert signed, f"{method} engine implements signed digits only"
            if n > self.chunk_size:
                return self._multiexp_chunked(bases, scalars, window_size, method)
            from ..config import get_config
            from ..utils.log import get_logger
            from .autotune import tuned_window
            from .msm_coz import default_window_size_coz
            from .msm_pair import default_window_size_pair
            from .msm_scan import default_window_size_scan
            from .msm_sorted import default_window_size_sorted

            default_w = {
                "coz": default_window_size_coz,
                "pair": default_window_size_pair,
                "scan": default_window_size_scan,
                "sorted": default_window_size_sorted,
            }[method]
            w = (
                window_size
                or get_config().msm_window
                or tuned_window(self.spec.name, method, n)
                or default_w(n)
            )
            get_logger("tpu_ec.msm").info(
                "MSM n=%d curve=%s engine=%s window=%d", n, self.spec.name, method, w
            )
            with timer.phase("msm/prepare"):
                points, s = self._prepare_flat(bases, scalars)
            fn = {
                "coz": self._fn_coz,
                "pair": self._fn_pair,
                "scan": self._fn_scan,
                "sorted": self._fn_sorted,
            }[method]
            with timer.phase("msm/dispatch"):
                return fn(n, w)(points, s)
        w = window_size or default_window_size(n)
        with timer.phase("msm/prepare"):
            points, s, m = self.prepare_inputs(bases, scalars, G := (num_groups or default_num_groups(n, w)))
        with timer.phase("msm/dispatch"):
            return self._fn(m, G, w, signed)(points, s)

    def _prepare_flat(self, bases, scalars):
        """Marshalling for the sorted engine: zero-pad scalars by one limb
        for cross-limb window extraction (no lattice reshape)."""
        s = jnp.concatenate(
            [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)],
            axis=-1,
        )
        return bases, s

    def _multiexp_chunked(self, bases, scalars, window_size, method="sorted"):
        """Split an oversized MSM into chunk_size pieces and sum the partial
        Jacobian results (the per-GPU serial chunk loop of
        multiexp.rs:332-366, with the host combine kept on device)."""
        from ..utils.log import get_logger

        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        c = self.chunk_size
        get_logger("tpu_ec.msm").info(
            "MSM n=%d exceeds chunk_size=%d: %d chunks", n, c, -(-n // c)
        )
        acc = None
        for lo in range(0, n, c):
            self._check_abort()
            hi = min(lo + c, n)
            b = jax.tree_util.tree_map(lambda l: l[lo:hi], bases)
            part = self.multiexp(
                b, scalars[lo:hi], window_size=window_size, method=method
            )
            acc = part if acc is None else self.ops.add(acc, part)
        return acc

    def upload_bases(self, bases):
        """Pin an affine base table on the device for reuse across calls —
        the `upload_multiexp_bases` parity (ag-cuda-ec/src/multiexp.rs:11-33:
        the AMT SRS is uploaded once and every batch launch reuses the
        device pointer).  Under XLA any jnp array is already
        device-resident; this makes the residency explicit (host numpy
        input -> committed device buffers) so repeated multiexp /
        multiple_multiexp calls never re-transfer the table."""
        return jax.tree_util.tree_map(
            lambda l: jax.device_put(jnp.asarray(l)), bases
        )

    def multiple_multiexp(
        self,
        bases,
        scalars: jnp.ndarray,
        num_chunks: int,
        *,
        window_size: int | None = None,
        num_groups: int | None = None,
        signed: bool = True,
        method: str = "auto",
    ):
        """num_chunks independent MSMs over equal slices of ``bases``
        (ag-cuda-ec/src/multiexp.rs:21-81 parity: scalars has one row of
        exps per chunk).  Returns a Jacobian batch of num_chunks points.

        Like the fork's single-launch batch kernel
        (`ag-build/cl/multiexp.cl:217-263` runs num_chunks x num_lines MSMs
        in ONE launch), the whole batch compiles to ONE XLA program: a
        `lax.map` over the chunk axis sharing one pair-engine body.  Other
        engines fall back to a per-chunk dispatch loop."""
        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        chunk = n // num_chunks
        assert chunk * num_chunks == n, "bases must split evenly into chunks"
        if method == "auto" and signed:
            # pair = fewest adds/chunk; scan = compile-light (G2 and the
            # CPU backend, same policy as multiexp)
            method = (
                "scan"
                if (self.spec.ext != 1 or jax.default_backend() == "cpu")
                else "pair"
            )
        if method in ("pair", "scan"):
            from .autotune import tuned_window
            from .msm_pair import default_window_size_pair
            from .msm_scan import default_window_size_scan, msm_scan

            self._check_abort()
            w = (
                window_size
                or tuned_window(self.spec.name, method, chunk)
                or {"pair": default_window_size_pair, "scan": default_window_size_scan}[
                    method
                ](chunk)
            )
            # slab the batch: ONE compiled program reused over
            # ceil(num_chunks/slab) dispatches.  A whole 2^10-chunk batch
            # as a single program executes for minutes on-device, which the
            # axon tunnel kills with UNAVAILABLE at readback (config note).
            from ..config import get_config
            from ..utils.log import get_logger

            slab = min(get_config().batch_msm_slab or num_chunks, num_chunks)
            # pad the batch up to a multiple of slab (dummy chunks reuse the
            # first chunk's bases with zero scalars; outputs are trimmed) so
            # every dispatch runs the SAME full-size compiled program — no
            # gcd-shrunk slabs, no per-chunk dispatch storm on non-divisible
            # shapes, no second compiled shape for the tail
            pad_chunks = (-num_chunks) % slab
            # per-slab engine:
            #  - pair -> the FLAT one-sort engine: the whole slab is one
            #    bucket space per window (chunk id folded into the sort
            #    key), so every sort/gather/point-add amortizes at the
            #    large-n rate.  Chunk-serial lax.map (r4: 37x off) and
            #    chunk-vmap (r5: batched gathers 4x worse still, or 32 GiB
            #    compile OOM with windows vmapped too) both measured out —
            #    see ops/msm_batch.py.
            #  - scan -> chunk-vmapped scan body (compile-light; the CPU
            #    and G2 path) with lax.map above the memory threshold.
            use_vmap = method == "scan" and slab * chunk <= (1 << 22)
            mode = "flat" if method == "pair" else ("vmap" if use_vmap else "map")
            key = (f"{method}_batch", mode, slab, chunk, w)
            if key not in self._jitted:
                ops = self.ops

                if method == "pair":
                    from .msm_batch import msm_batch_flat

                    @jax.jit
                    def run(points, scalars_):
                        return msm_batch_flat(
                            ops, points, scalars_, window_size=w
                        )  # leaves (slab, L)

                else:

                    @jax.jit
                    def run(points, scalars_):
                        def body(b, s):
                            return msm_scan(ops, b, s, window_size=w)

                        if use_vmap:
                            out = jax.vmap(body)(points, scalars_)
                        else:
                            out = jax.lax.map(
                                lambda a: body(a[0], a[1]), (points, scalars_)
                            )
                        return jax.tree_util.tree_map(lambda l: l[:, 0], out)

                self._jitted[key] = run
            pts = jax.tree_util.tree_map(
                lambda l: l.reshape((num_chunks, chunk) + l.shape[1:]), bases
            )
            s = jnp.concatenate(
                [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)],
                axis=-1,
            ).reshape(num_chunks, chunk, -1)
            if pad_chunks:
                pts = jax.tree_util.tree_map(
                    lambda l: jnp.concatenate(
                        [l, jnp.broadcast_to(l[:1], (pad_chunks,) + l.shape[1:])]
                    ),
                    pts,
                )
                s = jnp.concatenate(
                    [s, jnp.zeros((pad_chunks,) + s.shape[1:], s.dtype)]
                )
            total = num_chunks + pad_chunks
            if slab < total:
                get_logger("tpu_ec.msm").info(
                    "batch MSM %d chunks as %d dispatches of %d (%d padded)",
                    num_chunks, total // slab, slab, pad_chunks,
                )
            parts = []
            for lo in range(0, total, slab):
                self._check_abort()
                p = jax.tree_util.tree_map(lambda l: l[lo : lo + slab], pts)
                parts.append(self._jitted[key](p, s[lo : lo + slab]))
            out = jax.tree_util.tree_map(
                lambda *ls: jnp.concatenate(ls, axis=0), *parts
            )  # leaves (total, L)
            return jax.tree_util.tree_map(lambda l: l[:num_chunks], out)
        outs = []
        for c in range(num_chunks):
            self._check_abort()
            sl = slice(c * chunk, (c + 1) * chunk)
            b = jax.tree_util.tree_map(lambda l: l[sl], bases)
            outs.append(
                self.multiexp(
                    b,
                    scalars[sl],
                    window_size=window_size,
                    num_groups=num_groups,
                    signed=signed,
                )
            )
        return jax.tree_util.tree_map(
            lambda *ls: jnp.concatenate(ls, axis=0), *outs
        )


# -- functional convenience ---------------------------------------------------


def msm(spec: CurveSpec, bases, scalars, **kw):
    return MultiexpKernel(spec).multiexp(bases, scalars, **kw)


def multiexp_1bit(spec: CurveSpec, bases, scalars, num_groups: int | None = None):
    """1-bit-window batch MSM variant (`ag-build/cl/batch_multiexp.cl:11-55`
    parity): window_size = 1, unsigned digits — one bucket per scalar bit,
    running on the lattice engine."""
    return MultiexpKernel(spec).multiexp(
        bases,
        scalars,
        window_size=1,
        signed=False,
        method="lattice",
        num_groups=num_groups,
    )
