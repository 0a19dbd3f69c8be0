"""Vectorized Montgomery prime-field arithmetic on 16-bit half-limbs.

TPU-native replacement for the generated field kernel template
(`ag-build/cl/field.cl`): add/sub/neg/double (field.cl:58-69,319-325),
Montgomery mul (CIOS, field.cl:268-299 — here a column-accumulation SOS
variant that vectorizes across the batch), pow / pow_lookup
(field.cl:329-352), mont/unmont (field.cl:355-377), gte/eq (field.cl:14-27)
and get_bits window extraction (field.cl:385-392).

Layout
------
A field element batch is ``uint32[..., L]`` — L half-limbs of 16 bits each,
little-endian, limbs in the *last* axis so the batch dims fill the 8x128 VPU
lanes.  All values are kept normalized (< 2^16 per limb) at op boundaries.
Elements are in **Montgomery form** (a*R mod p, R = 2^(16L)) exactly matching
arkworks'/blstrs' internal representation, so serialized test vectors are
directly comparable.

Carry model
-----------
TPU has no add-with-carry.  Carries are explicit: intermediate per-column
accumulators live in the 32-bit headroom above the 16-bit limb payload, and a
final length-L sequential (but batch-vectorized) carry pass normalizes.  This
is the vectorized replacement for the PTX ``add.cc/addc/madc`` chains the
reference generates (`ag-build/src/source/template.rs:91-159`,
`ag-build/cl/common.cl:127-248`).

All functions are pure jnp and can be traced under jit/vmap/shard_map or
called inside Pallas kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs, limbs_to_int

U32 = jnp.uint32


def _const(spec_limbs: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(spec_limbs, dtype=U32)


class FieldOps:
    """Batched field ops bound to one :class:`FieldSpec`.

    The spec is a static (hashable) closure constant, so every method traces
    into fixed-shape XLA/Pallas code — tracing is the analog of the
    reference's per-field source generation (`ag-build/src/source/
    synthesis.rs:100-122`).
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.n_limbs
        self.inv = np.uint32(spec.inv)
        # Constants are *numpy* arrays: safe to close over in any trace
        # context (they are lifted as literals), never leaked tracers.
        self.p = spec.p_limbs
        self.one = spec.one_limbs
        self.r2 = spec.r2_limbs
        self.nprime_l = spec.nprime_limbs
        self.zero = np.zeros((self.L,), dtype=np.uint32)
        # jit the public op surface: ``self`` is a closure constant, so each
        # method compiles once per input shape.  Nested use inside larger
        # jits simply inlines.  This is the runtime analog of the reference
        # compiling each generated kernel once (ag-build/src/compile.rs:44).
        for name in (
            "add", "sub", "neg", "double", "mul", "sqr",
            "to_mont", "from_mont", "inv_", "batch_inverse",
            "eq", "is_zero", "gte", "pack", "unpack",
        ):
            setattr(self, name, jax.jit(getattr(self, name)))
        self.pow = jax.jit(self.pow, static_argnums=(1,))
        self.get_bits = jax.jit(self.get_bits, static_argnums=(1, 2))

    def constant(self, value: int, mont: bool = True) -> np.ndarray:
        """Embed a Python-int field element as a (L,) numpy limb array."""
        v = self.spec.to_mont(value % self.spec.modulus) if mont else value
        return int_to_limbs(v, self.L)

    # -- helpers ----------------------------------------------------------

    def _carry(self, cols):
        """Normalize a list of L per-column accumulators (< 2^32) into a
        (..., L) limb array; the final carry out of column L-1 is dropped
        (callers guarantee the true value fits in L limbs)."""
        out = []
        c = None
        for i in range(self.L):
            v = cols[i] if c is None else cols[i] + c
            out.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(out, axis=-1)

    def _sub_limbs(self, a, b):
        """(a - b) mod 2^(16L) limbwise, plus the final borrow (0/1)."""
        out = []
        br = jnp.uint32(0)
        for i in range(self.L):
            v = a[..., i] + jnp.uint32(1 << LIMB_BITS) - b[..., i] - br
            out.append(v & LIMB_MASK)
            br = jnp.uint32(1) - (v >> LIMB_BITS)
        return jnp.stack(out, axis=-1), br

    def _cond_sub_p(self, t):
        """t in [0, 2p) -> t mod p, branchless (field.cl:58-60 reduce)."""
        d, br = self._sub_limbs(t, self.p)
        return jnp.where((br == 0)[..., None], d, t)

    # -- predicates -------------------------------------------------------

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def gte(self, a, b):
        """a >= b as bool batch (field.cl:14-22)."""
        _, br = self._sub_limbs(a, b)
        return br == 0

    def select(self, cond, a, b):
        """Elementwise select; cond is the batch-shaped bool (no limb axis)."""
        return jnp.where(cond[..., None], a, b)

    # -- ring ops ---------------------------------------------------------

    def add(self, a, b):
        t = self._carry([a[..., i] + b[..., i] for i in range(self.L)])
        return self._cond_sub_p(t)

    def sub(self, a, b):
        d, br = self._sub_limbs(a, b)
        wrapped = self._carry([d[..., i] + self.p[i] for i in range(self.L)])
        return jnp.where((br == 1)[..., None], wrapped, d)

    def neg(self, a):
        d, _ = self._sub_limbs(jnp.broadcast_to(self.p, a.shape), a)
        return jnp.where(self.is_zero(a)[..., None], a, d)

    def double(self, a):
        return self.add(a, a)

    def _mul_cols(self, a, b):
        """Unreduced product of two (..., L) limb batches as (..., 2L) column
        sums (each < 2L*2^16 < 2^22): column k holds sum_{i+j=k} of the 16-bit
        lo/hi halves of a_i*b_j.  Expressed as an L-step running sum of
        shifted vector products so the traced graph stays O(L) ops and no
        (L, L) outer-product tensor is materialized."""
        L = self.L
        batch = a.shape[:-1]

        def z(n):
            return jnp.zeros(batch + (n,), dtype=U32)

        acc = z(2 * L)
        for i in range(L):
            prod = a[..., i : i + 1] * b  # (..., L); 16x16 -> 32 exact
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            acc = acc + jnp.concatenate([z(i), lo, z(L - i)], axis=-1)
            acc = acc + jnp.concatenate([z(i + 1), hi, z(L - i - 1)], axis=-1)
        return acc

    def _normalize(self, cols):
        """Serial (batch-vectorized) carry pass: columns (< 2^32) -> exact
        16-bit limbs plus the final carry-out — the vectorized stand-in for
        hardware add-with-carry chains (common.cl:127-248)."""
        out = []
        c = None
        for i in range(cols.shape[-1]):
            v = cols[..., i] if c is None else cols[..., i] + c
            out.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(out, axis=-1), c

    def mul(self, a, b):
        """Montgomery multiply: a*b*R^-1 mod p (field.cl:268-299 parity).

        Separated (SOS) Montgomery reduction with a full-width nprime
        = -p^-1 mod R, chosen over word-serial CIOS because it keeps the
        batch-vectorized graph shallow: three column-products (a*b, low half
        * nprime, m*p) plus three short carry passes, instead of L dependent
        reduction rounds.  Headroom: every column sum stays < 2^23 << 2^32.
        """
        L = self.L
        t = self._mul_cols(a, b)  # (..., 2L) columns of a*b
        t_lo, c_lo = self._normalize(t[..., :L])  # exact low L limbs of a*b
        m_cols = self._mul_cols(t_lo, jnp.broadcast_to(self.nprime_l, t_lo.shape))
        m, _ = self._normalize(m_cols[..., :L])  # m = (ab mod R)*nprime mod R
        mp = self._mul_cols(m, jnp.broadcast_to(self.p, m.shape))  # m*p columns
        u_hi = t[..., L:] + mp[..., L:]
        u_hi = u_hi.at[..., 0].add(c_lo)
        u = jnp.concatenate([t_lo + mp[..., :L], u_hi], axis=-1)
        un, _ = self._normalize(u)  # low L limbs are exactly zero here
        return self._cond_sub_p(un[..., L:])

    def sqr(self, a):
        return self.mul(a, a)

    # -- Montgomery-domain conversion (field.cl:355-377) -------------------

    def to_mont(self, a):
        return self.mul(a, jnp.broadcast_to(self.r2, a.shape))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one)

    # -- exponentiation ----------------------------------------------------

    def pow(self, base, exponent):
        """base^exponent with a shared exponent (field.cl:329-338).

        ``exponent`` is a Python int or a (L,) uint32 limb array (plain
        integer, not Montgomery).  Runs a fori_loop over bits MSB-first so the
        traced graph holds a single Montgomery multiply.
        """
        if isinstance(exponent, int):
            exponent = _const(int_to_limbs(exponent, self.L))
        nbits = self.L * LIMB_BITS

        def body(i, acc):
            bit_index = nbits - 1 - i
            limb = exponent[bit_index // LIMB_BITS]
            bit = (limb >> (bit_index % LIMB_BITS)) & 1
            acc = self.mul(acc, acc)
            return self.select(bit == 1, self.mul(acc, base), acc)

        init = jnp.broadcast_to(self.one, base.shape)
        return jax.lax.fori_loop(0, nbits, body, init)

    def inv_(self, a):
        """Field inverse via Fermat (a^(p-2)); in-domain for Montgomery reps."""
        return self.pow(a, self.spec.modulus - 2)

    def batch_inverse(self, a):
        """Montgomery's batch-inversion over the leading axis.

        Prefix/suffix products via associative scans keep depth log N, then a
        single Fermat inversion of the total.  Zero entries map to zero.
        """
        n = a.shape[0]
        iz = self.is_zero(a)
        safe = jnp.where(iz[..., None], jnp.broadcast_to(self.one, a.shape), a)
        pre = jax.lax.associative_scan(self.mul, safe, axis=0)
        suf = jax.lax.associative_scan(self.mul, safe[::-1], axis=0)[::-1]
        total_inv = self.inv_(pre[n - 1])
        left = jnp.concatenate([jnp.broadcast_to(self.one, (1,) + a.shape[1:]), pre[:-1]], axis=0)
        right = jnp.concatenate([suf[1:], jnp.broadcast_to(self.one, (1,) + a.shape[1:])], axis=0)
        out = self.mul(self.mul(left, right), jnp.broadcast_to(total_inv, a.shape))
        return jnp.where(iz[..., None], jnp.zeros_like(a), out)

    # -- bit/window extraction (field.cl:380-392) --------------------------

    def get_bits(self, a, skip, width):
        """MSB-first window extract: bits [bits-skip-width, bits-skip) of the
        plain-integer limb array ``a`` (used by double-and-add; MSM digit
        extraction lives in ops/msm.py)."""
        nbits = self.L * LIMB_BITS
        lo = nbits - skip - width
        acc = None
        for w in range(width):
            bit_index = lo + w
            limb = a[..., bit_index // LIMB_BITS]
            bit = (limb >> (bit_index % LIMB_BITS)) & 1
            acc = bit << w if acc is None else acc | (bit << w)
        return acc

    # -- packing / host conversion ----------------------------------------

    def pack(self, a):
        """Half-limb (..., L) -> packed uint32 (..., L/2) storage form
        (the reference's Limb32 layout, ag-types/src/impls.rs:20-24)."""
        return a[..., 0::2] | (a[..., 1::2] << LIMB_BITS)

    def unpack(self, a32):
        lo = a32 & LIMB_MASK
        hi = a32 >> LIMB_BITS
        return jnp.stack([lo, hi], axis=-1).reshape(*a32.shape[:-1], self.L)

    def from_ints(self, values, mont: bool = True) -> jnp.ndarray:
        """Host: list/array of Python ints -> (N, L) device limb array."""
        arr = np.zeros((len(values), self.L), dtype=np.uint32)
        for i, v in enumerate(values):
            v = v % self.spec.modulus
            arr[i] = int_to_limbs(self.spec.to_mont(v) if mont else v, self.L)
        return jnp.asarray(arr)

    def to_ints(self, a, mont: bool = True) -> list:
        """Device (N, L) limb array -> list of Python ints."""
        arr = np.asarray(jax.device_get(a))
        out = []
        for row in arr.reshape(-1, self.L):
            v = limbs_to_int(row)
            out.append(self.spec.from_mont(v) if mont else v)
        return out


@functools.lru_cache(maxsize=None)
def field_ops(spec: FieldSpec) -> FieldOps:
    """Process-wide cache of FieldOps per spec (the analog of the reference's
    dedup of registered source items, ag-build/src/source/builder.rs:105-116)."""
    return FieldOps(spec)
