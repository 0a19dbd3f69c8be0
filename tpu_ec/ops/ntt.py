"""Number-theoretic transform (finite-field FFT) over two-adic fields.

TPU-native counterpart of the reference field-FFT stack: the generated
radix-2^deg kernel (`ag-build/cl/fft.cl:4-68`), its host driver with pq/omega
precompute and round loop (`ec-gpu-proxy/src/fft.rs:50-135`), the elementwise
scale kernel `FIELD_mul_by_field` (fft.cl:71-76), and the CPU fallbacks
(`ec-gpu-proxy/src/fft_cpu.rs`).

Design: instead of one device launch per radix-2^8 round with shared-memory
butterflies, the whole transform is a single jitted XLA program — log2(n)
radix-2 stages expressed as static reshapes + one batched Montgomery multiply
per stage.  XLA fuses the butterfly arithmetic; the Pallas multi-stage kernel
(ops/pallas/ntt_stage.py) further reduces HBM passes for large n.

Conventions match `ark_poly::Radix2EvaluationDomain` (which the reference
tests against, `ag-cuda-ec/src/ec_fft.rs:121`): input in natural order,
output X_k = sum_j x_j w^{jk} in natural order, w = root_of_unity^(2^(s-k)).
Inverse transform scales by n^{-1}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import FieldOps, field_ops
from ..fields.params import FieldSpec, int_to_limbs

# A single FFT is capped at 2^32 in the reference (fft.rs:14); we keep the
# same contract (practically bounded by HBM well before that).
MAX_LOG2_FFT = 32


def twiddle_table_np(spec: FieldSpec, omega: int, log_len: int) -> np.ndarray:
    """(2^log_len, L) numpy table of omega^j in Montgomery form (eager)."""
    from ..fields.bigint import np_mont_mul

    table = int_to_limbs(spec.one, spec.n_limbs)[None, :].astype(np.uint32)
    w_pow = omega
    for _ in range(log_len):
        scale = int_to_limbs(spec.to_mont(w_pow), spec.n_limbs)
        table = np.concatenate([table, np_mont_mul(spec, table, scale[None, :])], axis=0)
        w_pow = (w_pow * w_pow) % spec.modulus
    return table


def bit_reverse_permutation(log_n: int) -> np.ndarray:
    """Index permutation reversing log_n-bit indices (common.cl:108-115)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


class Domain:
    """Radix-2 evaluation domain: twiddle tables for a fixed (field, log_n).

    Holds the device-resident power table w^0..w^(n/2-1) (Montgomery form),
    the role played by the pq[] and omegas[] buffers the reference uploads
    per FFT call (fft.rs:64-87) — here computed once on device via log-depth
    doubling and cached on the Domain object.
    """

    def __init__(self, spec: FieldSpec, log_n: int, inverse: bool = False):
        if log_n > min(spec.two_adicity, MAX_LOG2_FFT):
            raise ValueError(
                f"domain 2^{log_n} exceeds two-adicity {spec.two_adicity} of {spec.name}"
            )
        self.spec = spec
        self.f = field_ops(spec)
        self.log_n = log_n
        self.n = 1 << log_n
        p = spec.modulus
        omega = pow(spec.root_of_unity, 1 << (spec.two_adicity - log_n), p)
        if inverse:
            omega = pow(omega, p - 2, p)
        self.omega = omega
        self.inverse = inverse
        self._rev = bit_reverse_permutation(log_n)

    def materialize(self) -> "Domain":
        """Force the lazy device tables to concrete arrays.  MUST be called
        before first use from inside any jit/shard_map trace: a
        cached_property evaluated mid-trace would cache a tracer (inner jit
        calls inline into an active trace) and leak it to later calls."""
        _ = self.twiddles, self.n_inv
        return self

    @functools.cached_property
    def n_inv(self) -> np.ndarray:
        """n^{-1} (Montgomery form) for inverse-transform scaling."""
        return self.f.constant(pow(self.n, -1, self.spec.modulus))

    @functools.cached_property
    def twiddles(self) -> np.ndarray:
        """(n/2, L) NUMPY table of w^j in Montgomery form, built by log-depth
        doubling: [1] -> [1, w] -> [1, w, w^2, w^3] -> ...

        Built (and cached) as numpy via the eager Montgomery backend
        (fields/bigint.py) so the cache is trace-immune: even jnp.asarray of
        a numpy array performed while a caller's jit trace is active yields a
        trace-bound constant, so nothing jnp may be cached here.  Consumers
        convert with jnp.asarray at trace time (constant-folded per jit)."""
        return twiddle_table_np(self.spec, self.omega, self.log_n - 1)



@functools.lru_cache(maxsize=64)
def get_domain(spec: FieldSpec, log_n: int, inverse: bool = False) -> Domain:
    return Domain(spec, log_n, inverse)


def _ntt_impl(dom: Domain, x: jnp.ndarray) -> jnp.ndarray:
    """Constant-geometry (Pease) decimation-in-frequency radix-2 NTT.

    Every stage has the identical dataflow — butterfly the halves
    (a, b) = (y[:n/2], y[n/2:]) into u = a+b, v = (a-b)*tw and interleave
    [u0, v0, u1, v1, ...] — so the whole transform is one fori_loop whose
    body holds a single Montgomery multiply (compile-light, and the same
    fused kernel runs every stage).  The stage-s twiddle for pair i is
    w^(i & ~(2^s - 1)), a closed form derived from the stride-permutation
    layout (Pease layout at stage s = rotate-right of the index by s bits),
    gathered from the shared power table.  Natural order in, natural order
    out (final bit-reversal gather).  Replaces the reference's shared-memory
    radix-2^deg rounds (ag-build/cl/fft.cl:40-67, fft.rs:93-127).
    """
    f = dom.f
    n, log_n = dom.n, dom.log_n
    if log_n == 0:
        return x
    tw_table = jnp.asarray(dom.twiddles)  # (n/2, L), numpy -> trace const
    half_idx = jnp.arange(n // 2, dtype=jnp.uint32)

    def stage(s, y):
        a, b = y[: n // 2], y[n // 2 :]
        e = (half_idx >> s) << s  # twiddle exponent per pair
        tw = tw_table[e]
        u = f.add(a, b)
        v = f.mul(f.sub(a, b), tw)
        return jnp.stack([u, v], axis=1).reshape(n, f.L)

    y = jax.lax.fori_loop(0, log_n, stage, x)
    return y[jnp.asarray(dom._rev)]


class FftKernel:
    """Field-FFT driver (parity with ec-gpu-proxy/src/fft.rs FftKernel).

    ``radix_fft`` transforms one (n, L) array in place of the reference's
    round loop + buffer ping-pong (fft.rs:93-127 — XLA owns the scheduling);
    ``radix_fft_many`` maps over a batch, the single-chip analog of the
    multi-GPU chunking at fft.rs:211-246 (the multi-chip version lives in
    parallel/ntt_dist.py).  ``maybe_abort`` is polled between jitted calls
    (fft.rs:94-98 parity).

    Kernel selection: like the reference, where ``radix_fft`` IS the product
    entry point backed by the fast device kernel (fft.rs:139-247), large
    transforms on an accelerator backend route to the Pallas driver
    (ops/pallas/ntt.py), whose default is the MXU digit-matmul NTT
    (ops/ntt_digit.py, the repo's headline kernel) — selectable via config
    ``ntt_impl``.  The compile-light constant-geometry loop below remains
    the CPU-backend / small-n path (XLA-CPU has no Pallas compiler; tiny
    transforms don't amortize the digit tables).  Both paths are bit-exact
    equal (tests/test_ntt_digit.py, tests/test_ntt.py).
    """

    def __init__(self, spec: FieldSpec, maybe_abort=None):
        self.spec = spec
        self.f = field_ops(spec)
        self.maybe_abort = maybe_abort
        self._jitted = {}
        self._pallas_k = None

    def _pallas(self):
        if self._pallas_k is None:
            from .pallas.ntt import PallasFftKernel

            self._pallas_k = PallasFftKernel(self.spec)
        return self._pallas_k

    def _route_pallas(self, log_n: int) -> bool:
        """True when this transform should run the fast Pallas/MXU path:
        accelerator backend, size past the table-amortization knee, and a
        Pallas impl selected (config ``ntt_impl`` in {"digit", "fused"})."""
        from ..config import get_config

        return (
            log_n > 9
            and jax.default_backend() != "cpu"
            and get_config().ntt_impl in ("digit", "fused")
        )

    def _fn(self, log_n: int, inverse: bool):
        key = (log_n, inverse)
        if key not in self._jitted:
            dom = get_domain(self.spec, log_n, inverse)
            dom.materialize()  # build tables OUTSIDE the trace (no tracer leak)

            def run(x):
                y = _ntt_impl(dom, x)
                if inverse:
                    y = self.f.mul(y, jnp.broadcast_to(dom.n_inv, y.shape))
                return y

            self._jitted[key] = (jax.jit(run), dom)
        return self._jitted[key]

    def _check_abort(self):
        from ..errors import Aborted

        if self.maybe_abort is not None and self.maybe_abort():
            raise Aborted("FFT aborted by hook")

    def radix_fft(self, x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
        n = x.shape[0]
        log_n = int(n).bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("FFT size must be a power of two")
        self._check_abort()
        if self._route_pallas(log_n):
            return self._pallas().radix_fft(x, inverse)
        fn, _ = self._fn(log_n, inverse)
        return fn(x)

    def radix_fft_many(self, xs, inverse: bool = False):
        """Batched transform: xs is (B, n, L) or a list of (n, L) arrays."""
        if isinstance(xs, (list, tuple)):
            out = []
            for x in xs:
                self._check_abort()
                out.append(self.radix_fft(x, inverse))
            return out
        self._check_abort()
        n = xs.shape[1]
        log_n = int(n).bit_length() - 1
        if self._route_pallas(log_n):
            # one compiled Pallas program reused across the batch (the
            # per-GPU round-robin of fft.rs:211-246, minus the host hops)
            return jnp.stack(
                [self._pallas().radix_fft(x, inverse) for x in xs]
            )
        fn, _ = self._fn(log_n, inverse)
        return jax.vmap(fn)(xs)

    def mul_by_field(self, x: jnp.ndarray, scalar) -> jnp.ndarray:
        """Elementwise scale by one field element (fft.cl:71-76 parity);
        scalar is a Python int or an (L,) Montgomery limb array."""
        if isinstance(scalar, int):
            scalar = self.f.constant(scalar)
        return self.f.mul(x, jnp.broadcast_to(scalar, x.shape))


# -- functional convenience API --------------------------------------------


def ntt(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    return FftKernel(spec).radix_fft(x)


def intt(spec: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    return FftKernel(spec).radix_fft(x, inverse=True)


# -- host-side oracle -------------------------------------------------------


def ntt_ref(spec: FieldSpec, values: list[int], inverse: bool = False) -> list[int]:
    """Python bigint radix-2 NTT oracle (plain integers, natural order),
    mirroring the serial CPU fallback (ec-gpu-proxy/src/fft_cpu.rs:10-52)."""
    n = len(values)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    p = spec.modulus
    omega = pow(spec.root_of_unity, 1 << (spec.two_adicity - log_n), p)
    if inverse:
        omega = pow(omega, p - 2, p)
    a = [values[int(i)] for i in bit_reverse_permutation(log_n)]
    m = 1
    while m < n:
        w_m = pow(omega, n // (2 * m), p)
        for k in range(0, n, 2 * m):
            w = 1
            for j in range(m):
                t = (a[k + j + m] * w) % p
                a[k + j + m] = (a[k + j] - t) % p
                a[k + j] = (a[k + j] + t) % p
                w = (w * w_m) % p
        m *= 2
    if inverse:
        ninv = pow(n, -1, p)
        a = [(v * ninv) % p for v in a]
    return a
