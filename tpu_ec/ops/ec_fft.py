"""EC-group FFT: radix-2 NTT over elliptic-curve points.

Counterpart of the reference's EC-FFT stack used for AMT workloads: the
generated kernel (`ag-build/cl/ec-fft.cl:4-76`, butterflies of POINT_add /
POINT_sub with a full `POINT_mul` scalar multiplication as the twiddle — the
noted hot path at ec-fft.cl:47-52), its two host drivers
(`ag-cuda-ec/src/ec_fft.rs:12-99` with device-pointer ping-pong, and
`ec-gpu-proxy/src/ec_fft.rs:164-280` multi-GPU), and the CPU fallback
(`ec-gpu-proxy/src/ec_fft_cpu.rs`).

A group FFT is linear over the Fr-module structure: butterflies are point
add/sub and twiddles are *scalar multiplications* by w^e (w a root of unity
in Fr).  Same constant-geometry (Pease) stage dataflow as ops/ntt.py, so one
fori_loop body serves every stage; the twiddle scalar-mul is the 255-step
double-and-add the reference also pays (255 POINT_double+add per butterfly).
Twiddle *exponent* scalars come from a plain-form (non-Montgomery) power
table built once per domain on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves.params import CurveSpec
from ..curves.point import PointOps, point_ops
from ..errors import Aborted
from ..fields.params import FieldSpec
from .ntt import Domain, bit_reverse_permutation, get_domain


class EcDomain:
    """Twiddle scalars (plain-int limb form) for one (curve, log_n)."""

    def __init__(self, spec: CurveSpec, log_n: int, inverse: bool = False):
        self.spec = spec
        self.ops = point_ops(spec)
        self.field_domain: Domain = get_domain(spec.scalar, log_n, inverse)
        self.log_n = log_n
        self.n = 1 << log_n
        self.inverse = inverse
        self._rev = bit_reverse_permutation(log_n)

    @functools.cached_property
    def twiddle_scalars(self) -> 'np.ndarray':
        """(n/2, Ls) plain-integer w^j table: the Montgomery table of the
        underlying field domain converted out of the Montgomery domain once
        (SCALAR_pow(pq[0], e) of ec-fft.cl:56-67 is instead a table gather).
        Built eagerly in numpy (trace-immune, see Domain.twiddles)."""
        import numpy as np

        from ..fields.bigint import np_mont_mul
        from ..ops.ntt import twiddle_table_np

        spec = self.spec.scalar
        table = twiddle_table_np(spec, self.field_domain.omega, self.log_n - 1)
        one = np.zeros((1, spec.n_limbs), np.uint32)
        one[0, 0] = 1
        return np_mont_mul(spec, table, one)  # numpy (trace-immune cache)

    @functools.cached_property
    def n_inv_scalar(self) -> 'np.ndarray':
        """n^{-1} plain-int limbs for the inverse transform point scaling."""
        from ..fields.params import int_to_limbs

        r = self.spec.scalar.modulus
        return int_to_limbs(pow(self.n, -1, r), self.ops.fr.L)  # numpy


@functools.lru_cache(maxsize=64)
def get_ec_domain(spec: CurveSpec, log_n: int, inverse: bool = False) -> EcDomain:
    return EcDomain(spec, log_n, inverse)


def _ec_fft_impl(dom: EcDomain, P):
    """Constant-geometry radix-2 group FFT; P is a Jacobian pytree batch (n,).

    Stage s: (a, b) = halves; u = a + b; v = [w^((i>>s)<<s)] (a - b);
    interleave.  Natural order in and out (ark Radix2EvaluationDomain
    convention the reference tests against, ag-cuda-ec/src/ec_fft.rs:121).
    """
    ops = dom.ops
    n, log_n = dom.n, dom.log_n
    if log_n == 0:
        return P
    tw = jnp.asarray(dom.twiddle_scalars)
    half_idx = jnp.arange(n // 2, dtype=jnp.uint32)

    def stage(s, Y):
        a = jax.tree_util.tree_map(lambda l: l[: n // 2], Y)
        b = jax.tree_util.tree_map(lambda l: l[n // 2 :], Y)
        e = (half_idx >> s) << s
        k = tw[e]  # (n/2, Ls) plain scalars
        u = ops.add(a, b)
        v = ops.scalar_mul(ops.sub(a, b), k)
        return jax.tree_util.tree_map(
            lambda lu, lv: jnp.stack([lu, lv], axis=1).reshape((n,) + lu.shape[1:]),
            u, v,
        )

    Y = jax.lax.fori_loop(0, log_n, stage, P)
    rev = jnp.asarray(dom._rev)
    return jax.tree_util.tree_map(lambda l: l[rev], Y)


class EcFftKernel:
    """EC-FFT driver (EcFftKernel parity, ec-gpu-proxy/src/ec_fft.rs:164-280).

    ``radix_ec_fft`` transforms one Jacobian batch; ``radix_ec_fft_many``
    maps over a list/batch (the multi-GPU chunking analog, ec_fft.rs:241-279);
    ``maybe_abort`` is polled between jitted calls (ec_fft.rs:100-104)."""

    def __init__(self, spec: CurveSpec, maybe_abort=None):
        self.spec = spec
        self.ops = point_ops(spec)
        self.maybe_abort = maybe_abort
        self._jitted = {}

    def _check_abort(self):
        if self.maybe_abort is not None and self.maybe_abort():
            raise Aborted("EC-FFT aborted by hook")

    def _fn(self, log_n: int, inverse: bool):
        key = (log_n, inverse)
        if key not in self._jitted:
            dom = get_ec_domain(self.spec, log_n, inverse)
            # build tables OUTSIDE the trace (tracer-leak hazard otherwise)
            dom.field_domain.materialize()
            _ = dom.twiddle_scalars, dom.n_inv_scalar
            ops = self.ops

            @jax.jit
            def run(P):
                Y = _ec_fft_impl(dom, P)
                if inverse:
                    n = 1 << log_n
                    k = jnp.broadcast_to(jnp.asarray(dom.n_inv_scalar), (n, ops.fr.L))
                    Y = ops.scalar_mul(Y, k)
                return Y

            self._jitted[key] = run
        return self._jitted[key]

    def radix_ec_fft(self, P, inverse: bool = False):
        n = jax.tree_util.tree_leaves(P)[0].shape[0]
        log_n = int(n).bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("EC-FFT size must be a power of two")
        self._check_abort()
        return self._fn(log_n, inverse)(P)

    def radix_ec_fft_many(self, Ps, inverse: bool = False):
        """Batched transform (multi-GPU chunking analog, ec_fft.rs:241-279).

        A list of same-length Jacobian batches is stacked and transformed
        under ONE vmapped jit (the whole batch rides a single dispatch);
        ragged lists fall back to a per-entry loop with abort polling."""
        # NB: a list means "many transforms"; a (X, Y, Z) TUPLE is one
        # stacked batch (leaves (B, n, L)) — do not treat tuples as lists.
        if isinstance(Ps, list):
            lens = {jax.tree_util.tree_leaves(P)[0].shape[0] for P in Ps}
            if len(lens) != 1:
                out = []
                for P in Ps:
                    self._check_abort()
                    out.append(self.radix_ec_fft(P, inverse))
                return out
            stacked = jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls, axis=0), *Ps
            )
            res = self.radix_ec_fft_many(stacked, inverse)
            b = len(Ps)
            return [
                jax.tree_util.tree_map(lambda l: l[i], res) for i in range(b)
            ]
        self._check_abort()
        n = jax.tree_util.tree_leaves(Ps)[0].shape[1]
        log_n = int(n).bit_length() - 1
        key = ("many", log_n, inverse)
        if key not in self._jitted:
            fn = self._fn(log_n, inverse)
            self._jitted[key] = jax.jit(jax.vmap(fn))
        return self._jitted[key](Ps)


def radix_ec_fft(spec: CurveSpec, P, inverse: bool = False):
    """Functional entry point (ag-cuda-ec/src/ec_fft.rs:12 parity)."""
    return EcFftKernel(spec).radix_ec_fft(P, inverse)
