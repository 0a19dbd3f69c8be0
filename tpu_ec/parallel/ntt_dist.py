"""Multi-chip NTT: the four-step (three-transpose) factorization over a mesh.

The reference cannot split one FFT across devices — only *batches* of
independent FFTs are distributed (`ec-gpu-proxy/src/fft.rs:211-246`), and a
single transform is capped by one GPU's memory.  Here a single length-N NTT
is sharded across the mesh with the classic four-step scheme:

  N = N1 * N2, input x viewed as A[j1, j2] (row-major, j = j1*N2 + j2):
    1. column DFTs of length N1 (root w^N2)        — local after a2a #1
    2. twiddle multiply by w^(k1*j2)               — local, sharded table
    3. row DFTs of length N2 (root w^N1)           — local after a2a #2
    4. output X[k1 + N1*k2] = Z[k1, k2]            — natural order after a2a #3

All three "transposes" are single `lax.all_to_all` collectives riding ICI —
the TPU-native replacement for the reference's host-mediated combining.
Local DFTs reuse the single-chip constant-geometry kernel (ops/ntt.py).

Outputs match `ark_poly` natural-order convention bit-exactly (same contract
the single-chip path tests against).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.fp import field_ops
from ..fields.params import FieldSpec, int_to_limbs
from ..ops.ntt import Domain, _ntt_impl, get_domain



class DistDomain:
    """Factorized domain for one (field, log_n, mesh): local sub-domains for
    the two DFT passes plus the inter-pass twiddle table, built on device
    once and kept sharded column-wise (the pq/omegas precompute of
    fft.rs:64-87, lifted to the factorized form)."""

    def __init__(self, spec: FieldSpec, log_n: int, mesh: Mesh, inverse: bool = False):
        d = mesh.devices.size
        log_d = d.bit_length() - 1
        if 1 << log_d != d:
            raise ValueError("mesh size must be a power of two")
        log_n1 = log_n // 2
        log_n2 = log_n - log_n1
        if min(log_n1, log_n2) < log_d:
            raise ValueError(
                f"2^{log_n} too small to factor over {d} devices (need both "
                f"factors >= {d})"
            )
        self.spec = spec
        self.f = field_ops(spec)
        self.mesh = mesh
        self.inverse = inverse
        self.log_n, self.n = log_n, 1 << log_n
        self.n1, self.n2 = 1 << log_n1, 1 << log_n2
        self.d = d
        # sub-domains: column DFT root w^n2 (order n1), row DFT root w^n1
        self.dom1 = get_domain(spec, log_n1, inverse)
        self.dom2 = get_domain(spec, log_n2, inverse)
        p = spec.modulus
        omega = pow(spec.root_of_unity, 1 << (spec.two_adicity - log_n), p)
        if inverse:
            omega = pow(omega, p - 2, p)
        self.omega = omega

    @functools.cached_property
    def n_inv(self) -> np.ndarray:
        return self.f.constant(pow(self.n, -1, self.spec.modulus))

    @functools.cached_property
    def twiddles(self) -> jax.Array:
        """(n1, n2, L) table T[k1, j2] = w^(k1*j2) in Montgomery form,
        sharded over j2 (columns).  Built eagerly in numpy (trace-immune,
        see Domain.twiddles) by log-depth row doubling — rows [2^t, 2^(t+1))
        = rows [0, 2^t) * row(w^(2^t * j2)) — n Montgomery muls one-time."""
        from ..fields.bigint import np_mont_mul
        from ..ops.ntt import twiddle_table_np

        spec, L = self.spec, self.f.L
        n1, n2 = self.n1, self.n2
        step = twiddle_table_np(spec, self.omega, n2.bit_length() - 1)  # w^j2
        table = np.broadcast_to(
            int_to_limbs(spec.one, L).astype(np.uint32), (1, n2, L)
        ).copy()
        for _ in range(n1.bit_length() - 1):
            grown = np_mont_mul(
                spec, table.reshape(-1, L), np.tile(step, (table.shape[0], 1))
            ).reshape(table.shape)
            table = np.concatenate([table, grown], axis=0)
            step = np_mont_mul(spec, step, step)
        sharding = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
        return jax.device_put(jnp.asarray(table), sharding)


@functools.lru_cache(maxsize=16)
def _get_dist_domain(spec: FieldSpec, log_n: int, mesh: Mesh, inverse: bool):
    return DistDomain(spec, log_n, mesh, inverse)


def _use_digit_local(log_n1: int, log_n2: int) -> bool:
    """Route BOTH local DFT stages to the MXU digit-matmul kernel
    (ops/ntt_digit.py) — all-or-nothing so the inverse scale stays simple
    (each digit sub-transform folds its own n_i^{-1}; the product is the
    full n^{-1}, replacing the explicit final scale).  CPU backends keep
    the compile-light Pease loop (no Pallas compiler there) unless the
    ``ntt_digit_on_cpu`` test hatch forces interpret mode."""
    from ..config import get_config

    cfg = get_config()
    if cfg.ntt_impl != "digit":
        return False
    if jax.default_backend() == "cpu":
        # interpret mode: only under the test hatch (any size — tests use
        # tiny shapes; real CPU runs never route here)
        return cfg.ntt_digit_on_cpu
    return min(log_n1, log_n2) > 9


def _local_ntt_batch(dom: DistDomain, sub, digit, y: jax.Array, axis: int):
    """Length-m DFTs along ``axis`` of y (the other axis is the batch),
    via ONE batched digit-matmul program (digit=(leaf, consts, interpret))
    or the vmapped Pease loop."""
    if digit is None:
        return jax.vmap(
            lambda v: _ntt_impl(sub, v), in_axes=1 - axis, out_axes=1 - axis
        )(y)
    from ..ops.ntt_digit import digit_ntt_planes_batch

    leaf, consts, interpret = digit
    xpb = jnp.moveaxis(y, (2, axis), (0, 1))  # (L, m, B)
    out = digit_ntt_planes_batch(
        dom.spec, xpb, dom.inverse, leaf=leaf, consts=consts,
        interpret=interpret,
    )
    return jnp.moveaxis(out, (0, 1), (2, axis))


def _dist_ntt_shard(
    dom: DistDomain, x_loc: jax.Array, tw_loc: jax.Array, digit=(None, None)
):
    """shard_map body: x_loc is the (n1/d, n2, L) row-slice of A, tw_loc the
    (n1, n2/d, L) column-slice of the twiddle table.  ``digit`` carries the
    per-stage (leaf, consts, interpret) tuples when the local DFTs run on
    the digit-matmul kernel (None = Pease loop)."""
    f = dom.f
    n1, n2, d = dom.n1, dom.n2, dom.d
    AXIS = dom.mesh.axis_names[0]
    d1, d2 = digit

    # a2a #1: shard columns instead of rows -> (n1, n2/d, L)
    y = jax.lax.all_to_all(x_loc, AXIS, split_axis=1, concat_axis=0, tiled=True)
    # column DFTs (length n1) over axis 0, batched over local columns
    y = _local_ntt_batch(dom, dom.dom1, d1, y, axis=0)
    # twiddle w^(k1*j2)
    y = f.mul(y, tw_loc)
    # a2a #2: shard rows again -> (n1/d, n2, L)
    y = jax.lax.all_to_all(y, AXIS, split_axis=0, concat_axis=1, tiled=True)
    # row DFTs (length n2) over axis 1
    z = _local_ntt_batch(dom, dom.dom2, d2, y, axis=1)
    # a2a #3 + local transpose: natural order, contiguous shard of X
    z = jax.lax.all_to_all(z, AXIS, split_axis=1, concat_axis=0, tiled=True)
    out = jnp.swapaxes(z, 0, 1)  # (n2/d, n1, L): X[k2_loc, k1]
    out = out.reshape(-1, f.L)
    if dom.inverse and d1 is None:
        # Pease path: sub-transforms are unscaled, apply n^{-1} once here.
        # Digit path: n1^{-1} and n2^{-1} are already folded into the two
        # stages' final-cleanup constants (product = n^{-1}).
        out = f.mul(out, jnp.broadcast_to(jnp.asarray(dom.n_inv), out.shape))
    return out


class DistFftKernel:
    """Sharded-NTT driver: one length-n transform split across the mesh
    (the capability step beyond FftKernel::radix_fft_many, which only
    round-robins whole transforms, fft.rs:211-246)."""

    def __init__(self, spec: FieldSpec, mesh: Mesh):
        self.spec = spec
        self.f = field_ops(spec)
        self.mesh = mesh
        self._jitted = {}

    def _fn(self, log_n: int, inverse: bool, donate: bool = False):
        key = (log_n, inverse, donate)
        if key not in self._jitted:
            dom = _get_dist_domain(self.spec, log_n, self.mesh, inverse)
            dom.dom1.materialize()  # sub-domain tables must be concrete
            dom.dom2.materialize()  # before the shard_map trace touches them
            _ = dom.n_inv
            tw = dom.twiddles
            AXIS = self.mesh.axis_names[0]

            log_n1 = dom.n1.bit_length() - 1
            log_n2 = dom.n2.bit_length() - 1
            digit_consts_args = None
            leaves = (None, None)
            if _use_digit_local(log_n1, log_n2):
                # local DFT stages on the digit-matmul kernel: build both
                # sub-domains' tables OUTSIDE the trace and feed them as
                # runtime args (baked literals overflow compile-request
                # limits at scale — same policy as ops/pallas/ntt.py)
                from ..config import get_config
                from ..ops.ntt_digit import digit_consts, get_digit_domain

                lf = get_config().ntt_digit_leaf_log
                leaves = (min(lf, log_n1), min(lf, log_n2))
                dc = tuple(
                    jax.tree_util.tree_map(
                        jax.device_put,
                        digit_consts(
                            get_digit_domain(self.spec, ln, inverse, leaf)
                        ),
                    )
                    for ln, leaf in ((log_n1, leaves[0]), (log_n2, leaves[1]))
                )
                digit_consts_args = dc
            interp = jax.default_backend() == "cpu"

            # donate_argnums: the 2^26 input shard need not coexist with
            # the output (swap_device_pointer parity, params.rs:141-163)
            @functools.partial(
                jax.jit, **({"donate_argnums": (0,)} if donate else {})
            )
            def run_jit(x, dc):
                x2 = x.reshape(dom.n1, dom.n2, self.f.L)

                def body(x_loc, tw_loc, dc_):
                    digit = (
                        (None, None)
                        if dc_ is None
                        else tuple(
                            (leaves[i], dc_[i], interp) for i in (0, 1)
                        )
                    )
                    return _dist_ntt_shard(dom, x_loc, tw_loc, digit)

                out = shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(AXIS, None, None), P(None, AXIS, None), P()),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )(x2, tw, dc)
                return out.reshape(dom.n, self.f.L)

            run = lambda x: run_jit(x, digit_consts_args)  # noqa: E731
            self._jitted[key] = (run, dom)
        return self._jitted[key]

    def radix_fft(
        self, x: jax.Array, inverse: bool = False, *, donate: bool = False
    ) -> jax.Array:
        n = x.shape[0]
        log_n = int(n).bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("size must be a power of two")
        fn, _ = self._fn(log_n, inverse, donate)
        return fn(x)
