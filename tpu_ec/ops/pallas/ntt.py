"""Pallas NTT: fused butterfly-stage kernel + plane-layout driver.

TPU-native counterpart of the generated radix-2^deg FFT kernel
(`ag-build/cl/fft.cl:4-68`) and its host round loop
(`ec-gpu-proxy/src/fft.rs:93-127`).  Structure:

- Same constant-geometry (Pease) stage dataflow as the jnp path
  (ops/ntt.py `_ntt_impl`): stage s reads halves (a, b), writes the
  interleaved [a+b, (a-b)*w^((i>>s)<<s)].  Bit-exact equal by construction.
- The butterfly arithmetic (one add, one sub, one Montgomery mul) runs as a
  single Pallas kernel per stage — one HBM round trip, all limb arithmetic
  VMEM-resident in the (L, N) plane layout (ops/pallas/mont.py).
- Stage twiddles are never materialized per stage as an (n/2) table: the
  Pease exponent (i>>s)<<s is piecewise-constant on runs of 2^s, so the
  stage vector is a strided slice of the master w^j table broadcast in
  registers (replaces the pow_lookup + running-product twiddle phase of
  fft.cl:40-45).
- The stage interleave and the final bit-reversal stay in XLA (pure data
  movement; the DeviceParam::swap_device_pointer ping-pong of
  ec_fft.rs:93 is XLA's buffer assignment here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...fields.params import FieldSpec
from ..ntt import Domain, get_domain
from .mont import DEFAULT_BLOCK, PlaneField, from_planes, to_planes


@functools.lru_cache(maxsize=None)
def _butterfly_call(spec: FieldSpec, n_half: int, block: int, interpret: bool):
    """Kernel: (a, b, tw) -> (a + b, (a - b) * tw), all (L, n_half) planes."""
    pf = PlaneField(spec)
    L = pf.L

    def kernel(p_ref, np_ref, a_ref, b_ref, tw_ref, u_ref, v_ref):
        p = p_ref[:]
        a, b = a_ref[:], b_ref[:]
        u_ref[:] = pf.add(a, b, p)
        v_ref[:] = pf.mul(pf.sub(a, b, p), tw_ref[:], p, np_ref[:])

    grid = (n_half // block,)
    bspec = pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n_half), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=grid,
        in_specs=[cspec, cspec, bspec, bspec, bspec],
        out_specs=(bspec, bspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n_half) * (3 * L * L * 2 + 40 * L),
            bytes_accessed=5 * n_half * L * 4,
            transcendentals=0,
        ),
    )


class PallasFftKernel:
    """Plane-layout NTT driver; bit-exact with ops.ntt.FftKernel.

    ``radix_fft`` takes/returns the library's (n, L) layout (converts at the
    boundary); ``radix_fft_planes`` works on resident (L, n) planes for
    zero-copy chaining inside pipelines.
    """

    def __init__(self, spec: FieldSpec, block: int = DEFAULT_BLOCK, interpret: bool | None = None):
        self.spec = spec
        self.block = block
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self.pf = PlaneField(spec)
        self._jitted = {}

    def _stage_twiddles(self, dom: Domain, s: int) -> jnp.ndarray:
        """(L, n/2) stage-s twiddle plane via strided-slice + broadcast."""
        tw = to_planes(jnp.asarray(dom.twiddles))  # (L, n/2) master table
        L, half = tw.shape
        step = 1 << s
        small = tw[:, ::step]  # w^(j*2^s)
        return jnp.broadcast_to(
            small[:, :, None], (L, half // step, step)
        ).reshape(L, half)

    def _fn(self, log_n: int, inverse: bool, donate: bool = False):
        key = (log_n, inverse, donate)
        donate_kw = {"donate_argnums": (0,)} if donate else {}
        if key not in self._jitted:
            from ...config import get_config

            if log_n > 9 and get_config().ntt_impl == "digit":
                # MXU digit-matmul path (ops/ntt_digit.py): leaf NTTs as
                # int8 matmuls + fused wide-Montgomery inter twiddles —
                # the r4 default, ~2.4x the fused VPU path at 2^20
                from ..ntt_digit import (
                    digit_consts,
                    digit_ntt_planes,
                    get_digit_domain,
                )

                leaf = min(get_config().ntt_digit_leaf_log, log_n)
                ddom = get_digit_domain(self.spec, log_n, inverse, leaf)
                dconsts = jax.tree_util.tree_map(
                    jax.device_put, digit_consts(ddom)
                )
                spec, interp = self.spec, self.interpret

                @jax.jit
                def run_digit(xp, c):
                    return digit_ntt_planes(
                        spec, xp, inverse, leaf=leaf, consts=c,
                        interpret=interp,
                    )

                self._jitted[key] = lambda xp: run_digit(xp, dconsts)
                return self._jitted[key]
            if log_n > 9:
                # fused multi-stage path: radix-2^LEAF leaves, one HBM round
                # trip per recursion level (ops/pallas/ntt_fused.py)
                from .ntt_fused import fused_ntt_planes, get_fused_domain

                dom = get_fused_domain(self.spec, log_n, inverse)
                # inter-level twiddles stay device-resident and enter the jit
                # as runtime args — baked literals overflow compile-request
                # size limits at 2^22+ (n*L*4 bytes of table per level)
                inter = {
                    k: jax.device_put(jnp.asarray(v))
                    for k, v in dom._inter_tw.items()
                }
                spec, interp = self.spec, self.interpret

                @functools.partial(jax.jit, **donate_kw)
                def run_fused(xp, inter):
                    return fused_ntt_planes(
                        spec, xp, inverse, interpret=interp, inter=inter
                    )

                self._jitted[key] = lambda xp: run_fused(xp, inter)
                return self._jitted[key]
            dom = get_domain(self.spec, log_n, inverse).materialize()
            n = 1 << log_n
            L = self.pf.L
            bf = _butterfly_call(self.spec, n // 2, min(self.block, n // 2), self.interpret)

            def run(xp):  # (L, n) planes
                # all jnp constants are created INSIDE the traced function
                # (from cached numpy) so nothing trace-bound leaks into caches
                rev = jnp.asarray(dom._rev)
                pc, nc = self.pf.consts()
                y = xp
                for s in range(log_n):
                    a, b = y[:, : n // 2], y[:, n // 2 :]
                    tw = self._stage_twiddles(dom, s)
                    u, v = bf(pc, nc, a, b, tw)
                    y = jnp.stack([u, v], axis=-1).reshape(L, n)
                y = y[:, rev]
                if inverse:
                    from .mont import mont_mul_planes

                    ninv = jnp.broadcast_to(
                        jnp.asarray(np.asarray(dom.n_inv, np.uint32))[:, None], (L, n)
                    )
                    y = mont_mul_planes(
                        self.spec, y, ninv, block=self.block, interpret=self.interpret
                    )
                return y

            self._jitted[key] = jax.jit(run, **donate_kw)
        return self._jitted[key]

    def radix_fft_planes(
        self, xp: jax.Array, inverse: bool = False, *, donate: bool = False
    ) -> jax.Array:
        """NTT over (L, n) planes.  ``donate=True`` donates the input buffer
        to XLA (DeviceParam::swap_device_pointer parity,
        ag-cuda-proxy/src/params.rs:141-163): at 2^26 this halves the
        transform's HBM watermark.  The caller's ``xp`` is consumed —
        only pass arrays you will not reuse."""
        n = xp.shape[1]
        log_n = int(n).bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("FFT size must be a power of two")
        return self._fn(log_n, inverse, donate)(xp)

    def radix_fft(self, x: jax.Array, inverse: bool = False) -> jax.Array:
        return from_planes(self.radix_fft_planes(to_planes(x), inverse))
