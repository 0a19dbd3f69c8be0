"""Multi-chip EC-FFT: transform batches sharded across the mesh.

The reference distributes *batches* of independent EC-FFTs across GPUs via
host threads (`ec-gpu-proxy/src/ec_fft.rs:241-279` — round-robin whole
problems, first-error-wins).  Here the batch axis is a `shard_map` over the
mesh: each chip runs the vmapped single-chip transform on its slab of
transforms; no collectives are needed (the problems are independent), so
scaling is embarrassingly parallel exactly like the reference's multi-GPU
path — but testable without hardware on the virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.params import CurveSpec
from ..ops.ec_fft import EcFftKernel, get_ec_domain, _ec_fft_impl
from ..curves.point import point_ops

tmap = jax.tree_util.tree_map


class DistEcFftKernel:
    """Sharded batched EC-FFT driver (EcFftKernel::radix_ec_fft_many
    multi-GPU parity, ec_fft.rs:241-279)."""

    def __init__(self, spec: CurveSpec, mesh: Mesh):
        self.spec = spec
        self.ops = point_ops(spec)
        self.mesh = mesh
        self._jitted = {}

    def _fn(self, log_n: int, inverse: bool):
        key = (log_n, inverse)
        if key not in self._jitted:
            dom = get_ec_domain(self.spec, log_n, inverse)
            dom.field_domain.materialize()
            _ = dom.twiddle_scalars, dom.n_inv_scalar
            ops = self.ops
            ax = self.mesh.axis_names[0]

            def one(Pb):
                Y = _ec_fft_impl(dom, Pb)
                if inverse:
                    n = 1 << log_n
                    k = jnp.broadcast_to(
                        jnp.asarray(dom.n_inv_scalar), (n, ops.fr.L)
                    )
                    Y = ops.scalar_mul(Y, k)
                return Y

            def body(Ps):  # local slab: leaves (B/d, n, L)
                return jax.vmap(one)(Ps)

            @jax.jit
            def run(Ps):
                return shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(ax),),
                    out_specs=P(ax),
                    check_vma=False,
                )(Ps)

            self._jitted[key] = run
        return self._jitted[key]

    def radix_ec_fft_many(self, Ps, inverse: bool = False):
        """Stacked Jacobian batch (leaves (B, n, L)) -> same shape, each of
        the B transforms computed on the chip owning its slab.  B must be a
        multiple of the mesh size (pad with identity rows if needed)."""
        d = self.mesh.devices.size
        B = jax.tree_util.tree_leaves(Ps)[0].shape[0]
        pad = (-B) % d
        if pad:
            Ps = tmap(
                lambda l: jnp.concatenate(
                    [l, jnp.zeros((pad,) + l.shape[1:], l.dtype)], axis=0
                ),
                Ps,
            )
        n = jax.tree_util.tree_leaves(Ps)[0].shape[1]
        log_n = int(n).bit_length() - 1
        if 1 << log_n != n:
            raise ValueError("EC-FFT size must be a power of two")
        out = self._fn(log_n, inverse)(Ps)
        if pad:
            out = tmap(lambda l: l[:B], out)
        return out
