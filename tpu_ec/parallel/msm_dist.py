"""Multi-chip MSM: points sharded per chip, on-fabric partial combination.

The reference splits one MSM's input across GPUs and sums the per-GPU
partial results **on the host** (`ec-gpu-proxy/src/multiexp.rs:324-400`,
final sum at :392-399).  Here the split is a `shard_map` over the mesh
leading axis; each chip runs the single-chip sorted-engine MSM
(ops/msm_sorted.py) on its shard and the partials are combined on-fabric: an
`all_gather` of the (tiny) per-chip Jacobian partials followed by a local
log-depth tree reduction — the collective replacement for the host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.params import CurveSpec
from ..curves.point import point_ops
from ..ops.msm_sorted import default_window_size_sorted, msm_sorted


tmap = jax.tree_util.tree_map


class DistMultiexpKernel:
    """Sharded MSM driver (MultiexpKernel::multiexp multi-GPU parity)."""

    def __init__(self, spec: CurveSpec, mesh: Mesh):
        self.spec = spec
        self.ops = point_ops(spec)
        self.mesh = mesh
        self._jitted = {}

    def _fn(self, n: int, w: int):
        key = (n, w)
        if key not in self._jitted:
            ops = self.ops
            d = self.mesh.devices.size
            ax = self.mesh.axis_names[0]

            def body(points, scalars):
                # local shard: leaves (n/d, ...) — one sorted-engine MSM
                part = msm_sorted(ops, points, scalars, window_size=w)
                gathered = tmap(
                    lambda l: jax.lax.all_gather(l, ax, axis=0, tiled=True),
                    part,
                )  # (d,)
                # log-depth tree sum of the d partials, replicated result
                g = d
                acc = gathered
                while g > 1:
                    lo = tmap(lambda l: l[: g // 2], acc)
                    hi = tmap(lambda l: l[g // 2 : g], acc)
                    acc = ops.add(lo, hi)
                    g //= 2
                return tmap(lambda l: l[:1], acc)

            @jax.jit
            def run(points, scalars):
                return shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(ax), P(ax)),
                    out_specs=P(),
                    check_vma=False,
                )(points, scalars)

            self._jitted[key] = run
        return self._jitted[key]

    def multiexp(
        self,
        bases,
        scalars: jnp.ndarray,
        *,
        window_size: int | None = None,
    ):
        """sum_i scalars[i] * bases[i] across the whole mesh.

        ``bases`` is an affine pytree batch, ``scalars`` a (n, Ls) plain-int
        limb batch.  n is padded with (identity, 0) pairs to a multiple of
        the mesh size; device k owns the contiguous slab [k*n/d, (k+1)*n/d)."""
        d = self.mesh.devices.size
        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        pad = (-n) % d
        if pad:
            bases = tmap(
                lambda l: jnp.concatenate(
                    [l, jnp.zeros((pad,) + l.shape[1:], l.dtype)], axis=0
                ),
                bases,
            )
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((pad,) + scalars.shape[1:], scalars.dtype)],
                axis=0,
            )
            n += pad
        # one zero limb for cross-limb window extraction (msm.make_digits)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)],
            axis=-1,
        )
        w = window_size or default_window_size_sorted(n // d)
        return self._fn(n, w)(bases, scalars)
