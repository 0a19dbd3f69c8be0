"""Multi-chip MSM: points sharded per chip, on-fabric partial combination.

The reference splits one MSM's input across GPUs and sums the per-GPU
partial results **on the host** (`ec-gpu-proxy/src/multiexp.rs:324-400`,
final sum at :392-399).  Here the split is a `shard_map` over the mesh
leading axis; each chip runs the single-chip bucket-lattice kernel
(ops/msm.py) on its shard and the partials are combined on-fabric: an
`all_gather` of the (tiny) per-chip Jacobian partials followed by a local
log-depth tree reduction — the collective replacement for the host loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.params import CurveSpec
from ..curves.point import point_ops
from ..ops import msm as msm_mod
from .mesh import AXIS


class DistMultiexpKernel:
    """Sharded MSM driver (MultiexpKernel::multiexp multi-GPU parity)."""

    def __init__(self, spec: CurveSpec, mesh: Mesh):
        self.spec = spec
        self.ops = point_ops(spec)
        self.mesh = mesh
        self._jitted = {}

    def _fn(self, m: int, G: int, w: int, signed: bool):
        key = (m, G, w, signed)
        if key not in self._jitted:
            ops = self.ops
            d = self.mesh.devices.size

            def body(points, scalars):
                # local shard: leaves (m/d, G, ...) — one lattice MSM
                part = msm_mod._msm_lattice(
                    ops, points, scalars, window_size=w, signed=signed
                )  # Jacobian batch (1,)
                gathered = jax.tree_util.tree_map(
                    lambda l: jax.lax.all_gather(l, AXIS, axis=0, tiled=True),
                    part,
                )  # (d,)
                # log-depth tree sum of the d partials, replicated result
                g = d
                acc = gathered
                while g > 1:
                    lo = jax.tree_util.tree_map(lambda l: l[: g // 2], acc)
                    hi = jax.tree_util.tree_map(lambda l: l[g // 2 : g], acc)
                    acc = ops.add(lo, hi)
                    g //= 2
                return jax.tree_util.tree_map(lambda l: l[:1], acc)

            @jax.jit
            def run(points, scalars):
                return shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(AXIS), P(AXIS)),
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
        num_groups: int | None = None,
        signed: bool = True,
    ):
        """sum_i scalars[i] * bases[i] across the whole mesh.

        Shards the (m, G) lattice's m axis: points are laid out so that
        device d owns lattice rows [d*m/D, (d+1)*m/D) — each device's shard
        is a contiguous slab after `prepare_inputs`."""
        d = self.mesh.devices.size
        n = jax.tree_util.tree_leaves(bases)[0].shape[0]
        n_loc = -(-n // d)
        w = window_size or msm_mod.default_window_size(n_loc)
        G = num_groups or msm_mod.default_num_groups(n_loc, w)
        kern = msm_mod.MultiexpKernel(self.spec)
        # pad n to d * ceil(...) * G so every device gets equal (m/d, G) slabs
        points, s, m = kern.prepare_inputs(bases, scalars, G)
        if m % d:
            pad = d - (m % d)
            points = jax.tree_util.tree_map(
                lambda l: jnp.concatenate(
                    [l, jnp.zeros((pad,) + l.shape[1:], l.dtype)], axis=0
                ),
                points,
            )
            s = jnp.concatenate(
                [s, jnp.zeros((pad,) + s.shape[1:], s.dtype)], axis=0
            )
            m += pad
        return self._fn(m, G, w, signed)(points, s)
