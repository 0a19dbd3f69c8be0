"""Device-mesh helpers for the distributed ops.

The reference's "multi-device" story is host threads round-robining work to
per-GPU contexts and summing on the host (`ec-gpu-proxy/src/fft.rs:211-246`,
`multiexp.rs:324-400`).  The TPU-native replacement is a
`jax.sharding.Mesh` + `shard_map`, with on-fabric collectives
(all_to_all / ppermute over ICI) instead of host-mediated combining.

One 1-D axis named "shards" covers this library's needs: both NTT and MSM
shard the *problem* dimension (element index / point index), the analog of
the reference chunking inputs across GPUs.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shards"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def shard_leading(mesh: Mesh):
    """NamedSharding that splits the leading axis across the mesh."""
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
