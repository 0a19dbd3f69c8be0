"""Device-mesh helpers for the distributed ops.

The reference's "multi-device" story is host threads round-robining work to
per-GPU contexts and summing on the host (`ec-gpu-proxy/src/fft.rs:211-246`,
`multiexp.rs:324-400`).  The TPU-native replacement is a
`jax.sharding.Mesh` + `shard_map`, with on-fabric collectives
(all_to_all / ppermute over ICI) instead of host-mediated combining.

One 1-D axis (config ``mesh_axis``, default "shards") covers this library's
needs: both NTT and MSM shard the *problem* dimension (element index / point
index), the analog of the reference chunking inputs across GPUs.

Degraded-startup policy (A3 parity): the reference logs-and-skips devices
whose kernel fails to build, erroring only when zero remain ("No working
GPUs found!", fft.rs:169-186, multiexp.rs:288-307).  :func:`make_mesh` does
the TPU edition: when fewer devices than requested are usable it falls back
to the largest power-of-two subset >= ``Config.min_devices`` with a warning,
and raises :class:`~tpu_ec.errors.DeviceError` only when nothing works.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import DeviceError


def axis_name() -> str:
    from ..config import get_config

    return get_config().mesh_axis


# Backwards-compatible module constant: the default axis name.  Drivers that
# support renamed axes call axis_name(); the constant remains for specs built
# at import time.
AXIS = "shards"


def _probe(dev) -> bool:
    """True if the device executes a trivial program (the 'kernel builds'
    check of fft.rs:169-186, TPU edition)."""
    try:
        x = jax.device_put(np.ones((1,), np.uint32), dev)
        jax.block_until_ready(x + x)
        return True
    except Exception:  # noqa: BLE001 — any failure marks the device bad
        return False


def make_mesh(devices=None, *, want: int | None = None, probe: bool = False) -> Mesh:
    """1-D mesh over the given (or all) devices.

    ``want``: desired device count; if fewer are usable, fall back to the
    largest power-of-two subset (>= config ``min_devices``) with a warning.
    ``probe=True`` additionally runs a tiny program per device and skips
    devices that fail (degraded startup, fft.rs:169-186 parity).
    """
    from ..config import get_config
    from ..utils.log import get_logger

    log = get_logger("tpu_ec.parallel")
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if probe:
        ok = [d for d in devices if _probe(d)]
        for d in devices:
            if d not in ok:
                log.error("device %s failed probe; skipping", d)
        devices = ok
    if not devices:
        raise DeviceError("No working TPU devices found!")
    if want is not None and len(devices) < want:
        # degrade to the largest power-of-two subset
        usable = 1 << (len(devices).bit_length() - 1)
        if usable < get_config().min_devices:
            raise DeviceError(
                f"only {len(devices)} usable devices; "
                f"min_devices={get_config().min_devices}"
            )
        log.warning(
            "requested %d devices, only %d usable; degrading to %d",
            want, len(devices), usable,
        )
        devices = devices[:usable]
    elif want is not None:
        devices = devices[:want]
    log.info("mesh over %d device(s): %s", len(devices),
             ", ".join(str(d) for d in devices[:8]))
    return Mesh(np.array(devices), (axis_name(),))


def shard_leading(mesh: Mesh):
    """NamedSharding that splits the leading axis across the mesh."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
