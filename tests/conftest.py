"""Test configuration: run on CPU with 8 virtual devices.

The reference cannot test multi-GPU without hardware (SURVEY.md §4); here the
multi-chip path is exercised on a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count`` so sharding logic is covered in CI
without a pod.  Real-TPU runs use the driver's bench harness instead.

The ambient environment points JAX at the real TPU tunnel (single-tenant)
and its sitecustomize imports jax at interpreter startup, so env vars are
too late — the platform override must go through ``jax.config`` after
import.  The XLA flag still works because backends initialize lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from tpu_ec.utils.cache import enable_compilation_cache

enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0xEC)
