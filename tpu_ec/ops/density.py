"""Sparsity tracking for R1CS-style MSMs.

Port-equivalent of the reference's density machinery
(`ec-gpu-proxy/src/multiexp_cpu.rs:85-207`): `QueryDensity` /
`FullDensity` / `DensityTracker` let a prover skip bases whose scalars are
structurally zero, and `Source`-style (bases, skip) streaming
(multiexp_cpu.rs:16-83) lets one big base buffer serve several queries.

TPU-native framing: instead of driving a serial iterator, the density mask
compacts the (bases, scalars) arrays host/device-side once (boolean gather)
and hands the dense remainder to the vectorized MSM — sparsity becomes a
pre-pass, not a per-element branch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class FullDensity:
    """Marker: every term present (multiexp_cpu.rs:97-116)."""

    def get_query_size(self) -> int | None:
        return None

    def generate_mask(self, n: int) -> np.ndarray:
        return np.ones(n, dtype=bool)


@dataclasses.dataclass
class DensityTracker:
    """Bitmask of touched terms (multiexp_cpu.rs:130-207)."""

    bv: list = dataclasses.field(default_factory=list)
    total_density: int = 0

    def add_element(self) -> None:
        self.bv.append(False)

    def inc(self, idx: int) -> None:
        if not self.bv[idx]:
            self.bv[idx] = True
            self.total_density += 1

    def get_query_size(self) -> int:
        return len(self.bv)

    def get_total_density(self) -> int:
        return self.total_density

    def extend(self, other: "DensityTracker", is_input_density: bool) -> None:
        """Merge two trackers (multiexp_cpu.rs:160-206): input densities of
        the merged system OR together index 0 (the constant-one variable),
        aux densities concatenate."""
        if not self.bv:
            self.bv = list(other.bv)
            self.total_density = other.total_density
            return
        if is_input_density:
            if other.bv:
                if other.bv[0] and not self.bv[0]:
                    self.bv[0] = True
                    self.total_density += 1
                for b in other.bv[1:]:
                    self.bv.append(b)
                    self.total_density += int(b)
        else:
            for b in other.bv:
                self.bv.append(b)
                self.total_density += int(b)

    def generate_mask(self, n: int) -> np.ndarray:
        assert n == len(self.bv), "density length mismatch"
        return np.asarray(self.bv, dtype=bool)


def compact_by_density(density, bases, scalars, skip: int = 0):
    """Apply a density query to (bases, scalars): gather only the touched
    terms (the TPU pre-pass replacing the reference's skipping iterator;
    ``skip`` is the bases offset convention of multiexp.rs:376-378).

    Returns (bases', scalars') dense pytrees ready for MultiexpKernel."""
    n = scalars.shape[0]
    mask = density.generate_mask(n)
    (idx,) = np.nonzero(mask)
    idx = jnp.asarray(idx + skip)
    sidx = jnp.asarray(np.nonzero(mask)[0])
    b = jax.tree_util.tree_map(lambda l: l[idx], bases)
    return b, scalars[sidx]
